"""Regenerate PLANS.md: annotated EXPLAIN FORMATTED trees of the
headline queries at sf0.01."""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from covsonar_spark.plans import formatted_plan  # noqa: E402
from covsonar_spark.registry import REGISTRY  # noqa: E402
from covsonar_spark.session import get_spark  # noqa: E402

NAMES = ("q1_pricing_summary", "match_profile_and", "q18_large_orders",
         "events_asof_attribution", "sketch_hll_distinct")

if __name__ == "__main__":
    spark = get_spark("plansdump")
    for name in NAMES:
        df = REGISTRY[name][0](spark, "/root/testdata/sf0.01")
        print(f"### {name}\n```\n{formatted_plan(df).split(chr(10)+chr(10))[0]}\n```\n")
