"""Dump .explain('formatted') for every registry query (or a subset)
into plans/<outdir>/ and print a one-line plan-shape summary per query:
#Exchange, #BatchEvalPython/ArrowEvalPython, join strategies, scans
without PushedFilters. Measurement-only tool (guide §1/§7.2).

Usage: python tools/plan_dump.py <outdir> [sf_dir] [name...]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covsonar_spark.registry import REGISTRY  # noqa: E402
from covsonar_spark.session import get_spark  # noqa: E402


def plan_stats(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b|\(\d+\) Exchange", plan))
    n_bep = plan.count("BatchEvalPython")
    n_aep = plan.count("ArrowEvalPython") + plan.count("MapInArrow") + plan.count("MapInPandas")
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)
    from collections import Counter
    jc = Counter(joins)
    js = ",".join(f"{k[:3]}x{v}" for k, v in sorted(jc.items()))
    return f"ex={n_ex} py={n_bep}+{n_aep} joins[{js}]"


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(REGISTRY)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    for name in names:
        fn, _sql = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {plan_stats(plan)}")


if __name__ == "__main__":
    main()
