"""Isolated single-query A/B probe: fresh process, pandas-UDF worker
warmup, best-of-N executions of ONE registry query at the given sf dir.
Prints one JSON line {"query", "best_sec", "times", "rows"}.

Usage: python tools/ab_query.py QUERY [SF_DIR] [N]

This is the fixture for the same-host alternating A/B method
(ARCHITECTURE.md: dedup_ngram_prefix / basket_association_rules
triages): run it alternately from the current checkout and a pinned
worktree, twice each, and compare best-of-N — sequence-position JIT/GC
noise from the 132-query bench ordering cannot reach it.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from covsonar_spark.registry import REGISTRY
    from covsonar_spark.session import get_spark

    spark = get_spark("sparksonar-ab")

    @F.pandas_udf("long")
    def _warm(s):
        return s

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, 4 * n_workers, 1, n_workers).select(_warm("id")).count()

    from covsonar_spark.registry import clear_run_memos

    fn, _sql = REGISTRY[name]
    times, rows = [], 0
    for _ in range(n_runs):
        # same discipline as bench.py: no scratch memo survives into a
        # timed execution — every run computes from the parquet inputs
        clear_run_memos()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "best_sec": min(times),
                      "times": times, "rows": rows}))


if __name__ == "__main__":
    main()
