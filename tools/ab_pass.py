"""Multi-query A/B pass: ONE fresh process, pandas-UDF worker warmup,
best-of-N timed executions for EACH named query (memo-cleared per run,
the bench discipline). Prints one JSON line {query: best_sec, ...}.

Run alternately from two checkouts (arm A = current HEAD, arm B = a
pinned pre-change worktree), several passes each, interleaved — the
same-host alternating method (ARCHITECTURE.md), amortizing process
startup over the whole query list instead of one process per query
(tools/ab_query.py) when a change touches many queries at once.

Usage: python tools/ab_pass.py SF_DIR N query [query...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    n_runs = int(sys.argv[2])
    names = sys.argv[3:]

    from pyspark.sql import functions as F

    from covsonar_spark.registry import REGISTRY, clear_run_memos
    from covsonar_spark.session import get_spark

    spark = get_spark("sparksonar-ab-pass")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def _warm(s):
        return s

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, 4 * n_workers, 1, n_workers).select(_warm("id")).count()

    out: dict[str, float] = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        best = None
        for _ in range(n_runs):
            clear_run_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
