"""In-process A/B for the operator-level parallelism floor: ONE session,
alternating floor-off / floor-on executions of each query (best-of-N per
arm), so host-speed drift between runs cannot masquerade as a win or a
regression. Monkeypatches operators.dedup.min_parallelism for the OFF arm — no
product knob involved.

Usage: python tools/ab_scanfloor.py [SF_DIR] [N] [query...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:]

    from pyspark.sql import functions as F

    from covsonar_spark import registry
    from covsonar_spark.registry import REGISTRY
    from covsonar_spark.session import get_spark

    spark = get_spark("sparksonar-ab-floor")
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf("long")
    def _warm(s):
        return s

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, 4 * n_workers, 1, n_workers).select(_warm("id")).count()

    from covsonar_spark.operators import dedup as _dedup
    real_floor = _dedup.min_parallelism
    off_floor = lambda df: df  # noqa: E731

    out = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        arms = {"off": [], "on": []}
        for _ in range(n_runs):
            for arm, floor in (("off", off_floor), ("on", real_floor)):
                _dedup.min_parallelism = floor
                try:
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    arms[arm].append(round(time.perf_counter() - t0, 3))
                finally:
                    _dedup.min_parallelism = real_floor
        out[name] = {"off": min(arms["off"]), "on": min(arms["on"]),
                     "ratio": round(min(arms["on"]) / min(arms["off"]), 3),
                     "runs_off": arms["off"], "runs_on": arms["on"]}
        print(f"# {name}: off={out[name]['off']} on={out[name]['on']} "
              f"ratio={out[name]['ratio']}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
