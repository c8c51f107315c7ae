"""Registry-wide physical-plan invariant sweep (tooling twin of
tests/test_plan_audit.py::test_registry_plan_invariants).

Builds every registry query at sf0.01 without collecting results and
reports,
per row: CartesianProduct / BroadcastNestedLoopJoin occurrences,
unpruned wide-table scans (a FileScan reading every column of lineitem/
orders/documents/events), and SortMergeJoins whose condition touches
the always-tiny nation/region dims.  Run standalone to (re)derive the
allowlists the CI test pins.

Caveat: a few rows are inherently EAGER at construction (their gates
need cardinalities — graph_triangles' census, similarity auto modes
without an n_rows hint), so "building" them runs small jobs at the
sweep's sf; their plans are still the audited artifact.
"""
from __future__ import annotations

import json
import os
import re
import sys

# derive the repo root from this file (ab_query.py convention) — a
# hardcoded path would silently import another checkout's package when
# the sweep runs from a pinned A/B worktree
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
WIDE = ("lineitem", "orders", "documents", "events")


def full_cols(spark, sf, table):
    return set(spark.read.parquet(f"{sf}/{table}.parquet").columns)


def plan_of(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def scan_reads(plan):
    """[(table, set(cols))] for every parquet FileScan in the plan."""
    out = []
    for m in re.finditer(
            r"Location:.*?\[([^\]]*)\][\s\S]*?ReadSchema: struct<([^>]*)>",
            plan):
        loc, schema = m.group(1), m.group(2)
        tm = re.search(r"/(\w+)\.parquet", loc)
        if not tm:
            continue
        cols = {c.split(":")[0].strip() for c in schema.split(",") if c.strip()}
        out.append((tm.group(1), cols))
    return out


def main():
    from pyspark.sql import SparkSession

    from covsonar_spark.registry import REGISTRY
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    full = {t: full_cols(spark, SF, t) for t in WIDE}
    report = {}
    for name, (fn, _sql) in REGISTRY.items():
        try:
            plan = plan_of(fn(spark, SF))
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": repr(exc)[:200]}
            print(f"ERR  {name}: {exc}", file=sys.stderr)
            continue
        row = {}
        if "CartesianProduct" in plan:
            row["cartesian"] = True
        if "BroadcastNestedLoopJoin" in plan:
            row["bnlj"] = True
        unpruned = [t for t, cols in scan_reads(plan)
                    if t in full and cols >= full[t]]
        if unpruned:
            row["unpruned"] = sorted(set(unpruned))
        smj_dim = [l.strip()[:120] for l in plan.splitlines()
                   if "SortMergeJoin" in l
                   and ("n_nationkey" in l or "r_regionkey" in l)]
        if smj_dim:
            row["smj_dim"] = smj_dim
        if row:
            report[name] = row
            print(f"FLAG {name}: {row}", file=sys.stderr)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
