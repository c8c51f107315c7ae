"""Physical-plan introspection: the .explain("formatted") audit loop
as a library.

Every operator in this engine was iterated against its physical plan
until the plan was the one we'd ship at 100 TB (the workflow the
PySpark guide prescribes); tests/test_plan_audit.py pins the results.
This module is the shared instrument: a structured summary of the
properties that matter at scale — wide shuffles, join strategies,
scan pruning, Python boundaries, codegen coverage — so audits (and
users) assert on facts, not substring luck.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The executedPlan in EXPLAIN FORMATTED form (string)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@dataclass
class PlanReport:
    """Scale-relevant facts extracted from one physical plan."""

    wide_exchanges: int = 0          # hash/range-partitioned shuffles
    gather_exchanges: int = 0        # SinglePartition gathers (tiny agg rows)
    broadcast_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0       # BroadcastNestedLoop + Cartesian
    windows: int = 0
    top_k: int = 0                   # TakeOrderedAndProject
    python_stages: int = 0           # Batch/ArrowEvalPython, mapInPandas…
    scans: dict[str, int] = field(default_factory=dict)   # table -> count
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    @property
    def python_free(self) -> bool:
        return self.python_stages == 0

    def scan_count(self, table: str) -> int:
        return self.scans.get(table, 0)


_FILE_RE = re.compile(r"([\w.-]+)\.parquet")


def plan_report(df: DataFrame) -> PlanReport:
    """Parse the formatted plan into a PlanReport."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    r = PlanReport()
    # exchange kinds live in the detail section: "(5) Exchange\n
    # Arguments: hashpartitioning(...)" vs "SinglePartition"
    for block in re.split(r"\n\n", plan):
        head = block.splitlines()[0] if block else ""
        if re.match(r"\(\d+\) (Exchange|BroadcastExchange)", head.strip()):
            if "BroadcastExchange" in head:
                r.broadcast_exchanges += 1
            elif "SinglePartition" in block:
                r.gather_exchanges += 1
            else:
                r.wide_exchanges += 1
    for line in tree.splitlines():
        if "BroadcastHashJoin" in line:
            r.broadcast_hash_joins += 1
        if "SortMergeJoin" in line:
            r.sort_merge_joins += 1
        if "BroadcastNestedLoopJoin" in line or "CartesianProduct" in line:
            r.nested_loop_joins += 1
        if re.search(r"\)?\s*Window\b", line):
            r.windows += 1
        if "TakeOrderedAndProject" in line:
            r.top_k += 1
        if ("BatchEvalPython" in line or "ArrowEvalPython" in line
                or "MapInPandas" in line or "FlatMapGroupsInPandas" in line):
            r.python_stages += 1
    # table scan counts: every "<t>.parquet" location mention in the plan
    for name in set(_FILE_RE.findall(plan)):
        r.scans[name] = plan.count(f"{name}.parquet")
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            r.pushed_filters.append(s.removeprefix("PushedFilters: "))
        if s.startswith("ReadSchema:"):
            r.read_schemas.append(s.removeprefix("ReadSchema: "))
    return r
