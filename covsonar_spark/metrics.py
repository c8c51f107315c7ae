"""Runtime execution metrics: what a query ACTUALLY shuffled, spilled,
and scanned — read from the executed plan's SQLMetrics after an action.

plans.py audits the static plan SHAPE (which operators, how many
exchanges); this module closes the loop with runtime numbers, so a
"zero-shuffle" claim is checkable as `shuffle_bytes_written == 0` on a
real run, and a spill regression (partitions outgrowing executor
memory — the thing that kills 100 TB runs) shows up as a number, not
an anecdote.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


# Auto-mode operators (exact-cosine broadcast/grid, LSH rerank
# broadcast/join, VCF driver/distributed) record the branch they took
# here, keyed by operator name.  Scale tests ASSERT the mode instead of
# inferring it from thresholds — a threshold edit that silently stops
# the scale path from engaging fails the test (VERDICT r3 #1).
MODE_CHOICES: dict[str, str] = {}


def record_mode(op: str, mode: str) -> None:
    """Record the branch an auto-mode operator resolved to."""
    MODE_CHOICES[op] = mode


def hostmark() -> float:
    """Deterministic ~0.5 s CPU probe: seconds to run a fixed
    single-thread workload (pure-Python loop + seeded numpy matmul).
    Lower = faster host.

    Benchmarks on shared infrastructure are only comparable when the
    host speed is known: the same repo commit measured 2-3x apart on
    two days of the same machine (cross-round observation, round 4).
    Every bench artifact records this number so a cross-round total can
    be read as (code effect) x (host effect) instead of blaming the
    code for the host.  The probe is overhead-shaped like the bench
    itself: Spark's per-query driver work is single-thread Python +
    JVM, so a single-thread probe tracks the inflation better than a
    parallel one.
    """
    import time

    import numpy as np

    a = np.random.RandomState(0).rand(600, 600)
    t0 = time.perf_counter()
    s = 0
    for i in range(3_000_000):
        s += i
    for _ in range(6):
        a = a @ a
        a /= np.abs(a).max()
    return round(time.perf_counter() - t0, 3)


def hostmark_mt(n_threads: int = 16) -> float:
    """Multi-core CPU probe: seconds for ``n_threads`` concurrent
    seeded numpy matmul workloads (numpy releases the GIL, so threads
    genuinely compete for cores).  Lower = faster host.

    Round-5 finding (BENCH_AB_HOST.json): the single-thread
    :func:`hostmark` missed a 1.74x swing between two runs of
    IDENTICAL code minutes apart — the shared machine's contention is
    multi-core, and Spark's local[32] task execution feels it while a
    single pinned thread does not.  Bench artifacts record BOTH probes
    so cross-round totals can be normalized by whichever regime the
    workload matches."""
    import concurrent.futures as cf
    import time

    import numpy as np

    def work(seed: int) -> None:
        m = np.random.RandomState(seed).rand(500, 500)
        for _ in range(14):
            m = m @ m
            m /= np.abs(m).max()

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=n_threads) as pool:
        list(pool.map(work, range(n_threads)))
    return round(time.perf_counter() - t0, 3)


@dataclass
class ExecMetrics:
    """Aggregated runtime metrics of one executed query."""

    shuffle_bytes_written: int = 0
    shuffle_records_written: int = 0
    spill_bytes: int = 0
    files_read: int = 0
    file_bytes_planned: int = 0
    exchanges: int = 0
    by_node: dict[str, int] = field(default_factory=dict)  # nodeName -> count


def _metrics_of(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _children(node):
    out = []
    ch = node.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    # adaptive wrappers / query stages expose their executed subtree
    # through accessors rather than children().  inputPlan is
    # deliberately NOT traversed: it is the pre-AQE plan whose
    # re-instantiated operators carry fresh plan ids, so walking it
    # double-counts by_node entries for replanned stages.
    for attr in ("finalPhysicalPlan", "executedPlan", "plan"):
        try:
            out.append(getattr(node, attr)())
        except Exception:  # noqa: BLE001 — accessor absent on this node type
            continue
    return out


def exec_metrics(df: DataFrame) -> ExecMetrics:
    """Execute ``df`` and aggregate its runtime SQLMetrics.

    The action MUST run ``df``'s own QueryExecution: ``df.count()``
    would execute a SIBLING plan (Dataset.count builds a separate
    groupBy().count() execution) and leave every metric on the
    inspected plan at zero — so this collects through the DataFrame
    itself (audit-sized results only; don't point this at a query
    returning the corpus).

    Nodes are deduplicated by plan id — AQE exposes the same stage
    through both the adaptive wrapper and the result stage, and
    double-counting a shuffle would defeat the point.
    """
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    m = ExecMetrics()
    seen: set[int] = set()
    stack = [plan]
    while stack:
        node = stack.pop()
        try:
            nid = node.id()
        except Exception:  # noqa: BLE001
            nid = id(node)
        if nid in seen:
            continue
        seen.add(nid)
        name = node.nodeName()
        m.by_node[name] = m.by_node.get(name, 0) + 1
        mets = _metrics_of(node)
        if "shuffleBytesWritten" in mets and "Exchange" in name:
            # several operators carry shuffle-write metric slots (e.g.
            # TakeOrderedAndProject's local top-k) — only Exchange
            # nodes are real repartitionings, and only their bytes
            # count against the zero-shuffle contract
            m.exchanges += 1
            m.shuffle_bytes_written += mets["shuffleBytesWritten"]
            m.shuffle_records_written += mets.get("shuffleRecordsWritten", 0)
        m.spill_bytes += mets.get("spillSize", 0)
        if name.startswith("Scan"):
            m.files_read += mets.get("numFiles", 0)
            m.file_bytes_planned += mets.get("filesSize", 0)
        stack.extend(_children(node))
    return m
