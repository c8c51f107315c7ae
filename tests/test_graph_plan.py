"""Round-9 graph plan fixes (VERDICT r8 `weak` items):

1. graph_triangles' adjacency attach joins are broadcast only while the
   O(|E|) array payload fits ADJ_BCAST_MAX_BYTES; above the gate they
   hash-partition with a semi prefilter (the fallback the module
   docstring promised but round 8 didn't implement).
2. trade_edges carries broadcast hints ONLY on the always-25-row nation
   projections — customer/supplier are AQE-sized (q5's convention).

Covers: gate arithmetic, broadcast-vs-join value equality on a
hub-heavy synthetic graph (vs a Python ground truth), the gate
actually controlling the physical join strategy, and the hint census
of trade_edges' logical plan.
"""

from __future__ import annotations

import itertools
import random

from covsonar_spark.operators import graph

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_adj_bcast_gate_arithmetic():
    cap = graph.ADJ_BCAST_MAX_BYTES
    assert graph.adj_bcast_fits(1_000, 100)
    # edge payload alone (2 copies x 8 bytes) breaches the cap
    assert not graph.adj_bcast_fits(cap // 16 + 1, 0)
    assert graph.adj_bcast_fits(cap // 16, 0)
    # node overhead alone (2 copies x 24 bytes) breaches the cap
    assert not graph.adj_bcast_fits(0, cap // 48 + 1)


def test_degr_bcast_gate_arithmetic():
    # two 24-byte hash-relation rows per vertex vs the cap
    cap = graph.DEGR_BCAST_MAX_BYTES
    assert graph.degr_bcast_fits(1_000)
    assert graph.degr_bcast_fits(cap // 48)
    assert not graph.degr_bcast_fits(cap // 48 + 1)


def _tri_truth(edges) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def test_degr_hints_follow_gate(spark):
    # the two degree-rank attach joins are hinted ONLY below the gate
    # and only when the caller supplied a census; no census or an
    # over-gate vertex count leaves orientation to AQE
    e = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    hinted, _ = graph.oriented_adjacency(e, n_nodes=3)
    assert _analyzed(hinted).count("ResolvedHint") == 2
    unhinted, _ = graph.oriented_adjacency(e)
    assert _analyzed(unhinted).count("ResolvedHint") == 0
    over, _ = graph.oriented_adjacency(
        e, n_nodes=graph.DEGR_BCAST_MAX_BYTES // 48 + 1)
    assert _analyzed(over).count("ResolvedHint") == 0


def test_triangles_no_hints_above_both_gates(spark, monkeypatch):
    # above BOTH gates (the 100 TB shape) not one broadcast hint
    # survives anywhere in the triangle plan — degree attach, adjacency
    # attach, everything is AQE/hash-partitioned.
    # NOTE drop the scoped-persist generations first: sameResult
    # canonicalization strips hints, so a hinted `tri_oriented` frame
    # cached by an earlier (gate-open) build would be returned verbatim
    # for the gate-closed plan and fail the hint census
    from covsonar_spark.operators import dedup as D
    for key in ("tri_edges", "tri_oriented"):
        prev = D._GEN_CACHE.pop(key, None)
        if prev is not None:
            prev.unpersist()
    monkeypatch.setattr(graph, "ADJ_BCAST_MAX_BYTES", 0)
    monkeypatch.setattr(graph, "DEGR_BCAST_MAX_BYTES", 0)
    tri = graph.graph_triangles(spark, SF)
    assert _analyzed(tri).count("ResolvedHint") == 0


def test_triangles_degr_fallback_value_equal(spark, monkeypatch):
    want = [r.asDict() for r in graph.graph_triangles(spark, SF).collect()]
    monkeypatch.setattr(graph, "DEGR_BCAST_MAX_BYTES", 0)
    got = [r.asDict() for r in graph.graph_triangles(spark, SF).collect()]
    assert got == want and want[0]["n_triangles"] > 0


def test_tri_count_paths_equal_hub_heavy(spark):
    # hub-heavy: node 0 touches ~80% of the graph (the shape that made
    # value-ordered wedge enumeration quadratic and that the fallback
    # path must survive), plus a clique and random fill for triangles
    rng = random.Random(9)
    edges = {(0, v) for v in range(1, 50)}
    edges |= {(a, b) for a in range(50, 55) for b in range(a + 1, 55)}
    for _ in range(150):
        a, b = rng.sample(range(60), 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    e = spark.createDataFrame(sorted(edges), "a long, b long")
    oriented, adj = graph.oriented_adjacency(e)
    oriented = oriented.persist()
    try:
        want = _tri_truth(edges)
        got_bcast = graph._tri_count(oriented, adj, broadcast=True)
        got_join = graph._tri_count(oriented, adj, broadcast=False)
        assert got_bcast.collect()[0]["n_triangles"] == want
        assert got_join.collect()[0]["n_triangles"] == want
    finally:
        oriented.unpersist()


def test_triangles_gate_controls_physical_plan(spark, monkeypatch):
    # disable Spark's own size-based broadcast so the attach joins'
    # strategy is decided ONLY by the operator's gate, not by
    # small-test-data size estimates
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        monkeypatch.setattr(graph, "ADJ_BCAST_MAX_BYTES", 0)
        over = graph.graph_triangles(spark, SF)
        # every hinted join (degree ranks) broadcasts; the two attach
        # joins and the semi prefilter are the only unhinted ones, so a
        # shuffle join appearing == the fallback engaged
        assert "SortMergeJoin" in _plan(over)
        monkeypatch.setattr(graph, "ADJ_BCAST_MAX_BYTES", 128 << 20)
        under = graph.graph_triangles(spark, SF)
        assert "SortMergeJoin" not in _plan(under)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_triangles_fallback_value_equal_on_registry_data(spark, monkeypatch):
    want = [r.asDict() for r in graph.graph_triangles(spark, SF).collect()]
    monkeypatch.setattr(graph, "ADJ_BCAST_MAX_BYTES", 0)
    got = [r.asDict() for r in graph.graph_triangles(spark, SF).collect()]
    assert got == want and want[0]["n_triangles"] > 0


def test_trade_edges_hints_only_on_nation(spark):
    # exactly the two nation projections are hinted; customer/supplier
    # (scale-growing) are left to AQE — a third/fourth hint reappearing
    # means someone re-forced a dim broadcast
    assert _analyzed(graph.trade_edges(spark, SF)).count("ResolvedHint") == 2
