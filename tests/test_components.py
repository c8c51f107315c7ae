"""Connected components (duplicate-cluster formation) vs a driver-side
union-find on synthetic graphs: chains (worst case for plain label
propagation — exercises pointer jumping), stars, isolated pairs, and a
random Erdős–Rényi-ish graph."""

from __future__ import annotations

import random

import pytest

from covsonar_spark.operators.dedup import connected_components

# 0 forces the distributed label-propagation loop; the default cap
# takes the adaptive driver union-find path — both must agree with
# the reference implementation below.
BOTH_PATHS = pytest.mark.parametrize("driver_cap", [1_000_000, 0],
                                     ids=["driver", "distributed"])


def union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id per component
    comps = {}
    for n in parent:
        comps[n] = find(n)
    return comps


def spark_components(spark, edges, driver_cap=1_000_000):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    return {r["node"]: r["comp"]
            for r in connected_components(df, driver_cap=driver_cap).collect()}


@BOTH_PATHS
def test_chain_star_and_pairs(spark, driver_cap):
    edges = (
        [(i, i + 1) for i in range(100, 130)]            # 31-node chain
        + [(500, x) for x in range(501, 511)]            # star
        + [(900, 901), (910, 911)]                       # isolated pairs
        + [(700, 701), (701, 702), (700, 702)]           # triangle
    )
    assert spark_components(spark, edges, driver_cap) == union_find_components(edges)


@BOTH_PATHS
def test_random_graph_matches_union_find(spark, driver_cap):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)]
    assert spark_components(spark, edges, driver_cap) == union_find_components(edges)


@BOTH_PATHS
def test_label_is_component_minimum(spark, driver_cap):
    edges = [(7, 3), (3, 9), (20, 21)]
    comps = spark_components(spark, edges, driver_cap)
    assert comps[7] == comps[3] == comps[9] == 3
    assert comps[20] == comps[21] == 20


def test_asof_join_backward_and_tolerance(spark):
    """asof_join against a brute-force per-row maximum: backward
    semantics (>= tie matches), per-key isolation, and the tolerance
    cutoff nulling out stale matches."""
    from pyspark.sql import functions as F

    from covsonar_spark.operators.windows import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 10, "e")],
        "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (1, 1, "r1"), (2, 99, "r99")],
        "k long, t long, val string")

    got = {r["tag"]: (r["val"], r["matched_ts"])
           for r in asof_join(left, right, ["k"], "t", "t", ["val"]).collect()}
    assert got == {
        "a": ("r10", 10),   # tie at t=10 matches (>= semantics)
        "b": ("r15", 15),   # most recent prior, not first
        "c": ("r1", 1),
        "d": (None, None),  # right row exists but is in the future
        "e": (None, None),  # key absent from right
    }

    got_tol = {r["tag"]: r["val"]
               for r in asof_join(left, right, ["k"], "t", "t", ["val"],
                                  tolerance=5).collect()}
    # staleness: a=0, b=5, c=4 — all within 5
    assert got_tol == {"a": "r10", "b": "r15", "c": "r1", "d": None, "e": None}
    got_tol0 = {r["tag"]: r["val"]
                for r in asof_join(left, right, ["k"], "t", "t", ["val"],
                                   tolerance=3).collect()}
    # b (5 units stale) and c (4 units stale) exceed 3; a (exact tie) stays
    assert got_tol0 == {"a": "r10", "b": None, "c": None, "d": None, "e": None}


def test_interval_overlap_join_binned_exactness(spark):
    """Binned interval join must equal the naive cross-filter: pairs
    sharing several bins appear once, closed-interval touch counts as
    overlap, and bin-width choice never changes the result."""
    from covsonar_spark.operators.windows import interval_overlap_join

    left = spark.createDataFrame(
        [("L1", 0, 25), ("L2", 30, 31), ("L3", 100, 100)],
        "lid string, s long, e long")
    right = spark.createDataFrame(
        [("R1", 5, 7), ("R2", 25, 30), ("R3", 32, 99), ("R4", 100, 200)],
        "rid string, s long, e long")
    want = {("L1", "R1"), ("L1", "R2"),   # touch at 25 counts (closed)
            ("L2", "R2"),                 # touch at 30
            ("L3", "R4")}                 # touch at 100, point interval
    for bw in (3, 10, 1000):              # narrow, medium, one-bin-fits-all
        got = {(r["lid"], r["rid"])
               for r in interval_overlap_join(
                   left, right, "s", "e", "s", "e", bin_width=bw)
               .collect()}
        assert got == want, f"bin_width={bw}"


def test_asof_and_interval_joins_match_brute_force_random(spark):
    """Property check over random data: the union+window as-of join and
    the binned interval join must equal O(n·m) brute-force references
    on 40 random keyed/timed rows per side (fixed seed)."""
    import random

    from pyspark.sql import functions as F

    from covsonar_spark.operators.windows import asof_join, interval_overlap_join

    rng = random.Random(1234)
    left = [(rng.randrange(5), rng.randrange(100), i) for i in range(40)]
    right = [(rng.randrange(5), rng.randrange(100), 100 + i) for i in range(40)]
    ldf = spark.createDataFrame(left, "k long, t long, lid long")
    rdf = spark.createDataFrame(right, "k long, t long, rid long")

    got = {r["lid"]: r["rid"]
           for r in asof_join(ldf, rdf, ["k"], "t", "t", ["rid"]).collect()}
    want = {}
    for k, t, lid in left:
        best = None
        for rk, rt, rid in right:
            if rk == k and rt <= t and (best is None or rt > best[0]
                                        or (rt == best[0] and rid > best[1])):
                best = (rt, rid)
        want[lid] = best[1] if best else None
    # tie among equal right timestamps: the window picks the LAST right
    # row in (ts, side) order, which among equal ts is plan-order; our
    # brute force picks max rid. Only compare where no tie exists.
    ties = set()
    for k, t, lid in left:
        cand = [rt for rk, rt, _ in right if rk == k and rt <= t]
        if cand and cand.count(max(cand)) > 1:
            ties.add(lid)
    for lid in got:
        if lid not in ties:
            assert got[lid] == want[lid], lid

    intervals_a = [(rng.randrange(3), s := rng.randrange(80), s + rng.randrange(15), i)
                   for i in range(40)]
    intervals_b = [(rng.randrange(3), s := rng.randrange(80), s + rng.randrange(15), 100 + i)
                   for i in range(40)]
    adf = spark.createDataFrame(intervals_a, "k long, s long, e long, aid long")
    bdf = spark.createDataFrame(intervals_b, "k long, s long, e long, bid long")
    joined = interval_overlap_join(adf, bdf, "s", "e", "s", "e", bin_width=7) \
        .where(F.col("k") == F.col("r_k"))
    got_pairs = {(r["aid"], r["bid"]) for r in joined.collect()}
    want_pairs = {(aid, bid)
                  for ak, as_, ae, aid in intervals_a
                  for bk, bs, be, bid in intervals_b
                  if ak == bk and as_ <= be and bs <= ae}
    assert got_pairs == want_pairs


def test_word_shingles_short_doc_yields_empty(spark):
    """Docs shorter than k tokens must produce an empty shingle array,
    not a descending-sequence slice error (both shingle paths agree)."""
    from pyspark.sql import functions as F

    from covsonar_spark.functions.text import tokens, word_shingles
    from covsonar_spark.operators.dedup import shingle_sets

    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "one two three four")],
        "doc_id long, text string")
    hof = docs.select("doc_id",
                      word_shingles(tokens("text"), 3).alias("sh")).collect()
    got = {r["doc_id"]: list(r["sh"]) for r in hof}
    assert got[1] == [] and got[2] == ["one two three", "two three four"]
    arrow = {r["doc_id"]: list(r["shingles"])
             for r in shingle_sets(docs).collect()}
    assert arrow == got
