"""Graph analytics as DataFrame programs: weighted PageRank, triangle
counting, and degree distributions over graphs derived from the
relational tables.

The reference's only graph-shaped computation is the sublineage
closure BFS (SURVEY.md §2.2 F14; lib/sonardb.py:3342-3360), already
covered by operators/closure.py.  This module adds the general
iterative-graph repertoire a data-curation engine needs (duplicate
clusters are already in operators/dedup.py via connected components —
pointer-jumping, the same family as these).

Graphs used (derived, not stored):
  * nation trade graph: edge cust-nation -> supp-nation weighted by
    lineitem revenue (25 nodes, |E| <= 625 at any scale — the EDGE
    AGGREGATION is the big-data step, one shuffle over the fact);
  * part co-purchase graph: undirected edge (a,b) when parts a,b ship
    in the same order (edge build = self-join on l_orderkey, bounded
    by per-order line counts).

Scale notes (100 TB):
  * PageRank iterations run over the AGGREGATED edge list, never the
    fact table — the fact is scanned once to build weighted edges;
  * each iteration is join(ranks, edges on src) + groupBy(dst): two
    hash-partitioned exchanges over |E| rows; with ranks tiny (#nodes)
    Spark broadcasts it, so per-iteration cost is a map over edges;
  * per-iteration rounding to 6 decimals pins the float trajectory,
    which is what makes an ITERATIVE algorithm value-checkable against
    the chained-CTE DuckDB oracle (same trick as embed_kmeans);
  * triangle counting degree-orients each edge and sums adjacency
    intersections, so the wedge set is never materialized; the
    adjacency attach joins are broadcast only while the O(|E|) array
    payload fits ADJ_BCAST_MAX_BYTES (two executor copies), else they
    hash-partition with a semi prefilter on the probe key — the
    orientation bound (out-degree ≤ O(√E)) keeps that shuffle sane;
  * trade_edges broadcasts only the always-25-row nation projections;
    customer/supplier joins are AQE-sized (they grow with scale
    factor — a forced hint would mean a multi-GB build at 100×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# nation trade graph + PageRank
# ---------------------------------------------------------------------------

DAMP = 0.85
PR_ITERS = 3


def trade_edges(spark, sf_dir) -> DataFrame:
    """cust-nation -> supp-nation revenue edges: one pass over lineitem;
    self-loops dropped.  Only the always-25-row nation projections carry
    a broadcast HINT; customer and supplier grow linearly with scale
    factor, so their join strategy is delegated to AQE (same convention
    as q5, operators/tpch.py) — at sf0.1 AQE broadcasts them anyway, at
    100 TB it sizes a shuffle join instead of OOMing a forced build."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(s.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("ck"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sk"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("weight"))
    )


def pagerank(edges: DataFrame, iters: int = PR_ITERS, damp: float = DAMP) -> DataFrame:
    """Weighted PageRank over a DataFrame edge list.  Nodes = src∪dst;
    transition weight = edge weight / node out-weight; dangling nodes
    simply emit no mass (simplified standard).  Each iteration rounds
    rank to 6 decimals — the cross-engine fixpoint pin.

    The iterations stay LAZY (one unrolled plan, one action): an
    alternative that materialized each iteration's ranks to the driver
    (collect + literal re-frame, cutting the plan from 168 operators to
    three ~15-operator queries) measured 2.0× SLOWER in a 4-pair
    interleaved A/B at sf0.1 — the per-iteration Python↔JVM round trip
    and job-submission overhead cost more than Catalyst spends on the
    big plan, whose independent subtrees the scheduler runs in
    parallel within the single action."""
    # scoped persist: the edge aggregation pipeline feeds the node
    # census, the transition build, AND every iteration's join —
    # without it the upstream fact scan re-runs per action.  Scoped
    # (one bounded entry per key, sameResult-memoized) rather than a
    # raw .cache() so repeated calls in a long-lived session don't
    # accumulate leaked cache entries (triangle census persists its
    # edge list the same way).
    from covsonar_spark.operators.dedup import _persist_scoped

    edges = _persist_scoped("pagerank_edges", edges)
    # one explode pass for the node census (not select(src) ∪
    # select(dst), which plans the edge pipeline once per branch)
    nodes = edges.select(
        F.explode(F.array("src", "dst")).alias("node")).distinct()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("ow"))
    trans = _persist_scoped(
        "pagerank_trans",
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("ow")).alias("p")))
    # the node count stays IN-PLAN (a broadcast 1-row aggregate crossed
    # into each rank frame — exactly the SQL twin's `CROSS JOIN nn`):
    # an eager nodes.count() here cost a whole extra job whose only
    # output was two double constants, serializing the edge-aggregate
    # materialization behind a driver round-trip.  Bit-identity: the
    # divisions are the same IEEE doubles whether Python or codegen
    # divides them, and round() was always Spark's.
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    ranks = nodes.crossJoin(nn).select(
        "node", F.round(F.lit(1.0) / F.col("n"), 6).alias("rank"))
    for _ in range(iters):
        contrib = (trans.join(F.broadcast(ranks), trans.src == ranks.node)
                   .groupBy("dst")
                   .agg(F.sum(F.col("p") * F.col("rank")).alias("c")))
        ranks = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                 .crossJoin(nn)
                 .select("node",
                         F.round(F.lit(1.0 - damp) / F.col("n")
                                 + F.lit(damp) * F.coalesce(F.col("c"), F.lit(0.0)),
                                 6).alias("rank")))
    return ranks


def graph_pagerank(spark, sf_dir):
    """3-iteration weighted PageRank over the nation trade graph."""
    ranks = pagerank(trade_edges(spark, sf_dir))
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


def _pr_sql(iters: int = PR_ITERS, damp: float = DAMP) -> str:
    base = f"""
WITH edges AS (
  SELECT src, dst, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS weight
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey,
  LATERAL (SELECT cn.n_name AS src, sn.n_name AS dst) t
  WHERE src <> dst
  GROUP BY src, dst
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
nn AS (SELECT count(*) AS n FROM nodes),
trans AS (
  SELECT src, dst, weight / sum(weight) OVER (PARTITION BY src) AS p FROM edges
),
r0 AS (SELECT node, round(1.0 / n, 6) AS rank FROM nodes CROSS JOIN nn)
"""
    prev = "r0"
    for i in range(1, iters + 1):
        base += f""",
c{i} AS (SELECT dst, sum(p * rank) AS c FROM trans JOIN {prev} ON src = node GROUP BY dst),
r{i} AS (SELECT node, round((1.0 - {damp}) / n + {damp} * coalesce(c, 0.0), 6) AS rank
         FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON node = dst)
"""
        prev = f"r{i}"
    base += f"SELECT node, round(rank, 6) AS rank FROM {prev} ORDER BY node"
    return base


GRAPH_PAGERANK_SQL = _pr_sql()


# ---------------------------------------------------------------------------
# part co-purchase graph: triangles + degrees
# ---------------------------------------------------------------------------

def copurchase_edges(spark, sf_dir) -> DataFrame:
    """Undirected (a<b) part pairs shipping in the same order: ONE
    shuffle on l_orderkey collects each order's part set, the sorted
    pairs are generated map-side from the array (order width is ~4-7
    lines, so fan-out is ~d²/2 per order — linear overall), and one
    final distinct dedups across orders.  Beats the classic self-join
    form (which shuffles the fact twice and joins) measurably."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(F.explode(F.expr(
            "flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i+2, size(ps)), y -> struct(x AS a, y AS b))))"
        )).alias("p"))
        .select("p.a", "p.b").distinct()
    )


# Adjacency broadcast gate.  adj is |V| ROWS but its array payload
# totals |E| int64 entries, and the intersect stage pins TWO copies on
# every executor (nu and nv sides) — so the gate is derived from BYTES,
# the exact convention of similarity.KNN_BCAST_MAX_BYTES.  Below the
# gate, broadcasting keeps the intersect map-side over the cached edge
# partitions; above it, an O(|E|)-payload broadcast OOMs the driver
# long before executors feel it, so the plan falls back to
# hash-partitioned joins (see _tri_count).
ADJ_BCAST_MAX_BYTES = 128 << 20


def adj_bcast_fits(n_edges: int, n_nodes: int) -> bool:
    """True when TWO broadcast copies of the oriented adjacency (one
    int64 neighbor entry per edge + per-source key/array overhead)
    stay under ``ADJ_BCAST_MAX_BYTES``."""
    return 2 * (n_edges * 8 + n_nodes * 24) <= ADJ_BCAST_MAX_BYTES


# Degree-rank broadcast gate.  degr is one row per VERTEX (two BIGINTs,
# ~24 bytes keyed in a hash relation) and the orientation step attaches
# it TWICE (a side and b side) — so while the payload constant is far
# smaller than adj's O(|E|) arrays, it still grows linearly with the
# graph: at 10^9 vertices two copies are ~48 GB through the driver, the
# same failure mode as the r8 customer/supplier hints.  Same bytes
# convention as ADJ_BCAST_MAX_BYTES; above the gate (or when the caller
# has no census) the attach joins carry no hint and AQE sizes them —
# the trade_edges convention.
DEGR_BCAST_MAX_BYTES = 128 << 20


def degr_bcast_fits(n_nodes: int) -> bool:
    """True when TWO broadcast copies of the degree-rank table (one
    24-byte (v, r) hash-relation row per vertex) stay under
    ``DEGR_BCAST_MAX_BYTES``."""
    return 2 * n_nodes * 24 <= DEGR_BCAST_MAX_BYTES


def oriented_adjacency(e: DataFrame, n_nodes: int | None = None,
                       persist=None, deg: DataFrame | None = None):
    """(oriented, adj) for an undirected (a<b) edge list: edges
    re-oriented from the lower-(degree, id) endpoint to the higher
    (out-degree ≤ O(√E), the standard answer to power-law hubs where
    value-order a<b<c explodes on the hot node), plus the sorted
    out-neighbor arrays of the oriented graph.

    ``n_nodes`` is the caller's vertex census (graph_triangles already
    collects it for ``adj_bcast_fits``); the two degree-rank attach
    joins are broadcast-hinted only when ``degr_bcast_fits(n_nodes)``
    holds — with no census, or above the gate, they are left unhinted
    for AQE to size.

    ``persist`` (a DataFrame→DataFrame hook, e.g. a scoped persist) is
    applied to ``oriented`` BEFORE ``adj`` is derived, so every
    downstream consumer of either frame shares one materialization of
    the orientation joins — without it, each consumer (and each
    broadcast side in ``_tri_count``) re-runs the degree aggregate and
    both attach joins from the raw edge list.

    ``deg`` is an optional caller-supplied (v, d) degree table —
    ``graph_triangles`` persists one and derives its census from it,
    so the explode + groupBy degree pass over the edge list runs once
    per query instead of once for the census and once here."""
    if deg is None:
        # one explode pass over the edge list (not select(a) ∪
        # select(b), which plans the upstream edge build once per
        # union branch — the _census_stats convention)
        deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
               .groupBy("v").agg(F.count(F.lit(1)).alias("d")))
    # rank packed into one BIGINT (deg << 32 | id): a single long compare
    # stays inside whole-stage codegen, unlike per-row struct ordering
    rank = F.expr("shiftleft(d, 32) + v")
    degr = deg.select("v", rank.alias("r"))
    hint = (F.broadcast if n_nodes is not None and degr_bcast_fits(n_nodes)
            else (lambda df: df))
    ranked = (e.join(hint(degr.select(F.col("v").alias("a"), F.col("r").alias("ra"))), "a")
               .join(hint(degr.select(F.col("v").alias("b"), F.col("r").alias("rb"))), "b"))
    a_first = F.col("ra") < F.col("rb")
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    if persist is not None:
        oriented = persist(oriented)
    adj = oriented.groupBy("u").agg(F.array_sort(F.collect_list("v")).alias("nb"))
    return oriented, adj


def _tri_count(oriented: DataFrame, adj: DataFrame, broadcast: bool) -> DataFrame:
    """Σ over oriented edges (u,v) of |out(u) ∩ out(v)| — counts each
    triangle exactly once (at its two lowest-rank vertices) and never
    materializes the wedge set (Σ d²/4 rows, ~40M at sf0.1).

    ``broadcast=True``: adj rides to every executor and the intersect
    runs map-side over the edge scan (measured ~2x vs the wedge
    shuffle + semi-join probe at sf0.1).  ``broadcast=False`` — the
    100 TB path: both attach joins hash-partition on their key, and
    the v-side adjacency is prefiltered with a semi-join on the probe
    key so array payloads only ride the shuffle for sources that
    actually appear as some edge's head (every adj key appears as a
    tail by construction, so the u side needs no filter)."""
    nu = adj.select(F.col("u"), F.col("nb").alias("nu"))
    nv = adj.select(F.col("u").alias("v"), F.col("nb").alias("nv"))
    if broadcast:
        nu, nv = F.broadcast(nu), F.broadcast(nv)
    else:
        nv = nv.join(oriented.select("v").distinct(), "v", "left_semi")
    return (
        oriented.join(nu, "u").join(nv, "v")
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))
    )


# census-stats memo keyed by the scoped-persisted edge frame IDENTITY:
# _persist_scoped returns the same object while its input plan is
# unchanged, so repeated census calls WITHIN one invocation (plan
# audit building the same row twice) skip the stats job.  Timing
# harnesses clear it between runs (registry.clear_run_memos) so every
# timed execution recomputes from the inputs.
# Single entry (cleared on miss) — the kept df reference pins the id.
_CENSUS_STATS: dict[int, tuple] = {}


def _census_stats(e: DataFrame) -> tuple[int, int]:
    """(n_edges, n_nodes) of an undirected edge list, ONE pass —
    a count job plus a distinct job would pay the scan and the
    scheduling twice."""
    got = _CENSUS_STATS.get(id(e))
    if got is not None and got[0] is e:
        return got[1], got[2]
    row = (e.select(F.explode(F.array("a", "b")).alias("v"))
           .agg((F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
                F.countDistinct("v").alias("n_nodes"))).collect()[0]
    _CENSUS_STATS.clear()
    _CENSUS_STATS[id(e)] = (e, row["n_edges"], row["n_nodes"])
    return row["n_edges"], row["n_nodes"]


def _census_from_deg(deg: DataFrame) -> tuple[int, int]:
    """(n_edges, n_nodes) from a (v, d) degree table: Σd = 2|E| on a
    distinct undirected edge list and every vertex with an edge has a
    deg row, so the |V|-row roll-up replaces a second full pass over
    the edge list (``div`` keeps the halving in integer space — a
    double division would lose exactness past 2^53 edges).  Same
    identity-keyed memo discipline as ``_census_stats``."""
    got = _CENSUS_STATS.get(id(deg))
    if got is not None and got[0] is deg:
        return got[1], got[2]
    row = deg.agg(F.expr("coalesce(sum(d) div 2, 0)").alias("n_edges"),
                  F.count(F.lit(1)).alias("n_nodes")).collect()[0]
    _CENSUS_STATS.clear()
    _CENSUS_STATS[id(deg)] = (deg, row["n_edges"], row["n_nodes"])
    return row["n_edges"], row["n_nodes"]


def graph_triangles(spark, sf_dir):
    """Global triangle census of the co-purchase graph: DEGREE
    orientation + adjacency intersection (see oriented_adjacency /
    _tri_count).  |V| and |E| are counted eagerly off the persisted
    DEGREE table (a |V|-row roll-up — see ``_census_from_deg``) — the
    census needs them for its output row anyway, and they feed
    ``adj_bcast_fits`` (broadcast vs hash-partitioned attach joins for
    the adjacency) and ``degr_bcast_fits`` (hinted vs AQE-sized
    degree-rank attach in orientation).

    NOTE this makes DataFrame CONSTRUCTION run one census job (the
    same convention as similarity.cosine_pairs_exact's auto mode,
    which runs a count() without an n_rows hint): explain-only
    consumers (tools/plan_sweep.py, the plan-audit sweep) execute that
    job when they build this row's plan — memoized per edge frame, so
    repeated builds in one session pay it once."""
    from covsonar_spark.operators.dedup import _persist_scoped

    e = _persist_scoped("tri_edges", copurchase_edges(spark, sf_dir))
    # ONE degree pass serves both the census and the orientation: deg
    # is persisted, the census is a |V|-row roll-up of it (Σd = 2|E|),
    # and oriented_adjacency consumes the same frame — the former
    # explode+countDistinct census was a second full pass over e that
    # recomputed nothing the degree aggregate doesn't already hold
    deg = _persist_scoped(
        "tri_deg",
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v").agg(F.count(F.lit(1)).alias("d")))
    n_edges, n_nodes = _census_from_deg(deg)
    # ONE materialization serves every consumer: adj is persisted, and
    # the probe-side edge stream is adj EXPLODED BACK to (u, v) rows —
    # explode(collect_list(v)) per u is exactly the oriented edge
    # multiset (row order differs; the Σ|∩| aggregate is
    # order-independent), so the separate 1.2M-row ``oriented`` cache
    # the round-10 code kept between the orientation joins and the
    # collect_list shuffle is redundant: the probe now reads the same
    # |V|-row adj cache as the two broadcast sides (round 11; the r10
    # form's extra cache populate barrier measured ~0.2-0.4 s at
    # sf0.1).  _tri_count still needs adj persisted — unpersisted, each
    # broadcast re-ran the degree aggregate + both attach joins + the
    # collect_list shuffle from the raw edge list (measured ~1.5 s of
    # the warm 4.2 s query at sf0.1).
    _, adj = oriented_adjacency(e, n_nodes=n_nodes, deg=deg)
    adj = _persist_scoped("tri_adj", adj)
    probe = adj.select("u", F.explode("nb").alias("v"))
    tri = _tri_count(probe, adj,
                     broadcast=adj_bcast_fits(n_edges, n_nodes))
    return tri.select(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.col("n_triangles"),
    )


GRAPH_TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
nodes AS (SELECT DISTINCT v FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)),
tri AS (
  SELECT 1 FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  WHERE EXISTS (SELECT 1 FROM edges e3 WHERE e3.a = e1.a AND e3.b = e2.b)
)
SELECT (SELECT count(*) FROM nodes) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*) FROM tri) AS n_triangles
"""


def graph_degree_stats(spark, sf_dir):
    """Degree distribution of the co-purchase graph: how many nodes
    have each degree.  Two skinny aggregates over the edge list.

    Endpoints come from ONE ``explode(array(a, b))`` pass: the earlier
    ``select(a).union(select(b))`` form planned the whole edge build
    (groupBy(l_orderkey) + pair explode + distinct) TWICE — one full
    copy per union branch — because nothing persists the un-cached
    edge frame.  Same rows, one build."""
    e = copurchase_edges(spark, sf_dir)
    deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count(F.lit(1)).alias("degree")))
    return (deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy("degree"))


GRAPH_DEGREES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
deg AS (
  SELECT v, count(*) AS degree
  FROM (SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) GROUP BY v
)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree ORDER BY degree
"""


QUERIES = {
    "graph_pagerank": (graph_pagerank, GRAPH_PAGERANK_SQL),
    "graph_triangles": (graph_triangles, GRAPH_TRIANGLES_SQL),
    "graph_degree_stats": (graph_degree_stats, GRAPH_DEGREES_SQL),
}
