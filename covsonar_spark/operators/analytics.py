"""Decision-analytics operators: market-basket association rules,
two-sample (A/B) significance testing, and regression forecasting.

The reference answers "which genomes match" (SURVEY §2.2); an
analytics engine must also answer "what co-occurs / what changed /
what comes next".  All three are pure JVM-expression plans.

Scale notes (100 TB):
  * association rules reuse the co-purchase pair build (one shuffle on
    the basket key, map-side pair fan-out bounded by basket width);
    item supports collapse to |items| rows and broadcast onto pairs;
  * the A/B test is a single one-pass moment aggregate per (group,
    arm) — Welch's z from partial-mergeable count/mean/variance;
  * the trend fit is two stacked aggregates: exact decimal bucket
    revenue (one shuffle), then regr_slope/intercept over the ~100
    bucket points per group — the regression inputs are already tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# association rules
# ---------------------------------------------------------------------------

MIN_SUPPORT = 3
RULES_TOP_K = 20


def basket_association_rules(spark, sf_dir):
    """Directed association rules a→b over order baskets:
    support(ab) ≥ MIN_SUPPORT (3), ranked by lift.  Pair supports come from the
    same one-shuffle collect_set pair build as the co-purchase graph
    (operators/graph.py) but KEEP per-order multiplicity = #orders
    containing both; item supports broadcast onto the pairs.
    confidence = sup_ab/sup_a, lift = N·sup_ab/(sup_a·sup_b)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # the basket aggregate feeds pair supports, item supports and the
    # order census as three plan copies — left UNCACHED deliberately: a
    # scoped persist of it measured 2.2× slower in a 4-pair interleaved
    # A/B at sf0.1 (the columnar cache build of the ps arrays plus the
    # populate barrier cost more than the duplicated branches, which
    # the scheduler runs as parallel stages of one job)
    baskets = (li.groupBy("l_orderkey")
               .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps")))
    pair_sup = (
        baskets.select(F.explode(F.expr(
            "flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i+2, size(ps)), y -> struct(x AS a, y AS b))))"
        )).alias("p"))
        .groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("sup_ab"))
        .where(F.col("sup_ab") >= MIN_SUPPORT)
    )
    item_sup = (baskets.select(F.explode("ps").alias("item"))
                .groupBy("item").agg(F.count(F.lit(1)).alias("sup")))
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    # both rule directions generated map-side from ONE pass over the
    # aggregated pairs (explode of the two orientations) — the earlier
    # union form planned the whole basket→pair-explode→aggregate
    # pipeline once per branch
    directed = pair_sup.select(F.explode(F.array(
        F.struct(F.col("a"), F.col("b")),
        F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
    )).alias("d"), "sup_ab").select("d.a", "d.b", "sup_ab")
    rules = (
        directed
        .join(F.broadcast(item_sup.select(F.col("item").alias("a"),
                                          F.col("sup").alias("sup_a"))), "a")
        .join(F.broadcast(item_sup.select(F.col("item").alias("b"),
                                          F.col("sup").alias("sup_b"))), "b")
        .crossJoin(F.broadcast(n_orders))
        .select("a", "b", "sup_ab",
                F.round(F.col("sup_ab") / F.col("sup_a"), 4).alias("confidence"),
                F.round((F.col("n_orders") * F.col("sup_ab"))
                        / (F.col("sup_a") * F.col("sup_b")), 4).alias("lift"))
    )
    return rules.orderBy(F.col("lift").desc(), "a", "b").limit(RULES_TOP_K)


BASKET_RULES_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pair_sup AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS sup_ab
  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {MIN_SUPPORT}
),
item_sup AS (SELECT l_partkey AS item, count(*) AS sup FROM li GROUP BY 1),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
directed AS (
  SELECT a, b, sup_ab FROM pair_sup
  UNION ALL SELECT b, a, sup_ab FROM pair_sup
)
SELECT a, b, sup_ab,
       round(sup_ab::DOUBLE / sa.sup, 4) AS confidence,
       round((n_orders * sup_ab)::DOUBLE / (sa.sup * sb.sup), 4) AS lift
FROM directed
JOIN item_sup sa ON sa.item = a
JOIN item_sup sb ON sb.item = b
CROSS JOIN n
ORDER BY lift DESC, a, b LIMIT {RULES_TOP_K}
"""


# ---------------------------------------------------------------------------
# A/B test
# ---------------------------------------------------------------------------

def stats_ab_test(spark, sf_dir, events_fn=None):
    """Welch's two-sample z per event type between user arms (A =
    even user_id, B = odd): one-pass partial-mergeable moments per
    (type, arm), pivoted to a z-statistic.  Arm assignment is a plain
    parity split on the raw user id — deterministic and reproducible,
    never random(); fine for the synthetic corpus, though a real
    experiment should hash the id first (sequential ids alternate
    arms perfectly)."""
    ev = events_fn(spark, sf_dir) if events_fn else _t(spark, sf_dir, "events")
    arm = F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    moments = (ev.withColumn("arm", arm)
               .groupBy("event_type", "arm")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.avg("value").alias("mu"),
                    F.var_samp("value").alias("s2")))
    a = moments.where(F.col("arm") == "A").select(
        "event_type", F.col("n").alias("n_a"), F.col("mu").alias("mu_a"),
        F.col("s2").alias("s2_a"))
    b = moments.where(F.col("arm") == "B").select(
        "event_type", F.col("n").alias("n_b"), F.col("mu").alias("mu_b"),
        F.col("s2").alias("s2_b"))
    z = ((F.col("mu_a") - F.col("mu_b"))
         / F.sqrt(F.col("s2_a") / F.col("n_a") + F.col("s2_b") / F.col("n_b")))
    return (a.join(b, "event_type")
            .select("event_type", "n_a", "n_b",
                    F.round(F.col("mu_a") - F.col("mu_b"), 4).alias("mean_diff"),
                    F.round(z, 4).alias("welch_z"))
            .orderBy("event_type"))


STATS_AB_SQL = """
WITH moments AS (
  SELECT event_type, CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         count(*) AS n, avg(value) AS mu, var_samp(value) AS s2
  FROM events GROUP BY 1, 2
)
SELECT event_type, a.n AS n_a, b.n AS n_b,
       round(a.mu - b.mu, 4) AS mean_diff,
       round((a.mu - b.mu) / sqrt(a.s2 / a.n + b.s2 / b.n), 4) AS welch_z
FROM (SELECT * FROM moments WHERE arm = 'A') a
JOIN (SELECT * FROM moments WHERE arm = 'B') b USING (event_type)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# linear-trend forecast
# ---------------------------------------------------------------------------

def forecast_linear_trend(spark, sf_dir):
    """Next-month revenue forecast per order priority: exact decimal
    monthly buckets, OLS fit with regr_slope/regr_intercept (one-pass
    moment aggregates), forecast = intercept + slope·(max_t + 1)."""
    o = _t(spark, sf_dir, "orders")
    t = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("t")
    monthly = (
        o.groupBy("o_orderpriority", t)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("revenue"))
    )
    fit = (monthly.groupBy("o_orderpriority")
           .agg(F.regr_slope("revenue", "t").alias("slope"),
                F.regr_intercept("revenue", "t").alias("icept"),
                F.max("t").alias("t_max"),
                F.count(F.lit(1)).alias("n_months")))
    forecast = F.col("icept") + F.col("slope") * (F.col("t_max") + 1)
    return (fit.select("o_orderpriority", "n_months",
                       F.round("slope", 4).alias("slope"),
                       F.round(forecast, 2).alias("next_month_forecast"))
            .orderBy("o_orderpriority"))


FORECAST_TREND_SQL = """
WITH monthly AS (
  SELECT o_orderpriority,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS t,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, count(*) AS n_months,
       round(regr_slope(revenue, t), 4) AS slope,
       round(regr_intercept(revenue, t) + regr_slope(revenue, t) * (max(t) + 1), 2)
         AS next_month_forecast
FROM monthly GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


def rfm_segmentation(orders: DataFrame) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic warehouse scoring query: one aggregate pass collapses
    orders to a per-customer triple, then three ntile(5) windows over
    the 1000x-smaller customer frame assign quintile scores.

    Determinism across engines: the monetary sum goes through
    DECIMAL(18,2) (exact, order-independent — a double sum's last ulp
    could flip an ntile boundary), and every window's ORDER BY carries
    the custkey tie-break so equal metrics rank identically.

    Scale note: the unpartitioned ntile windows sort the CUSTOMER
    frame (3 orders smaller than the fact) in one task — fine to
    ~10^7 customers.  Past that, swap ntile for bucket assignment
    against approx_percentile(metric, [0.2,0.4,0.6,0.8]) boundaries
    (broadcast 4 scalars, pure map) — same quintiles, no global sort.
    """
    from pyspark.sql import Window

    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary_d"),
    )
    r_w = Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
    m_w = Window.orderBy(F.col("monetary_d").desc(), F.col("o_custkey"))
    return (per_cust
            .withColumn("r", F.ntile(5).over(r_w))
            .withColumn("f", F.ntile(5).over(f_w))
            .withColumn("m", F.ntile(5).over(m_w))
            .select(
                "o_custkey",
                F.col("last_order").cast("string").alias("last_order"),
                "frequency",
                F.col("monetary_d").cast("double").alias("monetary"),
                # bigint like every engine's ntile (Spark's is the odd
                # int32 out; the driver hash is width-sensitive)
                F.col("r").cast("long").alias("r"),
                F.col("f").cast("long").alias("f"),
                F.col("m").cast("long").alias("m"),
                F.concat_ws("", "r", "f", "m").alias("segment"))
            .orderBy("o_custkey"))


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_order,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_d
  FROM orders GROUP BY 1)
SELECT o_custkey,
       CAST(last_order AS VARCHAR) AS last_order,
       frequency,
       CAST(monetary_d AS DOUBLE) AS monetary,
       r, f, m, r || '' || f || '' || m AS segment
FROM (SELECT *,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary_d DESC, o_custkey) AS m
      FROM per_cust)
ORDER BY o_custkey
"""


QUERIES = {
    "basket_association_rules": (basket_association_rules, BASKET_RULES_SQL),
    "forecast_linear_trend": (forecast_linear_trend, FORECAST_TREND_SQL),
    # reads only (event_type, user_id, value) — column pruning keeps the
    # scan clear of the nanos-typed ts column, so no _events shim needed
    "stats_ab_test": (stats_ab_test, STATS_AB_SQL),
    "orders_rfm_segmentation": (
        lambda spark, sf_dir: rfm_segmentation(_t(spark, sf_dir, "orders")),
        RFM_SQL),
}
