"""OLAP surface extensions: CUBE, pivot/unpivot, statistical aggregates,
equi-width histograms, and full window-navigation functions.

The reference engine's aggregation surface is flat GROUP BY + count
(SURVEY.md §2.4; lib/sonardb.py:1552-1595 info(), :3390-3425 match
counts).  A warehouse-grade engine needs the multidimensional forms;
this module adds them Spark-first, each with a DuckDB oracle twin
registered in covsonar_spark.registry:

  agg_cube_revenue     CUBE over two dims — all four grouping sets in
                       ONE shuffle (Spark Expand map-side, not 4 scans)
  pivot_revenue_matrix groupBy().pivot() matrix — map-side conditional
                       aggregation, one shuffle, no per-column scans
  unpivot_acctbal      wide->long via DataFrame.unpivot (Expand node,
                       zero shuffles beyond the source aggs)
  agg_stats_profile    corr / covar_pop / stddev / regr_slope per group
                       — all partial-mergeable moments, one shuffle
  agg_histogram        equi-width binning with data-driven bounds: a
                       column-pruned scalar min/max scan broadcast into
                       the binning pass (NOT a single-partition window)
  window_navigation    ntile / percent_rank / cume_dist / lag in one
                       window spec, then re-aggregated per cohort

Scale notes (100 TB):
  * CUBE/ROLLUP expand rows map-side by #grouping-sets — partial
    aggregation collapses them before the single shuffle, so cost is
    ~sets x map work, 1 x shuffle;
  * pivot with an explicit value list avoids the extra distinct-scan
    Spark otherwise runs to discover pivot values — always pass values;
  * the histogram's two scans are both column-pruned to one double
    column; the bounds scan is a 1-row broadcast, so the big scan
    stays a single pass with no wide shuffle at all;
  * moments (corr/covar/stddev) are one-pass partial aggregates —
    they merge like sums, so the plan is identical to a plain
    GROUP BY count at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, p=18, s=2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# CUBE
# ---------------------------------------------------------------------------

def agg_cube_revenue(spark, sf_dir):
    """All four grouping sets of (orderpriority, orderstatus) in one
    pass: Spark's Expand emits each input row once per set map-side and
    partial-aggregates before the one shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(F.grouping("o_orderpriority").cast("long").alias("g_prio"),
             F.grouping("o_orderstatus").cast("long").alias("g_status"),
             F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("sum_price"))
        .select("o_orderpriority", "o_orderstatus", "g_prio", "g_status",
                "n_orders", "sum_price")
        .orderBy(F.col("g_prio"), F.col("g_status"),
                 F.col("o_orderpriority").asc_nulls_last(),
                 F.col("o_orderstatus").asc_nulls_last())
    )


AGG_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       grouping(o_orderpriority) AS g_prio, grouping(o_orderstatus) AS g_status,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY g_prio, g_status, o_orderpriority ASC NULLS LAST, o_orderstatus ASC NULLS LAST
"""


# ---------------------------------------------------------------------------
# pivot / unpivot
# ---------------------------------------------------------------------------

def pivot_revenue_matrix(spark, sf_dir):
    """Nation x returnflag revenue matrix.  The explicit value list
    ["A","N","R"] matters: without it Spark runs an extra
    distinct-values job over the fact table before it can even plan.
    With it, pivot compiles to map-side conditional aggregation — the
    same single-shuffle plan as a plain GROUP BY."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
    )
    piv = (
        joined.groupBy("n_name")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(_dec("l_extendedprice")))
    )
    return (
        piv.select(
            "n_name",
            F.round(F.coalesce(F.col("A"), F.lit(0)).cast("double"), 2).alias("rev_a"),
            F.round(F.coalesce(F.col("N"), F.lit(0)).cast("double"), 2).alias("rev_n"),
            F.round(F.coalesce(F.col("R"), F.lit(0)).cast("double"), 2).alias("rev_r"),
        )
        .orderBy("n_name")
    )


PIVOT_REVENUE_SQL = """
SELECT n_name,
       round(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (l_returnflag = 'A'), 0) AS DOUBLE), 2) AS rev_a,
       round(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (l_returnflag = 'N'), 0) AS DOUBLE), 2) AS rev_n,
       round(CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (l_returnflag = 'R'), 0) AS DOUBLE), 2) AS rev_r
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def unpivot_acctbal(spark, sf_dir):
    """Wide->long: per-nation customer/supplier balance totals unpivoted
    into (n_name, side, total) rows.  DataFrame.unpivot is a pure Expand
    node — no shuffle beyond the two skinny aggregates feeding it."""
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    c = (cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
         .groupBy("n_name")
         .agg(F.round(F.sum(_dec("c_acctbal")).cast("double"), 2).alias("customer")))
    s = (sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
         .groupBy("n_name")
         .agg(F.round(F.sum(_dec("s_acctbal")).cast("double"), 2).alias("supplier")))
    wide = c.join(s, "n_name", "full_outer").na.fill(0.0, ["customer", "supplier"])
    return (
        wide.unpivot("n_name", ["customer", "supplier"], "side", "total")
        .orderBy("n_name", "side")
    )


UNPIVOT_ACCTBAL_SQL = """
WITH c AS (
  SELECT n_name, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS customer
  FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
), s AS (
  SELECT n_name, round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS supplier
  FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
), wide AS (
  SELECT coalesce(c.n_name, s.n_name) AS n_name,
         coalesce(customer, 0.0) AS customer, coalesce(supplier, 0.0) AS supplier
  FROM c FULL OUTER JOIN s USING (n_name)
)
SELECT n_name, side, total FROM (
  SELECT n_name, 'customer' AS side, customer AS total FROM wide
  UNION ALL
  SELECT n_name, 'supplier' AS side, supplier AS total FROM wide
) ORDER BY n_name, side
"""


# ---------------------------------------------------------------------------
# statistical moments
# ---------------------------------------------------------------------------

def agg_stats_profile(spark, sf_dir):
    """Second-moment statistics per group: Pearson correlation,
    population covariance, sample stddev, and OLS slope of price on
    quantity.  All four are one-pass mergeable moment aggregates — the
    plan is the same one-shuffle shape as a count, at any scale.
    Rounded to 4 decimals to pin float summation-order noise."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
             F.round(F.covar_pop("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
             F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
             F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_price_qty"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_pop(l_quantity, l_discount), 4) AS covar_qty_disc,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_qty,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# histogram
# ---------------------------------------------------------------------------

N_BINS = 20


def agg_histogram(spark, sf_dir):
    """Equi-width histogram of o_totalprice with data-driven bounds.
    Two passes by design: pass 1 is a column-pruned scalar min/max
    (partial-mergeable, no wide shuffle), whose 1-row result is
    broadcast into pass 2's binning aggregation.  The tempting
    single-scan alternative — min/max as an empty-frame window —
    funnels every row through ONE task and is exactly wrong at scale.
    Bin rule: least(floor((x-min)/w), n-1), identical in both engines."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    w = (F.col("hi") - F.col("lo")) / F.lit(N_BINS)
    return (
        o.crossJoin(F.broadcast(bounds))
        .withColumn("bin", F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / w),
                F.lit(N_BINS - 1).cast("bigint"))))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.min("o_totalprice"), 2).alias("bin_min"),
             F.round(F.max("o_totalprice"), 2).alias("bin_max"))
        .orderBy("bin")
    )


AGG_HISTOGRAM_SQL = f"""
WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / {N_BINS})) AS INT), {N_BINS - 1}) AS bin,
       count(*) AS n,
       round(min(o_totalprice), 2) AS bin_min,
       round(max(o_totalprice), 2) AS bin_max
FROM orders CROSS JOIN b
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# window navigation
# ---------------------------------------------------------------------------

def window_navigation(spark, sf_dir, events_fn):
    """Full navigation-function sweep in ONE window pass per spec:
    ntile(4) + lag inter-event gap + cume_dist over each user's
    timeline, re-aggregated to (cohort, quartile) so the result stays
    small.  Ordering is (ts_us, event_id) — a total order, which is
    what makes ntile/cume_dist deterministic across engines.  One
    shuffle on user_id serves every window function."""
    # events_fn is REQUIRED: the raw events parquet ships nanos-typed
    # ts; only the registry's _events shim normalizes it to ts_us, and
    # a fallback raw read could never resolve that column
    ev = events_fn(spark, sf_dir)
    wspec = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    per_row = (
        ev.select("user_id", "event_id", "ts_us", "value")
        .withColumn("quartile", F.ntile(4).over(wspec).cast("bigint"))
        .withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(wspec))
        .withColumn("cd", F.cume_dist().over(wspec))
    )
    return (
        per_row.groupBy((F.col("user_id") % 10).alias("cohort"), "quartile")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("gap_us").alias("sum_gap_us"),
             F.round(F.sum("cd"), 4).alias("sum_cume_dist"))
        .orderBy("cohort", "quartile")
    )


WINDOW_NAVIGATION_SQL = """
WITH per_row AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         ntile(4)    OVER w AS quartile,
         epoch_us(CAST(ts AS TIMESTAMP))
           - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
         cume_dist() OVER w AS cd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
)
SELECT user_id % 10 AS cohort, quartile, count(*) AS n,
       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us, round(sum(cd), 4) AS sum_cume_dist
FROM per_row GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# RANGE-frame trailing window
# ---------------------------------------------------------------------------

def window_trailing_range(spark, sf_dir):
    """30-day trailing spend per customer order — a RANGE frame over
    the day number (value-based, so it spans calendar gaps and ties,
    which a ROWS frame cannot).  The running sum stays DECIMAL through
    both the window and the cohort rollup — exact and order-free —
    and is cast/rounded exactly once.  One shuffle on o_custkey."""
    o = _t(spark, sf_dir, "orders")
    day = F.expr("datediff(o_orderdate, DATE '1970-01-01')")
    w = (Window.partitionBy("o_custkey").orderBy("day")
         .rangeBetween(-29, 0))
    per_order = (
        o.withColumn("day", day)
        .withColumn("trail_spend", F.sum(_dec("o_totalprice")).over(w))
        .withColumn("trail_n", F.count(F.lit(1)).over(w))
    )
    return (
        per_order.groupBy((F.col("o_custkey") % 10).alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("trail_n").alias("sum_trail_n"),
             F.round(F.sum("trail_spend").cast("double"), 2).alias("sum_trail_spend"))
        .orderBy("cohort")
    )


WINDOW_TRAILING_SQL = """
WITH per_order AS (
  SELECT o_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS trail_spend,
         count(*) OVER w AS trail_n
  FROM (SELECT o_custkey, o_totalprice,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
        FROM orders)
  WINDOW w AS (PARTITION BY o_custkey ORDER BY day
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT o_custkey % 10 AS cohort, count(*) AS n_orders,
       CAST(sum(trail_n) AS BIGINT) AS sum_trail_n,
       round(CAST(sum(trail_spend) AS DOUBLE), 2) AS sum_trail_spend
FROM per_order GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# dataset profiler
# ---------------------------------------------------------------------------

def profile_table_stats(spark, sf_dir):
    """Column-profile summary of the orders table — the warehouse
    `ANALYZE`/data-quality primitive: per column, non-null count,
    distinct count, min and max (stringified to a uniform schema).
    One pass: all per-column aggregates compute in a single scan
    (multiple DISTINCTs expand map-side), then pivot long via
    explode — no per-column scans."""
    o = _t(spark, sf_dir, "orders")

    def agg_of(c, numeric=False):
        mn, mx = F.min(c), F.max(c)
        if numeric:
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        return [F.count(c).alias(f"n_{c}"),
                F.countDistinct(c).alias(f"d_{c}"),
                mn.cast("string").alias(f"mn_{c}"),
                mx.cast("string").alias(f"mx_{c}")]

    one = o.agg(*(agg_of("o_orderstatus") + agg_of("o_orderpriority")
                  + agg_of("o_totalprice", numeric=True)))
    rows = F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col(f"n_{c}").alias("n_nonnull"),
                 F.col(f"d_{c}").alias("n_distinct"),
                 F.col(f"mn_{c}").alias("min_val"),
                 F.col(f"mx_{c}").alias("max_val"))
        for c in ["o_orderstatus", "o_orderpriority", "o_totalprice"]])
    return (one.select(F.explode(rows).alias("r")).select("r.*")
            .orderBy("column_name"))


PROFILE_TABLE_SQL = """
SELECT * FROM (
  SELECT 'o_orderstatus' AS column_name, count(o_orderstatus) AS n_nonnull,
         count(DISTINCT o_orderstatus) AS n_distinct,
         CAST(min(o_orderstatus) AS VARCHAR) AS min_val,
         CAST(max(o_orderstatus) AS VARCHAR) AS max_val FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(o_orderpriority), count(DISTINCT o_orderpriority),
         CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(o_totalprice), count(DISTINCT o_totalprice),
         CAST(round(min(o_totalprice), 2) AS VARCHAR), CAST(round(max(o_totalprice), 2) AS VARCHAR) FROM orders
) ORDER BY column_name
"""


QUERIES = {
    "window_trailing_range": (window_trailing_range, WINDOW_TRAILING_SQL),
    "profile_table_stats": (profile_table_stats, PROFILE_TABLE_SQL),
    "agg_cube_revenue": (agg_cube_revenue, AGG_CUBE_SQL),
    "pivot_revenue_matrix": (pivot_revenue_matrix, PIVOT_REVENUE_SQL),
    "unpivot_acctbal": (unpivot_acctbal, UNPIVOT_ACCTBAL_SQL),
    "agg_stats_profile": (agg_stats_profile, AGG_STATS_SQL),
    "agg_histogram": (agg_histogram, AGG_HISTOGRAM_SQL),
    # window_navigation wired in registry.py (needs the events ts shim)
}
