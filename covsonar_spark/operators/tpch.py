"""Join-planning suite beyond the reference's equi-join surface.

The reference engine only ever does seqhash equi-joins and broadcast
dict lookups (SURVEY.md §2.3: lib/db.sqlite:95-189, lib/sonardb.py:3390-3425).
A 100 TB engine needs the full relational join repertoire; this module
adds the classic TPC-H shapes the round-1 suite did not cover, each
adapted to the driver's synthetic schema and each with a DuckDB oracle
twin (registered in covsonar_spark.registry):

  q2-analog   correlated scalar subquery -> window-min decorrelation
  q7          dual-dimension join (two nation roles for one dim table)
  q8          market-share: conditional agg over a 7-way join
  q10         returned-item revenue, aggregate-then-join top-k
  q13         LEFT OUTER join + COUNT(col) distribution (null-preserving)
  q14         conditional-aggregation ratio (promo share)
  q15         window-max over an aggregate (top supplier, ties kept)
  q17         per-key average correlated subquery -> broadcast agg join
  q19         disjunctive mixed-table predicates (OR-of-conjunctions)
  q22         scalar-aggregate cross filter + NOT EXISTS anti-join

Scale notes (100 TB plan audit, see tests/test_plan_audit.py):
  * every dim side that is small (nation, region, supplier, part slices)
    is broadcast — no shuffle of the lineitem fact for those joins;
  * aggregate-before-join wherever the join only needs aggregated keys
    (q10, q15, q17): one shuffle on the group key, then a skinny join;
  * q13's outer join keeps the customer side intact — at scale the
    orders side is pre-filtered and shuffles once on o_custkey, and the
    COUNT distribution re-aggregates a 1-row-per-customer frame;
  * q17/q2's correlated subqueries are decorrelated into self-agg +
    join (Spark cannot see through per-row subqueries; hand-decorrelation
    is the planner-friendly form and is exactly what Catalyst's
    RewriteCorrelatedScalarSubquery would emit).

Money math follows the registry's oracle-parity convention: DOUBLE ->
DECIMAL(18,2) before SUM (exact, order-independent), cast back to
DOUBLE and round once at the end.
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


def _revenue():
    return F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2)))


# ---------------------------------------------------------------------------
# q2-analog: min-cost supplier per part (correlated scalar subquery)
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark, sf_dir):
    """For each LARGE part of size >= 40, the supplier(s) offering the
    minimum lineitem price. TPC-H q2's correlated scalar subquery
    (min supplycost per part), decorrelated as a window-min over the
    (part, supplier) supply catalog derived from lineitem. ONE shuffle
    total on the fact: hash-partitioning on l_partkey alone satisfies
    both the (l_partkey, l_suppkey) groupBy's clustering (subset key)
    and the window's partitionBy(l_partkey) — asserted in
    tests/test_plan_audit.py; part/supplier dims broadcast.

    The part slice prunes the fact BEFORE the shuffle: a broadcast
    left-semi join on the filtered p_partkey set keeps only the ~few-%
    of lineitem rows whose partkey survives, so the repartition/groupBy
    never shuffles rows the final broadcast join would discard (at
    100× the unpruned plan shuffles the FULL fact for a small slice).
    Semantics unchanged — both the catalog min and the window min are
    per-partkey, so dropping whole partkeys early is exact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 40))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    catalog = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.min(_dec("l_extendedprice")).cast("double"), 2).alias("supply_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = (catalog.withColumn("min_cost", F.min("supply_cost").over(w))
            .where(F.col("supply_cost") == F.col("min_cost")))
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_brand", "s_name", "n_name", "supply_cost")
        .orderBy("p_partkey", "s_name")
    )


Q2_SQL = """
WITH catalog AS (
  SELECT l_partkey, l_suppkey,
         round(CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT p_partkey, p_brand, s_name, n_name, supply_cost
FROM catalog
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'LARGE' AND p_size >= 40
  AND supply_cost = (SELECT min(c2.supply_cost) FROM catalog c2
                     WHERE c2.l_partkey = catalog.l_partkey)
ORDER BY p_partkey, s_name
"""


# ---------------------------------------------------------------------------
# q7: volume shipping between two nations (dual-role dimension join)
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark, sf_dir):
    """Revenue shipped between NATION_1 and NATION_2 (either direction),
    per (supplier nation, customer nation, ship year). The nation dim
    joins TWICE under different roles (supplier side, customer side) —
    two independent broadcasts, zero fact shuffles for either; the only
    shuffles are lineitem⋈orders on orderkey and the final tiny agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(_revenue().cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(vol) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q8: market share (conditional aggregation over the widest join)
# ---------------------------------------------------------------------------

def q8_market_share(spark, sf_dir):
    """NATION_2's share of PROMO-part revenue delivered into ASIA, per
    order year — a 7-way join where the share is a conditional
    aggregate (sum-if / sum). All dims broadcast; the fact shuffles
    once (lineitem⋈orders on orderkey). Exact decimal division at the
    end keeps the ratio bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey"))
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("c_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("vol", vol)
        .groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("vol"))
                  .otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
            / F.sum("vol").cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n2.n_name AS supp_nation,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q10: returned-item revenue per customer (aggregate-then-join top-k)
# ---------------------------------------------------------------------------

def q10_returned_items(spark, sf_dir):
    """Top-20 customers by revenue lost to returns in 1997H1. The
    return-filtered fact joins orders (one orderkey shuffle), aggregates
    per customer FIRST (skinny 1-row-per-customer frame), and only then
    joins the customer dim for reporting — at 100 TB the reporting join
    moves O(customers) rows, not O(lineitems)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")))
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(_revenue().cast("double"), 2).alias("revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name",
                F.round(_dec("c_acctbal").cast("double"), 2).alias("acctbal"), "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, n_name,
       round(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE), 2) AS acctbal, revenue
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q13: customer order-count distribution (null-preserving outer join)
# ---------------------------------------------------------------------------

def q13_customer_distribution(spark, sf_dir):
    """How many customers placed 0, 1, 2, ... urgent-ish orders — a LEFT
    OUTER join whose COUNT(o_orderkey) must count nulls as zero (the
    customers-without-orders row survives the join). Two aggregations:
    per-customer count (shuffle on c_custkey), then the tiny histogram.
    The orders side is pre-filtered before the join (predicate cannot
    move into a WHERE after an outer join without changing semantics)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q14: promo revenue share (conditional-aggregation ratio)
# ---------------------------------------------------------------------------

def q14_promo_revenue(spark, sf_dir):
    """Share of revenue from PROMO parts in one ship quarter — the
    numerator is a CASE-gated sum over the same rows as the denominator
    (one pass, no self-join). part broadcasts into the filtered fact."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    part = _t(spark, sf_dir, "part")
    vol = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("vol", vol)
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("vol"))
                    .otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
            / F.sum("vol").cast("double"), 6).alias("promo_share"))
    )


Q14_SQL = """
SELECT round(100.0
       * CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum(vol) AS DOUBLE), 6) AS promo_share
FROM (
  SELECT p_type,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01')
"""


# ---------------------------------------------------------------------------
# q15: top supplier by quarter revenue (window-max over an aggregate)
# ---------------------------------------------------------------------------

def q15_top_supplier(spark, sf_dir):
    """Supplier(s) with the maximum revenue in 1997Q1 — TPC-H q15's
    CREATE VIEW + scalar-max, expressed as aggregate → window-max →
    filter (ties kept, like the original). The window is over the
    *aggregated* 100-row frame, not the fact table, so the global max
    costs a single-partition pass over 100 rows, not a second fact scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    supp = _t(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(_revenue().cast("double"), 2).alias("total_revenue")))
    w = Window.partitionBy()
    best = (rev.withColumn("max_rev", F.max("total_revenue").over(w))
            .where(F.col("total_revenue") == F.col("max_rev")))
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q17: small-quantity orders (per-key average correlated subquery)
# ---------------------------------------------------------------------------

def q17_small_quantity(spark, sf_dir):
    """Yearly revenue lost if Brand#1 small-quantity orders stopped:
    lineitems with quantity below 40% of their part's average quantity.
    The correlated `avg(l_quantity) where same part` is decorrelated
    into a per-part aggregate joined back — the aggregate is built from
    the SAME brand-filtered slice (semantics: the threshold uses all
    lineitems of those parts, so the agg side filters only on part,
    matching TPC-H). Both join inputs are partkey-partitioned from one
    shuffle each; the brand slice of part broadcasts into both."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    brand_li = li.join(F.broadcast(part.select("p_partkey")),
                       li.l_partkey == F.col("p_partkey")).drop("p_partkey")
    thresholds = (brand_li.groupBy("l_partkey")
                  .agg((F.lit(0.4) * F.avg("l_quantity")).alias("qty_threshold")))
    small = (brand_li.join(thresholds, "l_partkey")
             .where(F.col("l_quantity") < F.col("qty_threshold")))
    return small.agg(
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 2)
        .alias("avg_yearly"))


Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.4 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------------------
# q19: disjunctive mixed-table predicates
# ---------------------------------------------------------------------------

def q19_disjunctive(spark, sf_dir):
    """Revenue from three alternative (brand, size, quantity) channels —
    an OR of conjunctions that references BOTH join sides. The shared
    conjunct (returnflag, the join key) is factored out so it pushes
    into the scans; the OR residual evaluates post-join inside
    whole-stage codegen. TPC-H q19's planner test: naive engines
    evaluate the OR as a filter on a cross-ish join; factored form keeps
    the equi-join + pushed scans."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") != "R")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    ch1 = (F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(1, 15))
    ch2 = (F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 20)) & (F.col("l_quantity").between(10, 25))
    ch3 = (F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 30)) & (F.col("l_quantity").between(20, 35))
    return joined.where(ch1 | ch2 | ch3).agg(
        F.round(_revenue().cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"))


Q19_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_returnflag <> 'R'
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35))
"""


# ---------------------------------------------------------------------------
# q22: dormant rich customers (scalar-agg filter + anti-join)
# ---------------------------------------------------------------------------

def q22_global_sales(spark, sf_dir):
    """Per market segment: customers with above-average positive account
    balance and no orders since 2000. Two classic planner moves in one
    query: a scalar aggregate (the global average) broadcast as a
    cross-filter, and NOT EXISTS as a left-anti join against just the
    o_custkey column (date filter pushed into that pruned build-side
    scan). The average is computed over positive balances only, like
    TPC-H's cntrycode average."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    avg_bal = (cust.where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("avg_bal")))
    dormant = rich.join(orders.select("o_custkey"),
                        rich.c_custkey == F.col("o_custkey"), "left_anti")
    return (
        dormant.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum(_dec("c_acctbal")).cast("double"), 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q6: forecast revenue change (pure scan-aggregate, everything pushed)
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark, sf_dir):
    """Revenue increase if 1996 discounts in [0.05, 0.07] on sub-24-qty
    lineitems were dropped. The simplest possible shape and therefore
    the sharpest pushdown audit: NO join, NO post-scan filter — every
    predicate (date range, discount range, quantity bound) must land in
    PushedFilters, the scan must read exactly 4 of 11 columns, and the
    whole query is one partial+final agg with no wide shuffle at all."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24))
    return li.agg(
        F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount", 4, 2)).cast("double"), 2)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"))


Q6_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q9: product-type profit (widest join + expression over both sides)
# ---------------------------------------------------------------------------

def q9_product_profit(spark, sf_dir):
    """Profit on 'red'-named parts per (supplier nation, order year):
    revenue minus an inventory-cost proxy (0.5 * p_retailprice * qty —
    the synthetic schema has no partsupp.ps_supplycost; TPC-H q9
    lib-analog). part/supplier/nation broadcast; the single fact
    shuffle is lineitem⋈orders on orderkey. The two money sums are
    aggregated SEPARATELY in decimal and differenced as doubles at the
    end — mixed-precision decimal subtraction promotes differently in
    Spark vs DuckDB, double差 of two exact sums does not."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    vol = _dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 4, 2))
    cost = _dec("p_retailprice") * _dec("l_quantity") * F.lit(0.5).cast("decimal(2,1)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.round(F.sum(vol).cast("double") - F.sum(cost).cast("double"), 2)
             .alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT nation, o_year,
       round(CAST(sum(vol) AS DOUBLE) - CAST(sum(cost) AS DOUBLE), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol,
         CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.5 AS DECIMAL(2,1)) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q11: important stock (scalar-aggregate threshold over one aggregate)
# ---------------------------------------------------------------------------

def q11_important_stock(spark, sf_dir):
    """Parts representing > 0.1% of NATION_1 suppliers' shipped value.
    TPC-H q11's shape: ONE aggregate frame feeds both the per-part rows
    and the global threshold (scalar subquery). The threshold is an
    empty-frame window SUM over the aggregated frame — NOT a separate
    .agg() + crossJoin, which would reference the frame twice,
    duplicate its subtree, and scan the fact twice (DataFrame lineage
    is a tree, not a DAG; only identical subplans get ReusedExchange,
    and pushed-down pruning makes the two copies differ). One fact
    scan, one partkey shuffle, then a single-partition pass over the
    ~|parts| rows — audited in test_plan_audit."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    n1_supp = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey) \
                  .select("s_suppkey")
    per_part = (
        li.join(F.broadcast(n1_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    # global threshold as an empty-frame window over the ~|parts| aggregate:
    # referencing per_part twice (agg + crossJoin) would duplicate the
    # subtree and scan the fact twice — the window keeps ONE scan
    total_w = Window.partitionBy()
    return (
        per_part
        .withColumn("threshold", F.sum("value_dec").over(total_w).cast("double") * F.lit(0.001))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"),
                F.round(F.col("value_dec").cast("double"), 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("partkey"))
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
  GROUP BY l_partkey)
SELECT partkey, round(CAST(value_dec AS DOUBLE), 2) AS value
FROM per_part
WHERE CAST(value_dec AS DOUBLE) > (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM per_part)
ORDER BY value DESC, partkey
"""


# ---------------------------------------------------------------------------
# q12: late-shipment priority classes (join + dual conditional count)
# ---------------------------------------------------------------------------

def q12_shipping_priority_classes(spark, sf_dir):
    """Per lineitem status: how many LATE shipments (shipped > 60 days
    after order date) came from critical- vs low-priority orders.
    TPC-H q12 with lateness derived from the shipdate/orderdate pair
    (the synthetic schema has no commit/receipt dates). The lateness
    predicate references both join sides, so it evaluates post-join
    inside codegen; the count pair is a single-pass CASE aggregation,
    not two scans."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(60), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(late)
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q16: supplier relationship count (distinct-count + NOT-IN anti-join)
# ---------------------------------------------------------------------------

def q16_parts_supplier_relationship(spark, sf_dir):
    """Distinct suppliers per (brand, type, size) for non-Brand#5 parts,
    excluding 'complaint' suppliers (negative balance — the schema's
    stand-in for q16's LIKE '%Customer%Complaints%'). The supply
    catalog is DISTINCT (partkey, suppkey) pairs reduced from the fact
    BEFORE any dim join — at 100 TB that collapses billions of
    lineitems to the catalog's cardinality first; the complaint list is
    a broadcast anti-join (NOT IN with no NULL hazard: keys are
    non-null PKs); part is broadcast after its own filter."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#5")
    complaints = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0) \
        .select("s_suppkey")
    catalog = li.select("l_partkey", "l_suppkey").distinct()
    return (
        catalog.join(F.broadcast(complaints),
                     catalog.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) catalog
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q20: excess-stock suppliers (nested semi-join chain)
# ---------------------------------------------------------------------------

def q20_excess_stock_suppliers(spark, sf_dir):
    """NATION_1 suppliers who shipped > 30% of 1997's total volume of
    some 'blue' part — q20's nested IN-subquery chain. Decorrelated
    bottom-up from ONE partkey-clustered shuffle: the (part, supplier)
    quantity rollup and the per-part total window both ride the same
    hashpartitioning(l_partkey) — no second exchange, no second fact
    scan (a per_ps ⋈ per_ps.groupBy() formulation would duplicate the
    subtree and scan lineitem twice) — and only the surviving supplier
    keys (distinct, broadcast-sized) semi-join the supplier dim.
    Audited: exactly one lineitem scan in the plan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("blue"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    blue_li = li.join(F.broadcast(part.select("p_partkey")),
                      li.l_partkey == F.col("p_partkey")).drop("p_partkey")
    per_ps = (blue_li.repartition(F.col("l_partkey"))
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.sum("l_quantity").alias("supp_qty")))
    # per-part total as a window over the rollup — joining per_ps to a
    # per_ps.groupBy() derivative would duplicate the subtree (two fact
    # scans); the window shares the repartition's partkey clustering
    heavy = (per_ps
             .withColumn("part_qty", F.sum("supp_qty").over(Window.partitionBy("l_partkey")))
             .where(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
             .select("l_suppkey").distinct())
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH blue_li AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%blue%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'),
per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM blue_li GROUP BY l_partkey, l_suppkey),
per_part AS (
  SELECT l_partkey, sum(supp_qty) AS part_qty FROM per_ps GROUP BY l_partkey)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (SELECT l_suppkey FROM per_ps JOIN per_part USING (l_partkey)
                    WHERE supp_qty > 0.3 * part_qty)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins)
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark, sf_dir):
    """NATION_1 suppliers who were the SOLE late shipper (> 90 days
    after order date) on a finished multi-supplier order — q21's
    double-correlated EXISTS / NOT EXISTS, the hardest self-join shape
    in the suite. The literal form (left-semi "another supplier exists"
    + left-anti "no other late supplier") references the derived
    (order, supplier) frame three times; DataFrame lineage is a tree,
    so that plan scans the fact THREE times. Decorrelated instead into
    per-order window counts over one frame: EXISTS(other supplier) ⇔
    count(*) over (partition by order) > 1, NOT EXISTS(other late) ⇔
    sum(is_late) over (partition by order) = 1 for a late row. One fact
    scan, and the explicit repartition on l_orderkey alone feeds the
    (orderkey, suppkey) groupBy AND the window — one shuffle, audited.
    The DuckDB oracle keeps the literal EXISTS/NOT-EXISTS form."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("is_late",
                    F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(90), F.col("o_orderdate")))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        base
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum(F.col("is_late").cast("int")).over(w))
        .where(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(F.broadcast(
            supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .select("s_suppkey", "s_name")),
            waiting.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


Q21_SQL = """
WITH base AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) = 1 AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey)
SELECT s_name, count(*) AS numwait
FROM base l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1' AND l1.is_late
  AND EXISTS (SELECT 1 FROM base l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM base l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q12_shipping_priority_classes": (q12_shipping_priority_classes, Q12_SQL),
    "q16_parts_supplier_relationship": (q16_parts_supplier_relationship, Q16_SQL),
    "q20_excess_stock_suppliers": (q20_excess_stock_suppliers, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q19_disjunctive": (q19_disjunctive, Q19_SQL),
    "q22_global_sales": (q22_global_sales, Q22_SQL),
}
