"""Bucketed-layout plan audits: co-located joins lose their Exchanges,
bucket-key point lookups prune to one bucket, and the bucketed path
value-equals the plain-parquet path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from covsonar_spark.operators import layout

    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    layout.write_bucketed(li, "t_lineitem_b", "l_orderkey", 8,
                          path=str(base / "lineitem"))
    layout.write_bucketed(orders, "t_orders_b", "o_orderkey", 8,
                          path=str(base / "orders"))
    yield "t_lineitem_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    """The whole point of bucketing: the SMJ's required distribution is
    satisfied at scan time, so NO Exchange appears anywhere in the
    join plan — at 100 TB this join moves zero bytes between executors."""
    from covsonar_spark.operators import layout

    lt, ot = bucketed_tables
    # force the merge-join path (broadcast would hide the distribution)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = layout.colocated_join(spark, lt, ot, "l_orderkey", "o_orderkey")
        plan = _plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree
    assert "Exchange" not in tree, tree
    assert "Bucketed: true" in plan


def test_unbucketed_same_join_shuffles_both_sides(spark, bucketed_tables):
    """Control: identical join over plain parquet scans needs two
    Exchanges — this is the cost bucketing deletes."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(li.join(orders, li.l_orderkey == orders.o_orderkey))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") >= 2


def test_bucket_key_point_lookup_prunes_buckets(spark, bucketed_tables):
    """Equality on the bucket key scans 1 of 8 buckets — the B-tree
    point-lookup path (reference PK index) without any index."""
    lt, _ = bucketed_tables
    # autoBucketedScan treats a filter-only scan as "no join benefit"
    # and silently falls back to a full scan; pin it off so pruning
    # engages (on a real deployment, off is the right default for
    # point-lookup-heavy tables)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(lt).where(F.col("l_orderkey") == 7)
        plan = _plan(df)
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    assert "SelectedBucketsCount: 1 out of 8" in plan


def test_bucketed_join_values_match_plain_join(spark, bucketed_tables):
    from covsonar_spark.operators import layout

    lt, ot = bucketed_tables
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    a = (layout.colocated_join(spark, lt, ot, "l_orderkey", "o_orderkey")
         .groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2)
               .alias("total")))
    b = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n"),
              F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2)
               .alias("total")))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# Z-order layout: 2-D box pruning beats single-column sort
# ---------------------------------------------------------------------------

def _cells_hit(spark, paths, c1, r1, c2, r2):
    """How many storage cells a (c1 in r1) AND (c2 in r2) box query
    must read, judged by per-cell min/max stats — the same decision a
    file-skipping reader makes from parquet footers."""
    from pyspark.sql import functions as F

    hit = 0
    for p in paths:
        s = spark.read.parquet(p).agg(
            F.min(c1), F.max(c1), F.min(c2), F.max(c2)).first()
        if s[0] <= r1[1] and s[1] >= r1[0] and s[2] <= r2[1] and s[3] >= r2[0]:
            hit += 1
    return hit


def test_zorder_prunes_2d_box_better_than_linear_sort(spark, tmp_path):
    import glob

    from covsonar_spark.operators.layout import write_zordered

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet") \
        .withColumn("day", F.expr("datediff(o_orderdate, DATE '1970-01-01')"))
    n_cells = 16
    lo_c, hi_c = o.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    lo_d, hi_d = o.agg(F.min("day"), F.max("day")).first()

    # linear layout: 16 deterministic equal-width custkey cells
    lin = str(tmp_path / "linear")
    lin_cell = F.least(
        F.floor((F.col("o_custkey") - lo_c) / ((hi_c - lo_c + 1) / n_cells)),
        F.lit(n_cells - 1)).cast("int")
    (o.withColumn("_cell", lin_cell).repartition(n_cells, "_cell")
      .write.partitionBy("_cell").parquet(lin))
    zo = str(tmp_path / "zorder")
    write_zordered(o, zo, "o_custkey", "day", n_cells)

    # a box covering ~1/4 of each dimension => ~1/16 of the plane
    c_box = (lo_c, lo_c + (hi_c - lo_c) // 4)
    d_box = (lo_d, lo_d + (hi_d - lo_d) // 4)

    lin_hit = _cells_hit(spark, sorted(glob.glob(f"{lin}/_cell=*")),
                         "o_custkey", c_box, "day", d_box)
    z_hit = _cells_hit(spark, sorted(glob.glob(f"{zo}/_zcell=*")),
                       "o_custkey", c_box, "day", d_box)

    # linear layout prunes custkey only: the date half of the box hits
    # every custkey-selected cell; the z-layout prunes BOTH dimensions
    assert z_hit < lin_hit, (z_hit, lin_hit)
    assert z_hit <= n_cells // 4

    # and the layouts hold the same rows (clustering is lossless)
    assert spark.read.parquet(zo).count() == o.count()
