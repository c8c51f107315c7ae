"""Incremental view maintenance: delta merges equal one-shot
aggregation for any chunking; retraction deltas undo count/sum."""

from __future__ import annotations

from pyspark.sql import functions as F

from covsonar_spark.operators import ivm

SF_DIR = "/root/testdata/sf0.01"
KEYS = ["o_orderpriority", "o_orderstatus"]


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _view_rows(df, keys=KEYS):
    return {tuple(r) for r in df.collect()}


def test_five_way_chunked_merge_equals_one_shot(spark):
    o = _orders(spark)
    state = None
    for i in range(5):
        delta = ivm.agg_state(o.where(F.col("o_orderkey") % 5 == i),
                              KEYS, "o_totalprice")
        state = ivm.merge_states(state, delta, KEYS)
    got = _view_rows(ivm.finalize(state, KEYS))
    want = _view_rows(ivm.finalize(
        ivm.agg_state(o, KEYS, "o_totalprice"), KEYS))
    assert got == want and len(got) > 0


def test_retraction_delta_undoes_count_and_sum(spark):
    o = _orders(spark)
    extra = o.where(F.col("o_orderkey") % 7 == 0)
    grown = ivm.merge_states(ivm.agg_state(o, KEYS, "o_totalprice"),
                             ivm.agg_state(extra, KEYS, "o_totalprice"),
                             KEYS)
    shrunk = ivm.merge_states(grown,
                              ivm.agg_state(extra, KEYS, "o_totalprice",
                                            negate=True),
                              KEYS)
    base = ivm.agg_state(o, KEYS, "o_totalprice")
    got = {tuple(r) for r in
           shrunk.select(*KEYS, "cnt", "sum_dec").collect()}
    want = {tuple(r) for r in
            base.select(*KEYS, "cnt", "sum_dec").collect()}
    assert got == want


def test_retraction_to_zero_deletes_the_group(spark):
    """A group whose rows were all retracted must disappear from the
    finalized view, not crash the avg division (ANSI DIVIDE_BY_ZERO)."""
    from covsonar_spark.operators.ivm import agg_state, finalize, merge_states

    rows = spark.createDataFrame(
        [("A", 2.0), ("A", 4.0), ("B", 1.0)], "g string, v double")
    base = agg_state(rows, ["g"], "v")
    retract_a = agg_state(rows.where("g = 'A'"), ["g"], "v", negate=True)
    view = finalize(merge_states(base, retract_a, ["g"]), ["g"]).collect()
    assert [r["g"] for r in view] == ["B"]


def test_join_delta_equals_one_shot(spark):
    """Replayed chunked inserts into both sides of an equi-join view
    reproduce the one-shot join exactly, each row exactly once."""
    from covsonar_spark.operators import ivm

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"))
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_name")
    a0, da = (o.where(F.col("o_orderkey") % 2 == 0),
              o.where(F.col("o_orderkey") % 2 == 1))
    b0, db = (c.where(F.col("c_custkey") % 2 == 0),
              c.where(F.col("c_custkey") % 2 == 1))
    view = a0.join(b0, ["c_custkey"])
    view = view.unionByName(ivm.join_delta(a0, da, b0, None, ["c_custkey"]))
    view = view.unionByName(
        ivm.join_delta(a0.unionByName(da), None, b0, db, ["c_custkey"]))
    got = sorted(tuple(r) for r in view.collect())
    want = sorted(tuple(r) for r in o.join(c, ["c_custkey"]).select(
        view.columns).collect())
    assert got == want and len(got) == len(set(got))


def test_join_delta_requires_a_delta(spark):
    import pytest

    from covsonar_spark.operators import ivm
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        ivm.join_delta(df, None, df, None, ["k"])


def test_counted_join_view_with_deletes(spark):
    """Insert chunked rows into both sides, then DELETE some left rows
    via -1 multiplicities: the consolidated view equals the one-shot
    join of the final base tables."""
    from covsonar_spark.operators import ivm

    sf = "/root/testdata/sf0.001"
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey")) \
        .withColumn("m", F.lit(1))
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_name").withColumn("m", F.lit(1))
    a0 = o.where(F.col("o_orderkey") % 2 == 0)
    da = o.where(F.col("o_orderkey") % 2 == 1)
    b0 = c.where(F.col("c_custkey") % 2 == 0)
    db = c.where(F.col("c_custkey") % 2 == 1)

    view = a0.join(b0.withColumnRenamed("m", "_mb"), ["c_custkey"]) \
             .withColumn("m", F.col("m") * F.col("_mb")).drop("_mb")
    view = view.unionByName(
        ivm.join_delta_counted(a0, da, b0, None, ["c_custkey"]))
    view = view.unionByName(
        ivm.join_delta_counted(a0.unionByName(da), None, b0, db,
                               ["c_custkey"]))
    # DELETE every order divisible by 10: retraction delta m=-1
    dele = o.where(F.col("o_orderkey") % 10 == 0) \
            .withColumn("m", F.lit(-1))
    view = view.unionByName(
        ivm.join_delta_counted(None, dele, b0.unionByName(db), None,
                               ["c_custkey"]))
    net = ivm.consolidate(view)

    want_base = o.where(F.col("o_orderkey") % 10 != 0).drop("m")
    want = sorted(tuple(r) for r in
                  want_base.join(c.drop("m"), ["c_custkey"]).collect())
    got_rows = net.collect()
    assert all(r["m"] == 1 for r in got_rows)
    got = sorted((r["c_custkey"], r["o_orderkey"], r["c_name"])
                 for r in got_rows)
    want = sorted((a, b, n) for a, b, n in want)
    assert got == want


def test_segmented_retraction_repairs_deleted_extrema(spark):
    """Delete exactly the rows carrying each group's max (and one
    group's min): the segmented rescan must repair mn/mx to the
    survivors' true extrema — the case plain state algebra cannot
    handle."""
    o = _orders(spark).withColumn(
        "seg", F.pmod(F.col("o_orderkey"), F.lit(4)).cast("int"))
    keys = ["o_orderpriority"]
    state = ivm.agg_state_segmented(o, keys, "o_totalprice", "seg")
    # per-group max rows — deleting them forces every group's mx repair
    from pyspark.sql import Window
    w = Window.partitionBy(*keys).orderBy(F.col("o_totalprice").desc(),
                                          F.col("o_orderkey").asc())
    deletes = (o.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") <= 3).drop("rn"))
    del_keys = deletes.select("o_orderkey").distinct()
    remaining = o.join(del_keys, "o_orderkey", "left_anti")
    state = ivm.retract_segmented(state, deletes, remaining,
                                  keys, "o_totalprice", "seg")
    got = {tuple(r) for r in ivm.finalize_segmented(state, keys).collect()}
    want = {tuple(r) for r in ivm.finalize(
        ivm.agg_state(remaining, keys, "o_totalprice"), keys).collect()}
    assert got == want and len(got) > 0
    # the repair actually moved the max (the deleted rows WERE extrema)
    before = {r["o_orderpriority"]: r["max_val"] for r in ivm.finalize(
        ivm.agg_state(o, keys, "o_totalprice"), keys).collect()}
    after = {r["o_orderpriority"]: r["max_val"]
             for r in ivm.finalize_segmented(state, keys).collect()}
    assert any(after[k] < before[k] for k in after)


def test_segmented_retraction_drops_emptied_segments(spark):
    """A (group, segment) cell whose rows are all deleted vanishes from
    the state, and the rolled-up view matches the survivors."""
    o = _orders(spark).withColumn(
        "seg", F.pmod(F.col("o_orderkey"), F.lit(2)).cast("int"))
    keys = ["o_orderstatus"]
    state = ivm.agg_state_segmented(o, keys, "o_totalprice", "seg")
    deletes = o.where(F.col("seg") == 0)     # empty every seg-0 cell
    remaining = o.where(F.col("seg") == 1)
    state = ivm.retract_segmented(state, deletes, remaining,
                                  keys, "o_totalprice", "seg")
    assert state.where(F.col("seg") == 0).count() == 0
    got = {tuple(r) for r in ivm.finalize_segmented(state, keys).collect()}
    want = {tuple(r) for r in ivm.finalize(
        ivm.agg_state(remaining, keys, "o_totalprice"), keys).collect()}
    assert got == want
