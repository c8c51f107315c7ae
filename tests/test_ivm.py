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
