"""Runtime-metric checks: the zero-shuffle / no-spill claims asserted
with executed SQLMetrics, not just plan shapes."""

from __future__ import annotations

from covsonar_spark.metrics import exec_metrics

SF = "/root/testdata/sf0.01"


def test_aggregate_reports_shuffle_and_scan(spark):
    df = (spark.read.parquet(f"{SF}/orders.parquet")
          .groupBy("o_orderpriority").count())
    m = exec_metrics(df)
    assert m.exchanges >= 1
    assert m.shuffle_bytes_written > 0
    assert m.files_read >= 1 and m.file_bytes_planned > 0
    # a 5-group rollup must not spill
    assert m.spill_bytes == 0


def test_priority_sample_runs_shuffle_free(spark):
    """The docstring's 'no shuffle of the corpus' claim, verified on a
    real run: zero exchange bytes."""
    from covsonar_spark.operators.curation import priority_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m = exec_metrics(priority_sample(docs, "n_chars", k=50))
    assert m.shuffle_bytes_written == 0 and m.exchanges == 0
    assert m.spill_bytes == 0


def test_headline_queries_do_not_spill(spark):
    """Spill on sf0.01 would mean partitions outgrow memory at trivial
    scale — a sizing bug worth failing on."""
    from covsonar_spark.registry import REGISTRY

    for name in ("q1_pricing_summary", "q18_large_orders",
                 "match_profile_and", "dedup_exact"):
        m = exec_metrics(REGISTRY[name][0](spark, SF))
        assert m.spill_bytes == 0, name


def test_hll_shuffle_is_bounded_by_sketch_size(spark):
    """The sketch's reason to exist, shown in runtime numbers: the HLL
    register aggregation's shuffle carries at most groups x 256
    register rows (map-side combine collapses input before the wire),
    far below the input row count."""
    from pyspark.sql import functions as F

    from covsonar_spark.operators.sketches import HLL_M, hll_registers

    o = spark.read.parquet(f"{SF}/orders.parquet")
    n_rows = o.count()
    n_groups = o.select("o_orderpriority").distinct().count()
    m = exec_metrics(hll_registers(o, "o_orderpriority", "o_custkey"))
    # per shuffle map task the partial agg emits ≤ groups*256 rows;
    # 8 test partitions upper-bounds the total at 8x that, still ~100x
    # below the input rows
    assert 0 < m.shuffle_records_written <= 8 * n_groups * HLL_M
    assert m.shuffle_records_written < n_rows / 2
