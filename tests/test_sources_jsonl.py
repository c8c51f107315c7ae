"""JSONL source/sink: lossless round-trip, explicit-schema reads,
corrupt-line accounting, and gzip path."""

from __future__ import annotations

from pyspark.sql import functions as F

from covsonar_spark.sources.jsonl import (DOCUMENTS_SCHEMA,
                                          corrupt_line_count, read_jsonl,
                                          write_jsonl)

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sum_id"),
        F.sum(F.length("text")).alias("sum_len"),
        F.countDistinct("lang", "source").alias("n_ls")).collect()[0]


def test_jsonl_round_trip_lossless(spark, tmp_path):
    docs = _docs(spark)
    write_jsonl(docs, str(tmp_path / "docs"), shards=4)
    back = read_jsonl(spark, str(tmp_path / "docs"), DOCUMENTS_SCHEMA)
    assert corrupt_line_count(back) == 0
    assert _fingerprint(back.drop("_corrupt_record")) == _fingerprint(docs)


def test_jsonl_gzip_round_trip(spark, tmp_path):
    docs = _docs(spark).limit(50)
    write_jsonl(docs, str(tmp_path / "gz"), compression="gzip")
    back = read_jsonl(spark, str(tmp_path / "gz"), DOCUMENTS_SCHEMA,
                      keep_corrupt=False)
    assert _fingerprint(back) == _fingerprint(docs)


def test_corrupt_lines_are_counted_not_dropped(spark, tmp_path):
    docs = _docs(spark).limit(10)
    write_jsonl(docs, str(tmp_path / "docs"))
    bad = tmp_path / "docs" / "zz_bad.json"
    bad.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    back = read_jsonl(spark, str(tmp_path / "docs"), DOCUMENTS_SCHEMA)
    assert corrupt_line_count(back) == 1
    # 10 docs + 1 good injected line + 1 corrupt line, none dropped
    assert back.count() == 12


def test_events_nanos_encoding_on_plain_session(spark, tmp_path):
    """Past testdata generations shipped events.ts as TIMESTAMP(NANOS),
    which Spark's reader rejects unless nanosAsLong is set. The
    registry's _events must normalize that encoding to the same ts_us
    the MICROS encoding yields — including on an externally-owned
    session where the flag wasn't set at birth (ensure_nanos_readable
    peeks the footer and sets it only then)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from covsonar_spark.registry import _events

    micros = [1_600_000_000_000_000 + i * 1_000_000 for i in range(5)]
    tbl = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["view"] * 5),
        "ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
        "value": pa.array([float(i) for i in range(5)]),
        "props": pa.array(["{}"] * 5),
    })
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    # simulate an externally-owned session without the flag: the footer
    # peek must detect TIMESTAMP(NANOS) and set it before the read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        ev = _events(spark, str(d))
        got = sorted(r["ts_us"] for r in ev.select("ts_us").collect())
        assert got == micros
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
