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
