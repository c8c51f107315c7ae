"""Multimodal plumbing: schema, determinism, fan-out shape, partition
behavior — the decode kernels are stubbed, the Spark contracts are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.multimodal import (MEDIA_SCHEMA, audio_features,
                                                 image_features, sample_frames)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    kinds = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                         (F.col("doc_id") % 3 + 1).cast("int"))
    df = docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            (F.col("doc_id") % 5000 + 500).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    out = spark.createDataFrame(df.collect(), MEDIA_SCHEMA).repartition(4).cache()
    out.count()
    return out


def test_media_schema_roundtrip(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.rdd.getNumPartitions() == 4


def test_image_features_schema_and_determinism(media):
    feats = image_features(media)
    assert feats.columns == ["media_id", "width", "height", "features"]
    rows1 = {r["media_id"]: r for r in feats.collect()}
    rows2 = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(rows1) == media.where("kind = 'image'").count()
    for mid, r in rows1.items():
        assert len(r["features"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["features"])
        assert r["features"] == rows2[mid]["features"]  # deterministic
        assert 1 <= r["width"] <= 640


def test_frame_sampling_fanout(media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    vids = {r["media_id"]: r for r in
            media.where("kind = 'video'").select("media_id", "meta").collect()}
    assert {r["media_id"] for r in rows} == set(vids)
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_id.items():
        dur = vids[mid]["meta"]["duration_ms"]
        want = len(range(0, max(dur, 1), 1000))
        assert len(rs) == want
        assert sorted(r["frame_idx"] for r in rs) == list(range(want))
        assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rs)


def test_audio_windows(media):
    rows = audio_features(media, n_windows=4).collect()
    n_audio = media.where("kind = 'audio'").count()
    assert len(rows) == 4 * n_audio
    assert all(len(r["features"]) == 8 for r in rows)


def test_content_pruned_when_not_needed(media):
    """Column pruning: a metadata-only projection must not carry the
    payload column through the plan."""
    pruned = media.select("media_id", "kind")
    assert "content" not in pruned.columns
    assert "content" not in pruned._jdf.queryExecution().optimizedPlan().schema().treeString()


def test_media_from_documents_contract(spark):
    """The oracle-checked fixture builder: schema matches MEDIA_SCHEMA
    modulo nullability, payload is the exact utf-8 bytes, metadata is
    typed per kind."""
    from covsonar_spark.operators.multimodal import media_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields]
    rows = {r["media_id"]: r for r in media.collect()}
    docs_rows = {r["doc_id"]: r for r in docs.collect()}
    for mid, r in rows.items():
        assert bytes(r["content"]) == docs_rows[mid]["text"].encode()
        if r["kind"] == "image":
            assert r["meta"]["duration_ms"] is None
            assert r["meta"]["width"] is not None
        else:
            assert r["meta"]["duration_ms"] == ((mid % 7) + 1) * 1500
            assert r["meta"]["width"] is None
