"""Streaming HLL: max-merged per-batch registers must equal the
one-shot batch sketch — the mergeable-state algebra driven through a
REAL stream (maxFilesPerTrigger=1) and through chunked replay with
mid-stream compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from covsonar_spark.operators.sketches import hll_estimate, hll_registers
from covsonar_spark.streaming.sketches import StreamingHll

SF_DIR = "/root/testdata/sf0.01"


def _batch_estimates(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return {(r["grp"], r["hll_est"])
            for r in hll_estimate(
                hll_registers(ev, "event_type", "user_id")).collect()}


def test_chunked_replay_with_compaction_equals_one_shot(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    hll = StreamingHll(spark, str(tmp_path / "state"),
                       group_col="event_type", key_col="user_id",
                       compact_every=2)  # forces a compaction mid-stream
    for i in range(5):
        hll.process_batch(ev.where(F.col("event_id") % 5 == i))
    got = {(r["grp"], r["hll_est"]) for r in hll.estimates().collect()}
    assert got == _batch_estimates(spark) and len(got) > 0


def test_real_stream_drain_equals_one_shot(spark, tmp_path):
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select("event_type", "user_id", "event_id"))
    landing = tmp_path / "landing"
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1) \
          .write.parquet(str(landing / f"chunk{i}"))
    flat = tmp_path / "flat"
    flat.mkdir()
    files = [str(p) for p in sorted(landing.glob("chunk*/part-*.parquet"))]
    for i, p in enumerate(files):
        os.rename(p, flat / f"{i}.parquet")

    hll = StreamingHll(spark, str(tmp_path / "state"),
                       group_col="event_type", key_col="user_id")
    stream = (spark.readStream
              .schema("event_type string, user_id long, event_id long")
              .option("maxFilesPerTrigger", 1).parquet(str(flat)))
    q = hll.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {(r["grp"], r["hll_est"]) for r in hll.estimates().collect()}
    assert got == _batch_estimates(spark) and len(got) > 0


def test_countmin_chunked_replay_equals_one_shot(spark, tmp_path):
    from covsonar_spark.operators.sketches import cm_cells, cm_estimate
    from covsonar_spark.streaming.sketches import StreamingCountMin

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    keys = ev.select(F.col("event_type").alias("key")).distinct()
    cm = StreamingCountMin(spark, str(tmp_path / "state"),
                           key_col="event_type", compact_every=2)
    for i in range(5):
        cm.process_batch(ev.where(F.col("event_id") % 5 == i))
    got = {(r["key"], r["cm_est"])
           for r in cm.estimates(keys).collect()}
    want = {(r["key"], r["cm_est"])
            for r in cm_estimate(cm_cells(ev, "event_type"), keys).collect()}
    assert got == want and len(got) > 0


def test_histogram_chunked_replay_equals_one_shot(spark, tmp_path):
    """SUM-merged fixed-bound histogram cells across 5 micro-batches
    (with a mid-stream compaction) must reproduce the one-shot
    histogram median exactly."""
    from covsonar_spark.operators.sketches import (hist_cells,
                                                   hist_quantile_from_cells)
    from covsonar_spark.streaming.sketches import StreamingHistogram

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    h = StreamingHistogram(spark, str(tmp_path / "state"),
                           group_col="event_type", val_col="value",
                           lo=float(lo), hi=float(hi), compact_every=2)
    for i in range(5):
        h.process_batch(ev.where(F.col("event_id") % 5 == i))
    got = {(r["grp"], r["hist_quantile"])
           for r in h.estimates(p=0.5).collect()}
    one_shot = hist_quantile_from_cells(
        hist_cells(ev, "event_type", "value", float(lo), float(hi)),
        float(lo), float(hi), p=0.5)
    assert got == {(r["grp"], r["hist_quantile"])
                   for r in one_shot.collect()} and len(got) == 5


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    """foreachBatch is at-least-once: redelivering a batch with the
    same batch_id must overwrite its previous write, not SUM twice."""
    from covsonar_spark.streaming.sketches import StreamingCountMin

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cm = StreamingCountMin(spark, str(tmp_path / "state"),
                           key_col="event_type", compact_every=100)
    cm.process_batch(ev, batch_id=0)
    keys = ev.select(F.col("event_type").alias("key")).distinct()
    before = {(r["key"], r["cm_est"]) for r in cm.estimates(keys).collect()}
    cm.process_batch(ev, batch_id=0)          # replay of the SAME batch
    after = {(r["key"], r["cm_est"]) for r in cm.estimates(keys).collect()}
    assert before == after


def test_replay_across_compaction_boundary(spark, tmp_path):
    """At-least-once replay of a batch_id that has already been FOLDED
    into a compacted segment (crash after the compaction-triggering
    process_batch, before checkpoint commit) must be skipped via the
    watermark — not re-appended and SUM-merged twice."""
    from covsonar_spark.streaming.sketches import StreamingCountMin

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cm = StreamingCountMin(spark, str(tmp_path / "state"),
                           key_col="event_type", compact_every=2)
    cm.process_batch(ev.where(F.col("event_id") % 2 == 0), batch_id=0)
    cm.process_batch(ev.where(F.col("event_id") % 2 == 1), batch_id=1)
    # compaction fired at batch 1; both ids are now inside batch=c_1
    keys = ev.select(F.col("event_type").alias("key")).distinct()
    before = {(r["key"], r["cm_est"]) for r in cm.estimates(keys).collect()}
    cm.process_batch(ev.where(F.col("event_id") % 2 == 1), batch_id=1)  # replay
    after = {(r["key"], r["cm_est"]) for r in cm.estimates(keys).collect()}
    assert before == after
    # a fresh object on the same state dir (process restart) also skips
    cm2 = StreamingCountMin(spark, str(tmp_path / "state"),
                            key_col="event_type", compact_every=100)
    cm2.process_batch(ev.where(F.col("event_id") % 2 == 0), batch_id=0)
    again = {(r["key"], r["cm_est"]) for r in cm2.estimates(keys).collect()}
    assert again == before


def test_crash_between_compaction_renames_recovers(spark, tmp_path):
    """Simulate a crash after rename(path -> old) but before
    rename(tmp -> path): the state path is absent, the complete
    compacted copy sits in .compact.tmp — the next read must restore
    it instead of restarting the sketch empty."""
    import shutil

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    hll = StreamingHll(spark, str(tmp_path / "state"),
                       group_col="event_type", key_col="user_id",
                       compact_every=100)
    for i in range(3):
        hll.process_batch(ev.where(F.col("event_id") % 3 == i))
    expect = {(r["grp"], r["hll_est"]) for r in hll.estimates().collect()}
    # manufacture the crash window: state moved aside, tmp holds a copy
    path = hll._path
    shutil.copytree(path, path + ".compact.tmp")
    os.rename(path, path + ".old")
    got = {(r["grp"], r["hll_est"]) for r in hll.estimates().collect()}
    assert got == expect
    assert os.path.isdir(path) and not os.path.isdir(path + ".old")


def test_stale_tmp_does_not_leak_into_next_compaction(spark, tmp_path):
    """A crashed compaction that left .compact.tmp behind (state path
    still intact) must not contribute its stale segment when the next
    compaction runs."""
    import shutil

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from covsonar_spark.streaming.sketches import StreamingCountMin
    cm = StreamingCountMin(spark, str(tmp_path / "state"),
                           key_col="event_type", compact_every=100)
    cm.process_batch(ev, batch_id=0)
    keys = ev.select(F.col("event_type").alias("key")).distinct()
    expect = {(r["key"], r["cm_est"]) for r in cm.estimates(keys).collect()}
    # stale tmp from a hypothetical earlier crashed compaction
    shutil.copytree(cm._path, cm._path + ".compact.tmp")
    cm._compact()
    got = {(r["key"], r["cm_est"]) for r in cm.estimates(keys).collect()}
    assert got == expect


def test_restart_before_first_compaction_does_not_overwrite(spark, tmp_path):
    """A restarted direct caller (batch_id=None) must seed its sequence
    above the existing raw batch dirs, not overwrite batch=0."""
    from covsonar_spark.streaming.sketches import StreamingCountMin

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    keys = ev.select(F.col("event_type").alias("key")).distinct()
    cm = StreamingCountMin(spark, str(tmp_path / "state"),
                           key_col="event_type", compact_every=100)
    cm.process_batch(ev.where(F.col("event_id") % 2 == 0))   # batch=0
    # process restart: fresh object, same state dir, NO compaction yet
    cm2 = StreamingCountMin(spark, str(tmp_path / "state"),
                            key_col="event_type", compact_every=100)
    cm2.process_batch(ev.where(F.col("event_id") % 2 == 1))  # must be batch=1
    got = {(r["key"], r["cm_est"]) for r in cm2.estimates(keys).collect()}
    one_shot = StreamingCountMin(spark, str(tmp_path / "oneshot"),
                                 key_col="event_type", compact_every=100)
    one_shot.process_batch(ev)
    want = {(r["key"], r["cm_est"]) for r in one_shot.estimates(keys).collect()}
    assert got == want
