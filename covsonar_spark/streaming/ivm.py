"""Streaming join-view maintenance: keep V = A ⋈ B current while A
arrives as micro-batches (the fact stream) against a slowly-changing
dimension B — the streaming face of ``operators/ivm.join_delta``.

State layout mirrors the log-structured sketch store
(streaming/sketches.py): each micro-batch APPENDS its delta rows into
a ``batch=<id>`` subdirectory with overwrite semantics, so
foreachBatch's at-least-once replay rewrites rather than duplicates a
batch.  The stored view is the union of the parquet log — no merge
function needed because an inner-join view under inserts is purely
additive (ΔV = ΔA ⋈ B; use the retraction-counted form in
operators/ivm.py when deletes matter).

Dimension updates use the other half of the differential rule: a ΔB
batch joins the FULL replayed fact log (A_old ⋈ ΔB) — delta-sized on
the dimension side, and the fact log never re-joins itself.

Scale notes: per micro-batch work is |ΔA| ⋈ B — Catalyst broadcasts a
small delta or shuffles on the key, never touching the accumulated
view; reading the view is a parquet scan of delta-sized files, exactly
the layout a compaction job (store.optimize pattern) periodically
rewrites into right-sized files.

Reference note: the reference has no streaming surface; this is
beyond-reference capability (SURVEY §2.8) composing its ingest-append
pattern with the IVM algebra.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StreamingJoinView:
    """Maintains V = fact ⋈ dim over fact micro-batches (inserts)."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 dim: DataFrame, on: list[str]) -> None:
        self.spark = spark
        self._view_path = os.path.join(state_dir, "view")
        self._fact_path = os.path.join(state_dir, "fact")
        self.dim = dim
        self.on = on
        self._seq = 0

    def process_batch(self, delta_fact: DataFrame,
                      batch_id: int | None = None) -> None:
        """ΔV = ΔA ⋈ B appended under ``batch=<id>`` (idempotent under
        replay); the raw ΔA is logged too so later dimension updates
        can join the accumulated fact."""
        if batch_id is None:
            batch_id = self._seq
            self._seq += 1
        (delta_fact.join(self.dim, self.on)
         .write.mode("overwrite")
         .parquet(os.path.join(self._view_path, f"batch={batch_id}")))
        (delta_fact.write.mode("overwrite")
         .parquet(os.path.join(self._fact_path, f"batch={batch_id}")))

    def update_dim(self, delta_dim: DataFrame, tag: str) -> None:
        """Dimension insert: ΔV = A_old ⋈ ΔB (delta-sized on the dim
        side).  The new dim rows also extend ``self.dim`` for later
        fact batches."""
        fact = self.spark.read.parquet(self._fact_path).drop("batch")
        (fact.join(delta_dim, self.on)
         .write.mode("overwrite")
         .parquet(os.path.join(self._view_path, f"batch=dim_{tag}")))
        self.dim = self.dim.unionByName(delta_dim)

    def view(self) -> DataFrame:
        """The maintained join view (union of the delta log)."""
        return self.spark.read.parquet(self._view_path).drop("batch")

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """foreachBatch sink for a real fact stream."""
        return (stream_df.writeStream
                .foreachBatch(lambda bdf, bid: self.process_batch(bdf, bid))
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True)
                .start())
