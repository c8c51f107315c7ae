"""Salted triangular sub-block pair grid — the shared skew-bounding
kernel behind every "hot bucket" cap in the engine.

Problem shape: rows grouped by a key (LSH bucket, shingle posting
list, IVF cell) must produce all within-key pairs, but a degenerate
key with f members makes one task hold f rows and emit f² pairs.
Scheme (same as ``similarity._cosine_pairs_grid``): split each key's
membership into s = ceil(f / cap) sub-blocks by a salted hash of the
id (independent of the key's own hash), replicate each member to the
triangular grid of sub-block cells — as the A side of cells
(blk, j ≥ blk) and the B side of cells (i < blk, blk) — and emit each
cell's A×B.  Every unordered pair still meets in EXACTLY one cell of
its key (diagonal cells keep the id-ordered triangle; a cross cell
holds each pair once by construction), so the cap bounds per-task
state WITHOUT losing pairs or changing multiplicities.  Cold keys
(s = 1) collapse to a single diagonal cell — the uncapped plan.

Cost: one extra shuffle (the per-key window count) plus replication
factor (s+1)/2 on hot-key rows only.  Measured on an adversarial
corpus (20k vectors, 3k sharing ONE LSH bucket → 9M raw pairs from
that bucket): capped(500) 23.4 s vs uncapped 30.1 s on local[32],
identical results — the grid also PARALLELIZES the hot key's pair
explosion across cells instead of one giant task.

Consumers: ``operators/similarity.lsh_knn_join`` (``max_bucket``,
directed-pair output) and ``operators/dedup.ngram_jaccard_pairs``
(``max_shingle_df``, one row per pair per shared shingle with set
sizes — exact |A∩B| counting, not candidate generation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_grid_pairs(df: DataFrame, key_cols: list[str], id_col: str,
                     extra_cols: list[str], cap: int,
                     salt: str = "pair-grid-salt") -> DataFrame:
    """All within-key pairs of ``df``'s rows, each unordered pair
    exactly once per key value, with per-task state bounded by ~cap.

    Returns (key_cols…, x, y) where x/y are structs carrying ``pid``
    (the id) plus ``extra_cols``.  Diagonal cells guarantee
    x.pid < y.pid; cross cells emit each pair once in arbitrary
    orientation — normalize with ``least``/``greatest`` (or emit both
    orders) in the caller.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    s = F.greatest(
        F.lit(1), F.ceil(F.count(F.lit(1)).over(w) / F.lit(cap))).cast("int")
    base = (df.select(*key_cols, F.col(id_col).alias("_id"), *extra_cols)
            .withColumn("_s", s)
            .withColumn("_blk", F.pmod(
                F.xxhash64(F.lit(salt), F.col("_id")),
                F.col("_s")).cast("int")))
    post = F.struct(F.col("_id").alias("pid"),
                    *[F.col(c) for c in extra_cols])
    side_a = base.select(
        *key_cols, "_id", *extra_cols, F.col("_blk").alias("ci"),
        F.explode(F.sequence(F.col("_blk"), F.col("_s") - 1)).alias("cj"),
        F.lit(0).alias("role"))
    side_b = base.where(F.col("_blk") > 0).select(
        *key_cols, "_id", *extra_cols,
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("ci"),
        F.col("_blk").alias("cj"), F.lit(1).alias("role"))
    grouped = (side_a.unionByName(side_b)
               .groupBy(*key_cols, "ci", "cj")
               .agg(F.collect_list(F.when(F.col("role") == 0, post))
                    .alias("pa"),
                    F.collect_list(F.when(F.col("role") == 1, post))
                    .alias("pb")))
    diag = (grouped.where(F.col("ci") == F.col("cj"))
            .select(*key_cols, F.explode("pa").alias("x"), "pa")
            .select(*key_cols, "x", F.explode("pa").alias("y"))
            .where(F.col("x.pid") < F.col("y.pid")))
    offd = (grouped.where(F.col("ci") != F.col("cj"))
            .select(*key_cols, F.explode("pa").alias("x"), "pb")
            .select(*key_cols, "x", F.explode("pb").alias("y")))
    return diag.unionByName(offd)
