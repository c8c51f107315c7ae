"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single map + TakeOrdered (no
shuffle of the full table; Spark's ``orderBy().limit(k)`` compiles to a
per-partition top-k and a k-row final merge, which is exactly the right
plan at 100 TB: the full similarity column never materializes).

Scale path: random-hyperplane (sign) LSH — deterministic hyperplanes
derived from md5 so results are reproducible across runs and engines;
bucketed equi-join replaces the cross join for knn-joins.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from covsonar_spark.functions import vectors as V


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query vector is a plan literal (broadcast by construction); the
    scan computes one fused zip_with/aggregate per row inside codegen.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = V.cosine_rounded(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_self_topk(df: DataFrame, target_id: int, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Top-k nearest neighbours of one row of the table itself (the query
    vector is looked up, then broadcast-joined — no driver collect)."""
    target = df.where(F.col(id_col) == target_id).select(F.col(vec_col).alias("q"))
    joined = df.where(F.col(id_col) != target_id).crossJoin(F.broadcast(target))
    sim = V.cosine_rounded(F.col(vec_col), F.col("q"))
    return (
        joined.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _deterministic_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplanes derived from md5 — stable across runs/engines, no RNG."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(0, dim, 16):
            digest = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
            row.extend(1.0 if byte & 1 else -1.0 for byte in digest)
        planes.append(row[:dim])
    return planes


def rp_lsh_buckets(df: DataFrame, n_planes: int = 8, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit p = sign(v·h_p).

    Vectors in the same bucket are cosine-similar with high probability;
    a knn-join then shuffles on the bucket id instead of cross-joining.
    """
    planes = _deterministic_hyperplanes(n_planes, dim=64)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        h = F.array(*[F.lit(x) for x in plane])
        bit = F.when(V.dot(F.col(vec_col), h) >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_knn_join(df: DataFrame, k: int = 5, n_planes: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate all-pairs knn: bucket by RP-LSH, rank within bucket.

    Output: (id_a, id_b, cosine, rank) with rank ≤ k per id_a within its
    bucket.  Probes only same-bucket pairs — the 100 TB-safe shape
    (equi-shuffle on bucket, per-bucket pair enumeration).
    """
    from pyspark.sql import Window

    b = rp_lsh_buckets(df, n_planes, vec_col, id_col)
    a_side = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b_side = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a_side.join(b_side, "bucket").where(F.col("id_a") != F.col("id_b"))
    sim = V.cosine_rounded(F.col("va"), F.col("vb"))
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return (
        pairs.select("id_a", "id_b", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
