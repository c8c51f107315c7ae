"""RP-LSH similarity search: correctness of reported scores vs the
exact baseline, planted-duplicate recall, and OR-amplification."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.similarity import (cosine_pairs_exact,
                                                 cosine_self_topk,
                                                 lsh_knn_join, rp_lsh_buckets)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_lsh_scores_match_exact(spark, emb):
    """Every pair the LSH join reports carries the exact cosine."""
    small = emb.limit(80)
    got = lsh_knn_join(small, k=3, n_planes=4, n_tables=2).collect()
    assert got, "expected some candidate pairs"
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in cosine_pairs_exact(small, threshold=-1.0).collect()}
    for r in got:
        a, b = sorted((r["id_a"], r["id_b"]))
        assert abs(exact[(a, b)] - r["cosine"]) < 1e-9


def test_planted_duplicate_always_found(spark, emb):
    """A scaled copy (cosine = 1) lands in the same bucket in every
    table, so the knn-join must always recover it as rank 1."""
    one = emb.limit(1).select(
        F.lit(999999).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.05)).alias("embedding"),
        F.col("label"))
    planted = emb.unionByName(one)
    got = {r["id_b"]: r for r in
           lsh_knn_join(planted, k=1, n_planes=8, n_tables=1).where(
               F.col("id_a") == 999999).collect()}
    assert len(got) == 1
    (hit,) = got.values()
    assert hit["cosine"] == pytest.approx(1.0, abs=1e-3)


def test_or_amplification_monotone_recall(spark, emb):
    """More tables → candidate set can only grow (OR-amplification)."""
    small = emb.limit(120)
    def cands(nt):
        return {(r["id_a"], r["id_b"]) for r in
                rp_lsh_buckets(small, n_planes=6, n_tables=nt)
                .select(F.col("vec_id").alias("id_a"), "table", "bucket")
                .join(rp_lsh_buckets(small, n_planes=6, n_tables=nt)
                      .select(F.col("vec_id").alias("id_b"), "table", "bucket"),
                      ["table", "bucket"])
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct().collect()}
    c1, c4 = cands(1), cands(4)
    assert c1 <= c4
    assert len(c4) > len(c1)


def test_self_topk_matches_exact(spark, emb):
    """Brute-force self top-k agrees with the exact pair table."""
    target = emb.select(F.min("vec_id")).collect()[0][0]
    got = cosine_self_topk(emb, target, k=5).collect()
    exact = cosine_pairs_exact(emb, threshold=-1.0)
    exact_best = (
        exact.where((F.col("id_a") == target) | (F.col("id_b") == target))
        .select(F.when(F.col("id_a") == target, F.col("id_b"))
                 .otherwise(F.col("id_a")).alias("other"), "cosine")
        .orderBy(F.col("cosine").desc(), F.col("other").asc()).limit(5).collect())
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
        [(r["other"], r["cosine"]) for r in exact_best]


def test_pq_topk_rerank_recall(spark):
    """PQ with exact re-rank: the top-10 must substantially overlap the
    brute-force exact top-10 (on iid random vectors the measured
    pool=100 recall is 0.8 — assert a safe floor), and the returned
    rows must be ordered by the exact re-rank distance."""
    from covsonar_spark.operators.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = pq_topk(emb, query_id=0, k_top=10).collect()
    assert len(rows) == 10
    ys = [r["exact_d2"] for r in rows]
    assert ys == sorted(ys)
    import numpy as np
    data = {r["vec_id"]: np.array(list(r["embedding"]), dtype=float)
            for r in emb.collect()}
    q = data[0]
    exact_top = [i for _, i in sorted(
        (float(((v - q) ** 2).sum()), i) for i, v in data.items() if i != 0)][:10]
    overlap = len(set(exact_top) & {r["vec_id"] for r in rows})
    assert overlap >= 6


def test_grid_pairs_match_broadcast(spark, emb):
    """The block-partitioned grid path (the 100 TB exact all-pairs
    fallback) emits exactly the broadcast path's pair set, each pair
    once, with bit-identical cosines."""
    bcast = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in cosine_pairs_exact(emb, 0.2, mode="broadcast").collect()}
    grid_rows = cosine_pairs_exact(emb, 0.2, mode="grid", n_blocks=7).collect()
    grid = {(r["id_a"], r["id_b"]): r["cosine"] for r in grid_rows}
    assert len(grid_rows) == len(grid), "grid emitted a duplicate pair"
    assert grid == bcast


def test_grid_pairs_canonical_order(spark, emb):
    """Cross-block pairs are normalized to id_a < id_b."""
    rows = cosine_pairs_exact(emb.limit(60), 0.0, mode="grid",
                              n_blocks=5).collect()
    assert rows and all(r["id_a"] < r["id_b"] for r in rows)


def test_auto_mode_selects_broadcast_locally(spark, emb):
    """Below GRID_ROW_THRESHOLD auto == broadcast (plan equality by
    result: same pairs)."""
    auto = {(r["id_a"], r["id_b"]) for r in
            cosine_pairs_exact(emb, 0.3).collect()}
    bc = {(r["id_a"], r["id_b"]) for r in
          cosine_pairs_exact(emb, 0.3, mode="broadcast").collect()}
    assert auto == bc


def test_lsh_knn_rerank_has_no_corpus_collect(spark, emb):
    """The rerank path must be join-shaped: calling lsh_knn_join on a
    corpus must not materialize the vector table on the driver.  Proxy
    check: results stay correct when the plan runs, and the candidate
    join carries only ids (schema probe)."""
    out = lsh_knn_join(emb.limit(50), k=2, n_planes=4, n_tables=2)
    assert set(out.columns) == {"id_a", "id_b", "cosine", "rank"}
    rows = out.collect()
    assert rows and all(r["rank"] <= 2 for r in rows)


def test_lsh_knn_join_mode_matches_broadcast(spark, emb):
    """The scale-safe join rerank and the size-gated broadcast rerank
    return identical (id_a, id_b, cosine, rank) sets."""
    a = {tuple(r) for r in
         lsh_knn_join(emb, k=3, n_planes=5, n_tables=2,
                      rerank="broadcast").collect()}
    b = {tuple(r) for r in
         lsh_knn_join(emb, k=3, n_planes=5, n_tables=2,
                      rerank="join").collect()}
    assert a and a == b


def test_lsh_knn_max_bucket_preserves_recall(spark, emb):
    """The max_bucket cap splits hot buckets into salted sub-block
    grid cells instead of dropping them: results with ANY cap equal
    the uncapped run — a pair whose only collision is a degenerate
    bucket is still found."""
    uncapped = {tuple(r) for r in
                lsh_knn_join(emb, k=2, n_planes=4).collect()}
    assert uncapped
    for cap in (1, 7, 10**6):
        capped = {tuple(r) for r in
                  lsh_knn_join(emb, k=2, n_planes=4,
                               max_bucket=cap).collect()}
        assert capped == uncapped, f"cap={cap} changed the result"


def test_lsh_knn_max_bucket_planted_pair_in_hot_bucket(spark):
    """Adversarial: EVERY vector collides in one degenerate bucket
    (n_planes=1 and all vectors on the same side of the hyperplane via
    duplicated embeddings); with a cap far below the bucket size the
    planted exact duplicate must still surface as its copy's rank-1
    neighbour."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    copy = base.limit(1).select(
        (F.col("vec_id") + 10**6).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.1)).alias("embedding"),
        F.col("label"))
    planted = base.unionByName(copy)
    rows = (lsh_knn_join(planted, k=1, n_planes=1, n_tables=1, max_bucket=4)
            .where(F.col("id_a") == 10**6).collect())
    assert len(rows) == 1 and rows[0]["cosine"] == pytest.approx(1.0, abs=1e-3)


def test_knn_bcast_threshold_sizing():
    """The broadcast-rerank row threshold is derived from the float64
    bytes the rerank actually materializes (8 B/dim matrix + 8 B id):
    threshold rows must fill but never exceed KNN_BCAST_MAX_BYTES."""
    from covsonar_spark.operators.similarity import (KNN_BCAST_MAX_BYTES,
                                                     knn_bcast_row_threshold)
    for dim in (16, 64, 768):
        rows = knn_bcast_row_threshold(dim)
        per_row = dim * 8 + 8
        assert rows * per_row <= KNN_BCAST_MAX_BYTES < (rows + 1) * per_row
    # the 64-dim default lands near 256k rows — half the old 500k flat
    # cap whose comment assumed float32
    assert 250_000 < knn_bcast_row_threshold(64) < 265_000


def test_grid_auto_blocks_scale_with_corpus(spark):
    """auto-mode grid on a corpus above the threshold still matches the
    forced broadcast result (n_blocks auto-derived)."""
    from covsonar_spark.operators import similarity as S
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    big = emb
    for i in range(2):  # 500 -> 2000 rows via shifted ids
        big = big.unionByName(
            emb.select((F.col("vec_id") + 10**6 * (i + 1)).alias("vec_id"),
                       "embedding", "label"))
    old = S.GRID_ROW_THRESHOLD
    S.GRID_ROW_THRESHOLD = 100
    try:
        auto = {(r["id_a"], r["id_b"]) for r in
                S.cosine_pairs_exact(big, 0.5).collect()}
    finally:
        S.GRID_ROW_THRESHOLD = old
    bc = {(r["id_a"], r["id_b"]) for r in
          S.cosine_pairs_exact(big, 0.5, mode="broadcast").collect()}
    assert auto == bc and auto


def test_auto_n_planes_occupancy_stable():
    """n_planes=None resolves to the occupancy-stable plane count:
    ceil(log2(n / 32)) clamped to [4, 24] — so expected bucket size
    stays ~LSH_TARGET_BUCKET as n grows (linear candidate volume),
    instead of the quadratic growth a fixed plane count gives."""
    from covsonar_spark.operators.similarity import (LSH_TARGET_BUCKET,
                                                     auto_n_planes)

    assert LSH_TARGET_BUCKET == 32
    assert auto_n_planes(0) == 4          # degenerate: clamp floor
    assert auto_n_planes(1_000) == 5      # ceil(log2(31.25))
    assert auto_n_planes(20_000) == 10    # ceil(log2(625))
    assert auto_n_planes(1_000_000) == 15
    assert auto_n_planes(10**12) == 24    # clamp ceiling
    # occupancy n/2^p stays within [target/2, target] off clamp edges
    for n in (10_000, 123_456, 5_000_000):
        p = auto_n_planes(n)
        assert LSH_TARGET_BUCKET / 2 <= n / 2 ** p <= LSH_TARGET_BUCKET


def test_auto_planes_mode_recorded(spark, emb):
    """lsh_knn_join(n_planes=None) takes the auto path, records the
    chosen plane count, and still reports exact cosines."""
    from covsonar_spark.metrics import MODE_CHOICES
    from covsonar_spark.operators.similarity import auto_n_planes

    small = emb.limit(100)
    got = lsh_knn_join(small, k=2, n_planes=None, n_tables=2,
                       n_rows=100).collect()
    assert MODE_CHOICES["lsh_knn_planes"] == str(auto_n_planes(100))
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in cosine_pairs_exact(small, threshold=-1.0).collect()}
    for r in got:
        a, b = sorted((r["id_a"], r["id_b"]))
        assert abs(exact[(a, b)] - r["cosine"]) < 1e-9
