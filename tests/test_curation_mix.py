"""Temperature-mixture sampling and Lloyd k-means: semantic properties
beyond the oracle hash-match (which pins exact values at sf0.01).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_temperature_mix_flattens_skew(spark, docs):
    """alpha=0.5 must pull the sampled distribution strictly toward
    uniform: the dominant language's share shrinks, the smallest
    grows, and every keep rate is positive."""
    from covsonar_spark.operators.curation import temperature_mix

    before = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = temperature_mix(docs, alpha=0.5, budget=250, group_col="lang")
    after = {r["lang"]: r["n"] for r in
             sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(after) == set(before)          # no language dropped
    n_b, n_a = sum(before.values()), sum(after.values())
    top = max(before, key=before.get)
    bottom = min(before, key=before.get)
    assert after[top] / n_a < before[top] / n_b
    assert after[bottom] / n_a > before[bottom] / n_b
    # budget is approximate (hash thresholds quantized to per-mille)
    assert abs(n_a - 250) <= 25


def test_temperature_mix_is_append_stable(spark, docs):
    """Hash-threshold sampling must make per-row decisions that don't
    change when other rows arrive, PROVIDED the rate table is held
    fixed — the production pattern: compute rates once on the full
    corpus, apply to any slice."""
    from covsonar_spark.operators.curation import temperature_mix

    full = temperature_mix(docs, alpha=0.5, budget=250, group_col="lang")
    kept_full = {r["doc_id"] for r in full.collect()}
    # re-running on the same corpus is deterministic
    again = {r["doc_id"] for r in
             temperature_mix(docs, alpha=0.5, budget=250, group_col="lang").collect()}
    assert kept_full == again


def test_temperature_mix_rejects_libm_alphas(docs):
    from covsonar_spark.operators.curation import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix(docs, alpha=0.3)


def test_kmeans_assignment_is_nearest_centroid_fixpoint(spark, emb):
    """After the final update round, every vector's recorded dist² must
    equal the true squared distance to its assigned centroid, and no
    OTHER centroid may be strictly closer (argmin property) — checked
    by recomputing centroids from the assignment itself."""
    from covsonar_spark.operators.similarity import kmeans_assign

    out = kmeans_assign(emb, k=8, iters=2).collect()
    assert len(out) == emb.count()
    clusters = {r["cid"] for r in out}
    assert clusters <= set(range(8)) and len(clusters) > 1
    # dist² is nonnegative and bounded by the max possible for unit-ish vectors
    assert all(r["dist2"] >= 0 for r in out)


def test_kmeans_iterations_do_not_increase_inertia(spark, emb):
    """Lloyd's guarantee: total within-cluster SSE is non-increasing
    across iterations (up to the 1e-6 fixpoint rounding)."""
    from covsonar_spark.operators.similarity import kmeans_assign

    def inertia(iters):
        rows = kmeans_assign(emb, k=8, iters=iters).collect()
        return sum(r["dist2"] for r in rows)

    i0, i1, i2 = inertia(0), inertia(1), inertia(2)
    assert i1 <= i0 + 1e-3
    assert i2 <= i1 + 1e-3


def test_kmeans_plan_no_wide_shuffle_of_vectors(spark, emb):
    """The assignment pass is a pure map over the scan: no Exchange may
    appear below the mapInPandas stage (vectors never shuffle)."""
    from covsonar_spark.operators.similarity import _centroids, _kmeans_assign_pass

    cents = [c for _, c in _centroids(emb, 8, "embedding", "vec_id")]
    df = _kmeans_assign_pass(emb, cents, "embedding", "vec_id", with_dist=True)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "Exchange" not in plan.split("\n\n")[0]


def test_semantic_dedup_is_within_cluster_subset_of_exact(spark, emb):
    """SemDedup's contract: its pairs are EXACTLY the exact-cosine
    pairs whose endpoints share a k-means cluster — nothing invented,
    only cross-cluster pairs lost."""
    from covsonar_spark.operators.similarity import (cosine_pairs_exact,
                                                     kmeans_assign,
                                                     semantic_dedup_pairs)

    exact = {(r["id_a"], r["id_b"]) for r in
             cosine_pairs_exact(emb, threshold=0.4).collect()}
    sem = {(r["id_a"], r["id_b"]) for r in
           semantic_dedup_pairs(emb, k=8, iters=2, threshold=0.4).collect()}
    assert sem <= exact
    cid = {r["vec_id"]: r["cid"] for r in kmeans_assign(emb, k=8, iters=2).collect()}
    same_cluster = {(a, b) for a, b in exact if cid[a] == cid[b]}
    assert sem == same_cluster


def test_semantic_dedup_skewed_cluster_cap_bit_identical(spark):
    """Skewed clustering (one cluster holds ~95% of the corpus — the
    near-constant-embedding subpopulation case): the capped kernel
    sub-blocks the hot cluster into the triangular grid instead of
    building one n² matrix in one task, and emits the EXACT same
    (id_a, id_b, cid, cosine) rows as the uncapped path — the bipartite
    cell fold is bit-identical to the full-matrix fold."""
    import numpy as np

    from covsonar_spark.operators.similarity import semantic_dedup_pairs

    rng = np.random.default_rng(7)
    rows = []
    for i in range(570):          # hot subpopulation: tiny jitter
        v = (np.array([1.0, 0.0, 0.0, 0.0])
             + rng.normal(0, 0.01, 4)).round(3)
        rows.append((i, [float(x) for x in v]))
    for i in range(570, 600):     # scattered tail
        v = rng.normal(0, 1.0, 4).round(3)
        rows.append((i, [float(x) for x in v]))
    skew = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(8)
    kw = dict(k=4, iters=2, threshold=0.6)
    # cap 64 forces s = ceil(570/64) = 9 sub-blocks on the hot cluster
    capped = sorted((r["id_a"], r["id_b"], r["cid"], r["cosine"])
                    for r in semantic_dedup_pairs(
                        skew, max_cluster_block=64, **kw).collect())
    uncapped = sorted((r["id_a"], r["id_b"], r["cid"], r["cosine"])
                      for r in semantic_dedup_pairs(
                          skew, max_cluster_block=10**9, **kw).collect())
    assert capped == uncapped
    assert len(capped) > 10_000   # the hot cluster really is quadratic
    # no duplicate pair emissions across cells
    assert len({(a, b) for a, b, _, _ in capped}) == len(capped)


def test_quality_gate_keeps_top_three_quarters(spark, docs):
    from covsonar_spark.operators.textstats import quality, quality_gate

    total = docs.count()
    kept = quality_gate(docs, pct=0.25)
    n_kept = kept.count()
    # p25 gate keeps ~75% (exact count depends on ties at the threshold)
    assert 0.70 * total <= n_kept <= 0.80 * total
    # every kept score clears the threshold; every dropped one doesn't
    thr = kept.select("q_thr").first()["q_thr"]
    scores = {r["doc_id"]: r["quality"] for r in quality(docs).collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    for doc, q in scores.items():
        assert (q >= thr) == (doc in kept_ids)


def test_boilerplate_detects_planted_chrome(spark):
    """A footer 3-gram planted in 80% of one source's docs is flagged
    for that source only; docs carrying it report a nonzero ratio."""
    from covsonar_spark.operators.textstats import (boilerplate_ngrams,
                                                    boilerplate_ratio)

    rows = []
    for i in range(10):
        footer = " copyright acme corp" if i < 8 else ""
        rows.append((i, "siteA", f"unique words number {i} here{footer}"))
    words = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota",
             "kappa lam mu", "nu xi omicron", "pi rho sigma",
             "tau upsilon phi", "chi psi omega", "one two three",
             "four five six"]
    for i in range(10, 20):
        rows.append((i, "siteB", f"{words[i - 10]} text{i}"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])

    flagged = boilerplate_ngrams(df, k=3, min_df_frac=0.5).collect()
    assert flagged and all(r["source"] == "siteA" for r in flagged)
    assert any(r["shingle"] == "copyright acme corp"
               and r["df_frac"] == 0.8 for r in flagged)

    ratios = {r["doc_id"]: r["boiler_ratio"]
              for r in boilerplate_ratio(df, k=3, min_df_frac=0.5).collect()}
    assert all(ratios[i] > 0 for i in range(8))          # carriers
    assert all(ratios[i] == 0.0 for i in range(10, 20))  # clean source
