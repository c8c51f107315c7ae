"""Data-quality audit, snapshot diff (CDC), normalized dedup, and HLL
set-ops — crafted-data behavior tests (the sf0.01 oracle sweep checks
the registry twins; these pin the semantics on inputs that actually
contain violations / reformatted copies / partial overlaps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covsonar_spark.operators.dedup import normalized_duplicates
from covsonar_spark.operators.quality import dq_audit, snapshot_diff


def test_dq_audit_counts_each_violation_class(spark):
    orders = spark.createDataFrame(
        [
            # (key, custkey, status, price, date)
            (1, 10, "O", 5.0, "2024-01-01"),
            (1, 10, "O", 5.0, "2024-01-02"),   # duplicate PK
            (2, 99, "F", 7.0, "2024-01-03"),   # orphan custkey
            (3, 10, "Z", 7.0, "2024-01-04"),   # bad status
            (4, 11, "P", -1.0, None),           # bad price + null date
            (5, 11, "P", 0.0, "2024-01-05"),   # zero price is a violation
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    customer = spark.createDataFrame(
        [(10,), (11,)], "c_custkey long")

    got = {r["rule"]: (r["violations"], r["rows_checked"], r["ok"])
           for r in dq_audit(orders, customer).collect()}
    assert got == {
        "pk_unique_o_orderkey": (1, 6, False),
        "fk_orders_customer": (1, 6, False),
        "not_null_o_orderdate": (1, 6, False),
        "domain_o_orderstatus": (1, 6, False),
        "range_o_totalprice_positive": (2, 6, False),
    }


def test_dq_audit_clean_table_all_ok(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O", 5.0, "2024-01-01")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    rows = dq_audit(orders, customer).collect()
    assert len(rows) == 5 and all(r["ok"] and r["violations"] == 0 for r in rows)


def test_snapshot_diff_classifies_added_removed_changed(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", None)],
        "k long, s string, t string")
    new = spark.createDataFrame(
        [(2, "b", "y"), (3, "CHANGED", None), (4, "d", "z")],
        "k long, s string, t string")
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k", ("s", "t")).collect()}
    # key 2 is unchanged → absent; null-safe compare keeps 3's t=None equal
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_normalized_dedup_catches_reformatted_copies(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello, World!  The   quick fox."),
            (2, "hello world the quick fox"),      # same after canon
            (3, "HELLO WORLD: the quick fox"),     # same after canon
            (4, "a different document entirely"),
            (5, "the quick fox hello world"),      # same words, other ORDER
        ],
        "doc_id long, text string")
    rows = normalized_duplicates(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    # word order is preserved by canonicalization → doc 5 stays distinct
    assert (r["keep_id"], r["n_copies"], r["n_raw_variants"]) == (1, 3, 3)


def test_hll_setops_inclusion_exclusion_consistent(spark):
    from covsonar_spark.operators.sketches import sketch_hll_setops

    out = {r["set_expr"]: r for r in
           sketch_hll_setops(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"A", "B", "A_union_B", "A_intersect_B"}
    # the estimate identity holds by construction
    assert abs(out["A"]["hll_est"] + out["B"]["hll_est"]
               - out["A_union_B"]["hll_est"]
               - out["A_intersect_B"]["hll_est"]) < 1e-6
    # exact set algebra sanity on the same data
    assert (out["A_union_B"]["exact_distinct"]
            == out["A"]["exact_distinct"] + out["B"]["exact_distinct"]
            - out["A_intersect_B"]["exact_distinct"])


def test_leakage_safe_split_keeps_clusters_together(spark):
    """No near-dup cluster may straddle train/val/test, and the split
    has all three classes on the sf0.001 corpus."""
    from covsonar_spark.operators.curation import leakage_safe_split
    from covsonar_spark.operators.dedup import duplicate_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    clusters = duplicate_clusters(docs, threshold=0.5)
    out = leakage_safe_split(docs, clusters)
    splits_per_cluster = (out.groupBy("group_key")
                          .agg({"split": "approx_count_distinct"})
                          .collect())
    assert all(r[1] == 1 for r in splits_per_cluster)
    classes = {r["split"] for r in out.select("split").distinct().collect()}
    assert classes == {"train", "val", "test"}
    # every document is assigned exactly once
    assert out.count() == docs.count()


def test_histogram_quantile_close_to_exact(spark):
    """The 64-bin histogram median must land within one bin width of
    the exact median for every group."""
    from covsonar_spark.operators.sketches import sketch_histogram_quantile

    rows = sketch_histogram_quantile(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    spread = (max(r["exact_p50"] for r in rows)
              - min(r["exact_p50"] for r in rows))
    for r in rows:
        assert abs(r["hist_p50"] - r["exact_p50"]) < max(spread, 1.0)


def test_priority_sample_reproducible_and_weight_biased(spark):
    from covsonar_spark.operators.curation import priority_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [r["doc_id"] for r in priority_sample(docs, "n_chars", k=50).collect()]
    b = [r["doc_id"] for r in priority_sample(docs, "n_chars", k=50).collect()]
    assert a == b                      # deterministic, stable across runs
    sampled_mean = (docs.where(F.col("doc_id").isin(a))
                    .agg(F.avg("n_chars")).first()[0])
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sampled_mean > corpus_mean  # weight-proportional inclusion


def test_snapshot_diff_algebra(spark):
    """Laws that hold for ANY pair of snapshots: self-diff is empty;
    swapping snapshots swaps added/removed and keeps changed; the
    class counts reconcile the two snapshot sizes."""
    import random

    rng = random.Random(99)
    rows_old, rows_new = [], []
    for k in range(200):
        in_old, in_new = rng.random() < 0.8, rng.random() < 0.8
        v_old = rng.choice("abc")
        v_new = v_old if rng.random() < 0.7 else rng.choice("xyz")
        if in_old:
            rows_old.append((k, v_old))
        if in_new:
            rows_new.append((k, v_new))
    old = spark.createDataFrame(rows_old, "k long, s string")
    new = spark.createDataFrame(rows_new, "k long, s string")

    assert snapshot_diff(old, old, "k", ("s",)).count() == 0

    fwd = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k", ("s",)).collect()}
    bwd = {r["k"]: r["change_type"]
           for r in snapshot_diff(new, old, "k", ("s",)).collect()}
    flip = {"added": "removed", "removed": "added", "changed": "changed"}
    assert bwd == {k: flip[v] for k, v in fwd.items()}

    n_added = sum(1 for v in fwd.values() if v == "added")
    n_removed = sum(1 for v in fwd.values() if v == "removed")
    assert len(rows_new) == len(rows_old) - n_removed + n_added


def test_pq_topk_tiny_corpus(spark):
    """Corpora smaller than the codebook size shrink the codebook
    instead of crashing."""
    from pyspark.sql import functions as F

    from covsonar_spark.operators.similarity import pq_topk

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .where(F.col("vec_id") < 7))
    rows = pq_topk(emb, query_id=0, k_top=10).collect()
    assert len(rows) == 6  # everything except the query


def test_priority_sample_drops_null_and_nonpositive_weights(spark):
    from covsonar_spark.operators.curation import priority_sample

    docs = spark.createDataFrame(
        [(1, 10), (2, None), (3, 0), (4, -5), (5, 3)],
        "doc_id long, w int")
    got = {r["doc_id"] for r in priority_sample(docs, "w", k=10).collect()}
    assert got == {1, 5}


def test_histogram_quantile_ignores_null_values(spark):
    from covsonar_spark.operators.sketches import (hist_cells,
                                                   hist_quantile_from_cells)

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("a", None)],
        "g string, v double")
    cells = hist_cells(df, "g", "v", 1.0, 3.0, bins=4)
    out = hist_quantile_from_cells(cells, 1.0, 3.0, p=0.5, bins=4).collect()
    # n counts only the 2 non-null values; median interpolates between them
    assert len(out) == 1 and 1.0 <= out[0]["hist_quantile"] <= 3.0


def test_genotype_matrix_handles_dotted_accessions(spark):
    """RefSeq-style accessions contain '.'; the pivot's null-fill must
    backtick-escape them (a bare F.col parses the dot as field access)."""
    from covsonar_spark.operators.vcf import genotype_matrix

    calls = spark.createDataFrame(
        [("MN908947.3", 11, "A", "T"), ("S2", 11, "A", "G"),
         ("MN908947.3", 25, "C", "T")],
        "accession string, pos long, ref string, alt string")
    mat = genotype_matrix(calls)
    assert "MN908947.3" in mat.columns
    rows = {r["pos"]: r for r in mat.collect()}
    assert rows[25]["S2"] == "."           # null-filled via escaped column


def test_asof_join_ignores_null_right_timestamps(spark):
    from covsonar_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, 50, 1.5)],
        "k long, rt long, price double")
    out = asof_join(left, right, ["k"], "t", "rt").collect()
    assert len(out) == 1 and out[0]["price"] == 1.5
    # left row EARLIER than every real right row: no match, not the
    # null-ts payload
    left2 = spark.createDataFrame([(1, 10)], "k long, t long")
    out2 = asof_join(left2, right, ["k"], "t", "rt").collect()
    assert out2[0]["price"] is None


def test_asof_join_suffixes_colliding_columns(spark):
    from covsonar_spark.operators.windows import asof_join

    left = spark.createDataFrame([(1, 100, 7.0)], "k long, t long, price double")
    right = spark.createDataFrame([(1, 50, 1.5)], "k long, rt long, price double")
    out = asof_join(left, right, ["k"], "t", "rt").collect()[0]
    assert out["price"] == 7.0             # left column untouched
    assert out["price_right"] == 1.5       # matched payload suffixed


def _synthetic_calls(spark, n_samples, n_pos=6):
    """Deterministic (accession, pos, ref, alt) long-format calls: each
    sample carries a variant at every other position, alternating ALT
    so sites are multi-allelic."""
    from pyspark.sql import functions as F

    s = spark.range(n_samples).select(
        F.format_string("SAMP%05d", F.col("id")).alias("accession"),
        F.col("id"))
    p = spark.range(n_pos).select((F.col("id") * 7 + 11).alias("pos"),
                                  F.col("id").alias("pidx"))
    return (s.crossJoin(p)
            .where((F.col("id") + F.col("pidx")) % 2 == 0)
            .select("accession", "pos", F.lit("A").alias("ref"),
                    F.when(F.col("id") % 3 == 0, "T")
                     .when(F.col("id") % 3 == 1, "G")
                     .otherwise("C").alias("alt")))


def test_write_vcf_distributed_matches_driver(spark, tmp_path):
    """The distributed merged writer's output is byte-identical to the
    driver pivot path on a small cohort."""
    from covsonar_spark.operators.vcf import site_table, write_vcf

    calls = _synthetic_calls(spark, 40)
    sites = site_table(calls)
    a, b = str(tmp_path / "driver.vcf"), str(tmp_path / "dist.vcf")
    write_vcf(sites, calls, a, mode="driver")
    write_vcf(sites, calls, b, mode="distributed")
    assert open(a).read() == open(b).read()


def test_write_vcf_large_cohort_no_cap_error(spark, tmp_path):
    """A cohort past the genotype_matrix cap writes through the
    distributed path under mode='auto' — no cap error — and the body
    has one genotype column per sample."""
    from covsonar_spark.operators.vcf import site_table, write_vcf

    n = 2100   # > the 2000-sample driver cap
    calls = _synthetic_calls(spark, n, n_pos=3)
    sites = site_table(calls)
    out = str(tmp_path / "big.vcf")
    write_vcf(sites, calls, out, mode="auto")
    lines = open(out).read().splitlines()
    header = next(l for l in lines if l.startswith("#CHROM"))
    assert len(header.split("\t")) == 9 + n
    body = [l for l in lines if not l.startswith("#")]
    assert body and all(len(l.split("\t")) == 9 + n for l in body)
    # spot-check genotype semantics: every non-header field is '.' or digits
    for l in body:
        assert set(f for f in l.split("\t")[9:]) <= {".", "1", "2", "3"}


def test_write_vcf_distributed_tolerates_duplicate_calls(spark, tmp_path):
    """Dirty input with two calls for one accession at the same
    (pos, vcf_type) must not crash map_from_entries (default
    mapKeyDedupPolicy=EXCEPTION) — the distributed path folds
    duplicates with min() before building the map, matching the driver
    path's first()-tolerance."""
    from covsonar_spark.operators.vcf import site_table, write_vcf

    calls = _synthetic_calls(spark, 10).unionAll(
        _synthetic_calls(spark, 10))          # exact duplicate rows
    sites = site_table(calls)
    out = str(tmp_path / "dup.vcf")
    write_vcf(sites, calls, out, mode="distributed")
    body = [l for l in open(out).read().splitlines()
            if not l.startswith("#")]
    assert body


def test_write_vcf_sample_order_parity_non_ascii(spark, tmp_path):
    """Sample column order must be identical between the driver and
    distributed paths even for non-ASCII accessions, where Python
    sorted() (codepoint order) and Spark's UTF8 collation can differ."""
    from pyspark.sql import functions as F

    from covsonar_spark.operators.vcf import site_table, write_vcf

    rows = [("Zèta", 5, "A", "T"), ("Zz", 5, "A", "G"),
            ("Äbc", 12, "C", "T"), ("ABC", 12, "C", "G"),
            ("zeta", 19, "G", "A")]
    calls = spark.createDataFrame(rows, "accession string, pos long, "
                                        "ref string, alt string")
    sites = site_table(calls)
    a, b = str(tmp_path / "drv.vcf"), str(tmp_path / "dst.vcf")
    write_vcf(sites, calls, a, mode="driver")
    write_vcf(sites, calls, b, mode="distributed")
    ha = next(l for l in open(a).read().splitlines() if l.startswith("#CHROM"))
    hb = next(l for l in open(b).read().splitlines() if l.startswith("#CHROM"))
    assert ha == hb
    assert open(a).read() == open(b).read()
