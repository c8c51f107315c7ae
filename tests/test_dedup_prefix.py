"""PPJoin prefix-filtered Jaccard must be EXACTLY equivalent to the
plain inverted-index join (prefix filtering is lossless), while
indexing strictly fewer rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.dedup import (ngram_jaccard_pairs,
                                            ngram_jaccard_prefix_pairs,
                                            shingle_sets)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.mark.parametrize("t", [0.3, 0.5, 0.7])
def test_prefix_equals_exact(spark, docs, t):
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
    pref = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_prefix_pairs(docs, threshold=t).collect()}
    assert pref == exact


@pytest.mark.parametrize("cap", [1, 3, 10**6])
def test_shingle_df_cap_is_lossless(spark, docs, cap):
    """max_shingle_df splits hot posting lists into salted sub-block
    grid cells instead of dropping them: pairs AND Jaccard values are
    identical to the uncapped exact join for any cap — even cap=1,
    where every multi-posting shingle is split."""
    sub = docs.limit(150)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(sub, threshold=0.3).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(
                  sub, threshold=0.3, max_shingle_df=cap).collect()}
    assert exact and capped == exact


def test_prefix_index_is_smaller(spark, docs):
    full = shingle_sets(docs).select(F.explode("shingles")).count()
    # rebuild the prefix relation size the operator would index at t=0.7
    from pyspark.sql import Window
    sh = shingle_sets(docs)
    inv = sh.select("doc_id", F.size("shingles").alias("n_sh"),
                    F.explode("shingles").alias("shingle"))
    dfreq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    w = Window.partitionBy("doc_id").orderBy(F.col("sdf").asc(), F.col("shingle").asc())
    plen = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(0.7)).cast("int") + F.lit(1)
    pref = inv.join(dfreq, "shingle").withColumn("rnk", F.row_number().over(w)) \
              .where(F.col("rnk") <= plen).count()
    assert pref < full * 0.45

def test_stop_shingle_frac_one_is_identity(spark, docs):
    """frac=1.0 means the ceiling is N itself — no shingle can exceed
    it, so the knob engaged at its loosest setting must return the
    exact default result (pairs AND values)."""
    sub = docs.limit(150)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(sub, threshold=0.3).collect()}
    stopped = {(r["id_a"], r["id_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(
                   sub, threshold=0.3, stop_shingle_df_frac=1.0).collect()}
    assert exact and stopped == exact


def test_stop_shingle_bounds_candidates_and_matches_oracle(spark):
    """A corpus where one stop shingle appears in EVERY document (the
    saturated-vocabulary blowup): with the knob on, (1) the candidate
    pair count drops to the sum over surviving shingles of C(df,2),
    and (2) every emitted Jaccard equals a Python oracle computed over
    the FILTERED shingle universe."""
    from itertools import combinations

    # 40 docs; all share the phrase "the common boiler plate line";
    # duplicates share a distinctive tail
    rows = []
    for i in range(40):
        tail = f"unique tail {i} " * 3 if i % 4 else "shared dup tail marker here"
        rows.append((i, f"the common boiler plate line {tail}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    frac = 0.5
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(
               df, threshold=0.2, stop_shingle_df_frac=frac).collect()}

    # python oracle over the filtered universe
    def shingles(t):
        w = t.split()
        return {" ".join(w[j:j + 3]) for j in range(max(1, len(w) - 2))}

    sets = {i: shingles(t) for i, t in rows}
    from collections import Counter
    dfreq = Counter(s for ss in sets.values() for s in ss)
    ceiling = frac * len(rows)
    kept = {i: {s for s in ss if dfreq[s] <= ceiling}
            for i, ss in sets.items()}
    want = {}
    n_candidates = 0
    for a, b in combinations(sorted(kept), 2):
        inter = len(kept[a] & kept[b])
        if inter:
            n_candidates += 1
            j = round(inter / (len(kept[a]) + len(kept[b]) - inter), 4)
            if j >= 0.2:
                want[(a, b)] = j
    assert got == want and want
    # the stop shingles covered every pair: without the knob every
    # C(40,2)=780 pair is a candidate; with it only tail-sharing ones
    assert n_candidates < 100
