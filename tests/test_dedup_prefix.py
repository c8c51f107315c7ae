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
