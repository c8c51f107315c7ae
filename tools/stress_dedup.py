"""Scale stress for the dedup family — the 100 TB question asked at
local scale: does runtime grow with CORPUS size or with OUTPUT size?

Two corpora, both synthesized deterministically in-plan (no test data
dependency):

  unique    — 50-token docs derived from md5(id): zero near-dups, so
              runtime isolates the corpus-size scaling of signature
              build + index joins (should be ~linear).
  replicated— every document has R-1 true near-duplicates (tail-token
              perturbation keeps Jaccard ≈ 0.96): pair output is
              inherently quadratic IN THE CLUSTER SIZE (R²/2 per
              source doc), so runtime here measures output cost, not
              algorithmic blowup.  Production pipelines that only need
              clusters (not all pairs) should go through
              dedup_clusters / dedup_canonical, or cap the inverted
              index with the PPJoin prefix filter
              (ngram_jaccard_prefix_pairs).

Usage:  python tools/stress_dedup.py [n_docs]
Measured on local[32] (2026-08, round 2): unique 200k docs → minhash
~10 s, jaccard inverted index ~3 s; replicated 200k (R=40) →
5,000·C(40,2) = 3.9M verified pairs in ~19 s / ~11 s, time ∝ pairs.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from covsonar_spark.operators import dedup  # noqa: E402
from covsonar_spark.session import get_spark  # noqa: E402


def unique_corpus(spark, n: int):
    return (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(50)),
            lambda j: F.substring(F.md5(F.concat(
                F.col("id").cast("string"), F.lit(":"),
                j.cast("string"))), 1, 6))).alias("text"))
    ).repartition(32).persist()


def replicated_corpus(spark, n: int, r: int = 40):
    base = unique_corpus(spark, n // r)
    return (spark.range(r).crossJoin(base)
            .select((F.col("id") * 1_000_000 + F.col("doc_id")).alias("doc_id"),
                    F.concat_ws(" ", F.col("text"),
                                F.concat(F.lit("u"), F.col("id").cast("string"))
                                ).alias("text"))
            .repartition(32).persist())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("stress-dedup")
    for name, mk in (("unique", unique_corpus), ("replicated", replicated_corpus)):
        big = mk(spark, n)
        big.count()
        for op, fn in (("minhash_lsh", lambda d: dedup.minhash_lsh_pairs(d)),
                       ("jaccard_idx", lambda d: dedup.ngram_jaccard_pairs(d, threshold=0.5))):
            t0 = time.perf_counter()
            pairs = fn(big).count()
            print(f"{name:10s} n={n} {op}: {time.perf_counter()-t0:7.1f}s "
                  f"pairs={pairs}")
        big.unpersist()


if __name__ == "__main__":
    main()
