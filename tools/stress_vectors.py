"""Scale probe for the exact-cosine paths: synthesize N 64-dim vectors
(deterministic, id-derived), run

  * cosine_pairs_exact mode="grid"   (the all-big triangular block grid)
  * cosine_pairs_exact mode="broadcast" (reference result, small-N only)
  * lsh_knn_join rerank="join"       (the no-driver-collect knn path)

and report wall time + agreement.  Usage: python tools/stress_vectors.py [n]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import pyspark.sql.functions as F

    from covsonar_spark.operators.similarity import (cosine_pairs_exact,
                                                     lsh_knn_join)
    from covsonar_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark("stress-vectors")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic embeddings: hash-spread directions (so
    # LSH buckets stay uniform and the true-pair set is output-bounded)
    # with every 100th vector a jittered copy of its predecessor — the
    # planted near-duplicates the pair operators must find
    dim = 64
    base = spark.range(n).withColumnRenamed("id", "vec_id")
    src = F.when(F.col("vec_id") % 100 == 99,
                 F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    comps = [
        ((F.hash(src * 31 + i) % 2001 - 1000) / F.lit(1000.0)
         + F.when(F.col("vec_id") % 100 == 99,
                  (F.hash(F.col("vec_id") * 7 + i) % 11) / F.lit(2000.0))
            .otherwise(F.lit(0.0))).cast("float")
        for i in range(dim)
    ]
    emb = base.select("vec_id", F.array(*comps).alias("embedding"))
    emb = emb.repartition(32).persist()
    emb.count()

    t0 = time.time()
    n_grid = cosine_pairs_exact(emb, 0.99, mode="grid", n_blocks=32).count()
    t_grid = time.time() - t0
    print(f"grid      n={n}: {n_grid} pairs in {t_grid:.1f}s")

    if n <= 60_000:
        t0 = time.time()
        n_bc = cosine_pairs_exact(emb, 0.99, mode="broadcast").count()
        t_bc = time.time() - t0
        print(f"broadcast n={n}: {n_bc} pairs in {t_bc:.1f}s")
        assert n_bc == n_grid, (n_bc, n_grid)
        print("grid == broadcast ✓")

    t0 = time.time()
    n_knn = lsh_knn_join(emb, k=3, n_planes=12, n_tables=1,
                         rerank="join").count()
    t_knn = time.time() - t0
    print(f"lsh knn (join rerank) n={n}: {n_knn} rows in {t_knn:.1f}s")


if __name__ == "__main__":
    main()
