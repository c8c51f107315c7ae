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


# Measured crossover (tools/stress_vectors.py, local[32], 64-dim):
#   n=10k  broadcast 3.1 s  vs grid 4.4 s
#   n=50k  broadcast 323 s  vs grid 27 s   (identical pair sets)
# The broadcast kernel scores the full n² square against a per-task
# n×dim matrix (memory-bound above ~10k rows); the grid scores the
# triangle in bounded blocks.  So the exact-pairs auto mode switches to
# the grid early — it is both the scale-safe AND the faster path well
# before memory becomes the binding constraint.
GRID_ROW_THRESHOLD = 10_000

# The knn rerank's broadcast side is only a lookup table (no quadratic
# kernel): the binding constraint is broadcast size, not compute.  The
# rerank materializes the matrix as float64 (8 bytes/dim, not the 4 of
# the stored float32), so the threshold is derived from bytes — a
# 500k-row flat cap understated the real footprint 2×.
KNN_BCAST_MAX_BYTES = 128 << 20   # comfortable executor-memory ceiling


def knn_bcast_row_threshold(dim: int) -> int:
    """Max rows whose broadcast lookup table (float64 matrix + int64
    ids, the types ``score_bcast`` actually materializes) stays under
    ``KNN_BCAST_MAX_BYTES``."""
    return KNN_BCAST_MAX_BYTES // (dim * 8 + 8)


def cosine_pairs_exact(df: DataFrame, threshold: float,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       mode: str = "auto", n_blocks: int = 16,
                       n_rows: int | None = None) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ t).

    Block-wise vectorized scoring: the right side is broadcast as one
    numpy matrix; ``mapInPandas`` scores each partition's block against
    it with vectorized per-dimension accumulation. ~60× faster than
    per-pair JVM expression evaluation (the 2M-pair HOF plan runs ~25 s
    at sf0.1; this runs sub-second) and still bit-identical to the
    DuckDB oracle: products and sums accumulate left-to-right per pair
    in float64, same as ``list_sum``/``aggregate`` fold order.

    Mode selection (``mode``):
      * ``"broadcast"`` — one side collected + broadcast; right only
        when the corpus fits in executor memory (the fast local path).
      * ``"grid"`` — block-partitioned pair grid: every vector is
        hashed to one of ``n_blocks`` blocks and replicated to the
        triangle of block-pair cells; each cell scores its bipartite
        block pair independently.  No driver collect, no broadcast —
        per-task memory is O((n/n_blocks)·dim), so this is the
        100 TB-safe exact path (compute is the inherent O(n²/2) dot
        products, spread over n_blocks·(n_blocks+1)/2 tasks).
      * ``"auto"`` (default) — broadcast below ``GRID_ROW_THRESHOLD``
        rows, grid above.  Pass ``n_rows`` when the caller knows the
        cardinality (parquet footer, catalog stats, prior count):
        without it auto mode must run a ``count()`` action, i.e. one
        full (column-pruned) pass over the upstream plan before any
        useful work — wasteful at scale and potentially inconsistent
        for nondeterministic upstream sources.
    Both modes use the identical block-vectorized float64 kernel with
    sequential per-dimension accumulation, so results are bit-identical
    to each other and to the DuckDB ``list_sum`` oracle.
    """
    import numpy as np
    import pandas as pd

    if mode not in ("auto", "broadcast", "grid"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        n = n_rows if n_rows is not None else df.count()
        mode = "grid" if n > GRID_ROW_THRESHOLD else "broadcast"
        if mode == "grid":
            # scale the grid with the corpus: target ~8k-row blocks so
            # a cell's bipartite kernel stays ~8k x 8k (bounded memory
            # AND bounded per-task compute); replication cost grows as
            # B/2 per row — the inherent price of exact all-pairs
            import math
            n_blocks = max(n_blocks, math.ceil(n / 8192))
    from covsonar_spark.metrics import record_mode
    record_mode("cosine_pairs_exact", mode)
    if mode == "grid":
        return _cosine_pairs_grid(df, threshold, vec_col, id_col, n_blocks)

    spark = df.sparkSession
    side = df.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in side], dtype=np.int64)
    M = np.array([r[1] for r in side], dtype=np.float64)
    dim = M.shape[1]
    bc = spark.sparkContext.broadcast((ids, M))
    # The probe side carries the O(n·|bcast|·dim) kernel — a
    # single-row-group parquet input would run it as ONE task (guide
    # §2.5 input skew).  Floor its parallelism; production-sized inputs
    # already have >= defaultParallelism splits and are untouched.
    from covsonar_spark.operators.dedup import min_parallelism

    def score(batches):
        ids_b, Mb = bc.value
        nb2 = np.zeros(len(ids_b))
        for i in range(Mb.shape[1]):            # sequential: l-to-r fold
            nb2 += Mb[:, i] * Mb[:, i]
        nb = np.sqrt(nb2)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            dot = np.zeros((len(A), len(ids_b)))
            na2 = np.zeros(len(A))
            for i in range(dim):                # sequential per dimension
                dot += A[:, i:i + 1] * Mb[:, i]
                na2 += A[:, i] * A[:, i]
            cos = np.round(dot / (np.sqrt(na2)[:, None] * nb[None, :]), 4)
            ii, jj = np.nonzero((cos >= threshold) & (a_ids[:, None] < ids_b[None, :]))
            yield pd.DataFrame({"id_a": a_ids[ii], "id_b": ids_b[jj],
                                "cosine": cos[ii, jj]})

    return min_parallelism(df.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        score, schema="id_a long, id_b long, cosine double")


def _cosine_pairs_grid(df: DataFrame, threshold: float,
                       vec_col: str, id_col: str, n_blocks: int) -> DataFrame:
    """All-big exact cosine pairs via a triangular block grid.

    Each vector hashes to block b = pmod(xxhash64(id), B) and is
    replicated JVM-side (sequence + explode, no Python in the fan-out)
    to the grid cells it participates in: as the A side of cells
    (b, j≥b) and the B side of cells (i<b, b).  groupBy(ci, cj) then
    shuffles each cell's two block slices to one task; applyInPandas
    scores the bipartite pair block with the same sequential-fold
    float64 kernel as the broadcast path (diagonal cells use the
    id_a < id_b triangle).  Replication factor is (B+1)/2 on average —
    the price of exactness without a broadcast; per-task memory is
    O((n/B)·dim) per side, tunable via n_blocks to the cluster's
    executor size.
    """
    import numpy as np
    import pandas as pd

    b = F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_blocks)).cast("int")
    base = df.select(F.col(id_col).cast("long").alias("_id"),
                     F.col(vec_col).alias("_v"), b.alias("_blk"))
    # A side: cells (blk, j) for j in [blk, B); B side: cells (i, blk)
    # for i in [0, blk).  The diagonal cell gets the block once, as A.
    side_a = base.select(
        "_id", "_v", F.col("_blk").alias("ci"),
        F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1))).alias("cj"),
        F.lit(0).alias("role"))
    side_b = base.where(F.col("_blk") > 0).select(
        "_id", "_v",
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("ci"),
        F.col("_blk").alias("cj"), F.lit(1).alias("role"))

    def score_cell(key, pdf):
        ci, cj = key
        a = pdf[pdf["role"] == 0]
        bb = a if ci == cj else pdf[pdf["role"] == 1]
        if not len(a) or not len(bb):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        A = np.array([list(v) for v in a["_v"]], dtype=np.float64)
        B = np.array([list(v) for v in bb["_v"]], dtype=np.float64)
        a_ids = a["_id"].to_numpy(dtype=np.int64)
        b_ids = bb["_id"].to_numpy(dtype=np.int64)
        dot = np.zeros((len(A), len(B)))
        na2 = np.zeros(len(A))
        nb2 = np.zeros(len(B))
        for i in range(A.shape[1]):             # sequential: l-to-r fold
            dot += A[:, i:i + 1] * B[:, i]
            na2 += A[:, i] * A[:, i]
            nb2 += B[:, i] * B[:, i]
        cos = np.round(dot / (np.sqrt(na2)[:, None] * np.sqrt(nb2)[None, :]), 4)
        if ci == cj:
            # within-block: keep the id_a < id_b triangle
            ii, jj = np.nonzero((cos >= threshold)
                                & (a_ids[:, None] < b_ids[None, :]))
            lo, hi = a_ids[ii], b_ids[jj]
        else:
            # cross-block: each unordered pair lives in exactly this
            # cell — keep every hit, normalized to (min, max)
            ii, jj = np.nonzero(cos >= threshold)
            lo = np.minimum(a_ids[ii], b_ids[jj])
            hi = np.maximum(a_ids[ii], b_ids[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[ii, jj]})

    cells = side_a.unionByName(side_b)
    return cells.groupBy("ci", "cj").applyInPandas(
        score_cell, schema="id_a long, id_b long, cosine double")


def ivf_assign(df: DataFrame, n_centroids: int = 16,
               vec_col: str = "embedding", id_col: str = "vec_id",
               _cents: list | None = None) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    nearest-by-cosine centroid (ties → lowest centroid id).

    Centroids here are the ``n_centroids`` lowest-id vectors — a
    deterministic stand-in for a trained codebook (at scale the
    codebook comes from a separate k-means job; assignment cost and
    plan shape are identical). The codebook is a driver-side artifact
    (like any trained model), so assignment is a pure map over the
    scan — zero shuffle, zero join (the previous formulation shuffled
    a broadcast-cross-joined 16×-expanded table through a row_number
    window just to pick each row's max). Scoring is a block-vectorized
    ``mapInPandas`` like ``cosine_pairs_exact``: a per-row interpreted
    zip_with/aggregate plan measured ~1 ms/row (HOFs don't codegen);
    the numpy path with per-dimension sequential accumulation is ~100×
    faster and keeps the oracle's left-to-right float64 fold order.
    """
    cents = _cents if _cents is not None else _centroids(
        df, n_centroids, vec_col, id_col)
    vec_type = df.schema[vec_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _ivf_score_fn(cents, vec_col, id_col),
        schema=f"{id_col} {id_type}, {vec_col} {vec_type}, cid long")


def _centroids(df: DataFrame, n_centroids: int, vec_col: str, id_col: str):
    """Collect the deterministic codebook (tiny) to the driver."""
    rows = df.orderBy(id_col).limit(n_centroids).select(id_col, vec_col).collect()
    return [(r[0], list(r[1])) for r in rows]


def _ivf_score_fn(cents, vec_col: str, id_col: str,
                  query_vec: list[float] | None = None):
    """Build the mapInPandas generator: nearest centroid per row, plus
    the query cosine when ``query_vec`` is given (fused so ``ivf_topk``
    is a single pass over the scan).

    Accumulation is sequential over dimensions, vectorized over rows —
    bit-identical to the l-to-r float64 fold of ``aggregate``/DuckDB
    ``list_sum``. Centroid ids arrive ascending, so ``argmax``'s
    first-max rule IS the lowest-cid tiebreak.
    """
    import math

    import numpy as np
    import pandas as pd

    C = np.array([cvec for _, cvec in cents], dtype=np.float64)   # (K, D)
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    dim = C.shape[1]
    nc2 = np.zeros(len(cids))
    for i in range(dim):                        # sequential: l-to-r fold
        nc2 += C[:, i] * C[:, i]
    nc = np.sqrt(nc2)
    if query_vec is not None:
        qv = np.array(query_vec, dtype=np.float64)
        qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            dot = np.zeros((len(A), len(cids)))
            na2 = np.zeros(len(A))
            qdot = np.zeros(len(A))
            for i in range(dim):                # sequential per dimension
                dot += A[:, i:i + 1] * C[:, i]
                na2 += A[:, i] * A[:, i]
                if query_vec is not None:
                    qdot += A[:, i] * qv[i]
            na = np.sqrt(na2)
            csim = np.round(dot / (na[:, None] * nc[None, :]), 6)
            out = {id_col: pdf[id_col].to_numpy(),
                   "cid": cids[np.argmax(csim, axis=1)]}
            if query_vec is not None:
                out["cosine"] = np.round(qdot / (na * qn), 4)
            else:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return score


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 16, n_probe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF search: probe the ``n_probe`` cells nearest the query, exact
    cosine top-k within the probed cells only.

    At 100 TB the assignment is precomputed and the table partitioned
    by cell id, so a probe prunes partitions at the parquet level and
    the scan touches n_probe/n_centroids of the data; here the
    assignment runs inline to keep the operator self-contained.
    """
    import math

    cents = _centroids(df, n_centroids, vec_col, id_col)
    # probe selection is driver-side arithmetic over the collected
    # codebook (same float64 op order as the column expression:
    # sequential dot, round to 6); the probe set becomes an isin
    # predicate, which prunes cell partitions at the parquet level
    # when the assignment is a stored table.
    qn = math.sqrt(sum(x * x for x in query_vec))
    scored = []
    for cid, cvec in cents:
        d = 0.0
        for a, b in zip(query_vec, cvec):
            d += float(a) * float(b)
        cn = math.sqrt(sum(float(x) * float(x) for x in cvec))
        scored.append((round(d / (qn * cn), 6), cid))
    probe_cids = [cid for _, cid in
                  sorted(scored, key=lambda s: (-s[0], s[1]))[:n_probe]]
    id_type = df.schema[id_col].dataType.simpleString()
    scored_df = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _ivf_score_fn(cents, vec_col, id_col, query_vec=query_vec),
        schema=f"{id_col} {id_type}, cid long, cosine double")
    return (
        scored_df.where(F.col("cid").isin(probe_cids))
        .select(F.col(id_col), "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _deterministic_hyperplanes(n_planes: int, dim: int, table: int = 0) -> list[list[float]]:
    """±1 hyperplanes derived from md5 — stable across runs/engines, no RNG."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(0, dim, 16):
            digest = hashlib.md5(f"plane:{table}:{p}:{d}".encode()).digest()
            row.extend(1.0 if byte & 1 else -1.0 for byte in digest)
        planes.append(row[:dim])
    return planes


def rp_lsh_buckets(df: DataFrame, n_planes: int = 8, n_tables: int = 1,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH: one bucket id per (vector, table); bit p of
    a bucket = sign(v·h_pt).

    AND-amplification within a table (``n_planes`` bits → precision),
    OR-amplification across ``n_tables`` independent tables → recall.
    Output is long-format (id, table, bucket): candidates are pairs
    sharing a bucket in ANY table — an equi-shuffle on (table, bucket)
    instead of a cross join.
    """
    tables = []
    for t in range(n_tables):
        planes = _deterministic_hyperplanes(n_planes, dim=dim, table=t)
        # dim MUST match the embedding width: zip_with pads a shorter
        # side with nulls, which nulls the dot product and collapses
        # every vector into bucket 0 with no error
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(planes):
            h = F.array(*[F.lit(x) for x in plane])
            bit = F.when(V.dot(F.col(vec_col), h) >= 0,
                         F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
            bucket = bucket + bit
        tables.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return df.select(F.col(id_col), F.col(vec_col),
                     F.explode(F.array(*tables)).alias("tb")) \
             .select(id_col, vec_col, "tb.table", "tb.bucket")


LSH_TARGET_BUCKET = 32  # auto-planes aims for ~this many ids/bucket


def auto_n_planes(n: int, target_bucket: int = LSH_TARGET_BUCKET) -> int:
    """Plane count that keeps EXPECTED bucket occupancy ~constant:
    ``ceil(log2(n / target_bucket))``, clamped to [4, 24].

    With a FIXED plane count the bucket space is fixed (2^p buckets),
    so occupancy grows linearly with n and per-bucket candidate pairs
    grow QUADRATICALLY — the parameterization that is value-checkable
    against a pinned oracle is therefore not the 100 TB path.  Scaling
    planes with log2(n) keeps candidates ~target_bucket × n (linear);
    recall at a given similarity shifts with p, which callers recover
    by raising ``n_tables`` (OR-amplification) — the standard LSH
    tradeoff, now occupancy-stable by default."""
    import math

    return max(4, min(24, math.ceil(math.log2(max(n / target_bucket, 2.0)))))


def lsh_knn_join(df: DataFrame, k: int = 5, n_planes: int | None = 8,
                 n_tables: int = 1,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 rerank: str = "auto", max_bucket: int | None = None,
                 n_rows: int | None = None, dim: int = 64) -> DataFrame:
    """Approximate all-pairs knn: candidates share an LSH bucket in any
    table; rank by exact cosine per id_a.

    Output: (id_a, id_b, cosine, rank) with rank ≤ k per id_a.

    Scale shape: one Python sweep computes every (id, table, bucket)
    sign-hash row; ``collect_list`` groups each bucket ONCE (24-byte
    rows through the shuffle, never the vectors) and candidate pairs
    explode JVM-side from the per-bucket id arrays — no self-join, so
    the bucket table is consumed once and nothing needs caching.
    Per-bucket state is the bucket's id list, bounded by the LSH
    parameters (n_planes controls expected bucket size); pass
    ``max_bucket`` to additionally bound per-task state on degenerate
    corpora — hot buckets then split into salted sub-block grid cells
    (``_split_bucket_pairs``) with NO candidate loss, rather than
    being dropped.

    ``n_planes=None`` picks the occupancy-stable plane count
    ``auto_n_planes(n)`` (~``LSH_TARGET_BUCKET`` ids/bucket, so
    candidate volume stays LINEAR in n) — the scale default; explicit
    plane counts remain for oracle-reproducible parameterizations.

    The exact-cosine rerank is adaptive (``rerank``):
      * ``"broadcast"`` — the (id-sorted) vector matrix is collected
        and broadcast; the rerank is a single pass over the id-only
        pair stream with numpy lookups.  This is Spark's own
        broadcast-join contract: legal exactly when one side fits in
        memory.
      * ``"join"`` — candidate pairs equi-join back to the vector
        table twice on id; both sides shuffle on id, vectors attach
        per pair.  No driver materialization anywhere — the 100 TB
        path, ~3× slower at small scale because the vector payload
        rides the shuffle twice.
      * ``"auto"`` (default) — broadcast while the float64 lookup
        table fits ``KNN_BCAST_MAX_BYTES`` (the table is memory-bound,
        not compute-bound), join above.  Pass ``n_rows`` when the
        caller knows the cardinality; without the hint auto mode runs
        a ``count()`` action — a full extra pass over the upstream
        plan.
    Both produce bit-identical cosines (same sequential per-dimension
    float64 folds).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    if rerank not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown rerank mode {rerank!r}")
    from covsonar_spark.metrics import record_mode
    if n_planes is None or rerank == "auto":
        n = n_rows if n_rows is not None else df.count()
        n_rows = n
        if n_planes is None:
            n_planes = auto_n_planes(n)
            record_mode("lsh_knn_planes", str(n_planes))
        if rerank == "auto":
            rerank = ("join" if n > knn_bcast_row_threshold(dim)
                      else "broadcast")
    record_mode("lsh_knn_rerank", rerank)

    spark = df.sparkSession
    planes = [np.array(_deterministic_hyperplanes(n_planes, dim, t),
                       dtype=np.float64) for t in range(n_tables)]

    def buckets(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            out_i, out_t, out_b = [], [], []
            for t, P in enumerate(planes):
                dot = np.zeros((len(A), P.shape[0]))
                for i in range(min(P.shape[1], A.shape[1])):   # sequential dims
                    dot += A[:, i:i + 1] * P[:, i]
                bits = (dot >= 0).astype(np.int64)
                out_i.append(ids)
                out_t.append(np.full(len(A), t, dtype=np.int32))
                out_b.append(bits @ (1 << np.arange(P.shape[0], dtype=np.int64)))
            yield pd.DataFrame({id_col: np.concatenate(out_i),
                                "table": np.concatenate(out_t),
                                "bucket": np.concatenate(out_b)})

    b = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        buckets, schema=f"{id_col} long, table int, bucket long")
    # one shuffle groups each bucket; pairs explode from the id arrays
    # (a, b != a), deduped across tables.  This replaces a persist +
    # self-join: single consumption of the Python stage, one fewer
    # shuffle, and no cache entry left behind in a long-lived session.
    if max_bucket is None:
        lists = b.groupBy("table", "bucket").agg(
            F.collect_list(id_col).alias("ids"))
        pairs = (
            lists
            .select(F.explode("ids").alias("id_a"), "ids")
            .select("id_a", F.explode("ids").alias("id_b"))
            .where(F.col("id_a") != F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        pairs = _split_bucket_pairs(b, id_col, max_bucket)

    if rerank == "broadcast":
        side = df.select(F.col(id_col), F.col(vec_col)).collect()
        ids_all = np.array([r[0] for r in side], dtype=np.int64)
        M = np.array([r[1] for r in side], dtype=np.float64)
        order = np.argsort(ids_all)
        bc = spark.sparkContext.broadcast((ids_all[order], M[order]))

        def score_bcast(batches):
            ids_s, Ms = bc.value
            n2 = np.zeros(len(ids_s))
            for i in range(Ms.shape[1]):                       # sequential dims
                n2 += Ms[:, i] * Ms[:, i]
            norms = np.sqrt(n2)
            for pdf in batches:
                if not len(pdf):
                    continue
                ia = np.searchsorted(ids_s, pdf["id_a"].to_numpy())
                ib = np.searchsorted(ids_s, pdf["id_b"].to_numpy())
                A, B = Ms[ia], Ms[ib]
                dot = np.zeros(len(A))
                for i in range(Ms.shape[1]):                   # sequential dims
                    dot += A[:, i] * B[:, i]
                yield pd.DataFrame({
                    "id_a": pdf["id_a"], "id_b": pdf["id_b"],
                    "cosine": np.round(dot / (norms[ia] * norms[ib]), 4)})

        scored = pairs.mapInPandas(
            score_bcast, schema="id_a long, id_b long, cosine double")
    else:
        va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
        vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
        cand = pairs.join(va, "id_a").join(vb, "id_b")

        def score_join(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                A = np.stack(pdf["_va"].to_numpy()).astype(np.float64)
                B = np.stack(pdf["_vb"].to_numpy()).astype(np.float64)
                dot = np.zeros(len(A))
                na2 = np.zeros(len(A))
                nb2 = np.zeros(len(A))
                for i in range(A.shape[1]):                    # sequential dims
                    dot += A[:, i] * B[:, i]
                    na2 += A[:, i] * A[:, i]
                    nb2 += B[:, i] * B[:, i]
                yield pd.DataFrame({
                    "id_a": pdf["id_a"], "id_b": pdf["id_b"],
                    "cosine": np.round(dot / (np.sqrt(na2) * np.sqrt(nb2)), 4)})

        scored = cand.mapInPandas(
            score_join, schema="id_a long, id_b long, cosine double")

    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _split_bucket_pairs(b: DataFrame, id_col: str, max_bucket: int,
                        key_cols: tuple[str, ...] = ("table", "bucket")) -> DataFrame:
    """Candidate pairs from bucket membership with bounded per-task
    state: a bucket with f members splits into s = ceil(f / max_bucket)
    salted sub-blocks (secondary hash of id, independent of the bucket
    hash) and each member replicates to the triangular grid of
    sub-block cells — the same scheme as ``_cosine_pairs_grid`` — so
    EVERY within-bucket pair still meets in exactly one cell while
    per-cell membership stays ~max_bucket.  This is the
    recall-preserving replacement for dropping hot buckets: a
    degenerate bucket degrades into more (bounded) tasks, never into
    lost candidates.  Cost: one extra shuffle (the per-bucket window
    count) plus replication factor (s+1)/2 on hot-bucket rows only —
    cold buckets have s = 1 and behave exactly like the uncapped path.
    Measured on an adversarial corpus (20k vectors, 3k in ONE bucket →
    9M raw pairs from that bucket): capped(500) 23.4 s vs uncapped
    30.1 s on local[32], identical results — splitting also
    PARALLELIZES the hot bucket's pair explosion across grid cells
    instead of one giant task, so the cap is a win, not a tax.

    Emits DIRECTED pairs (id_a, id_b), id_a != id_b, deduped across
    buckets and cells.  Built on the shared salted sub-block grid
    (``operators.pairgrid.split_grid_pairs``): each unordered pair
    meets in one cell per bucket; both orientations are emitted here
    because the knn rerank ranks neighbors per directed source id.
    """
    from covsonar_spark.operators.pairgrid import split_grid_pairs

    pairs = split_grid_pairs(b, list(key_cols), id_col, [], max_bucket,
                             salt="subbucket-salt")
    fwd = pairs.select(F.col("x.pid").alias("id_a"), F.col("y.pid").alias("id_b"))
    rev = pairs.select(F.col("y.pid").alias("id_a"), F.col("x.pid").alias("id_b"))
    return fwd.unionByName(rev).dropDuplicates(["id_a", "id_b"])


def kmeans_assign(df: DataFrame, k: int = 8, iters: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Lloyd k-means over an embedding column (the SemDedup /
    corpus-clustering primitive): deterministic init (the ``k``
    lowest-id vectors, like ``ivf_assign``'s codebook), ``iters``
    assign/update rounds, then a final assignment emitting
    (id, cluster, squared distance).

    Scale shape — the MLlib pattern, hand-rolled so every step is
    auditable: per iteration ONE pass over the fact (numpy
    mapInPandas assignment, same block-vectorized sequential-fold
    kernel as ``cosine_pairs_exact``), then a k×dim aggregate
    (``avg(v[i]) GROUP BY cid``) collected to the driver — the model
    is a driver-side artifact exactly like a trained codebook, so no
    shuffle ever moves the vectors; only k*dim doubles cross the wire
    per round. Total cost: (iters+1) scans, zero wide shuffles.

    Cross-engine determinism: distances are rounded to 6 decimals
    before argmin (ties → lowest cluster id), and the updated
    centroid means are rounded to 6 decimals before the next round —
    float sums are order-sensitive at the last ulp, and rounding at
    each fixpoint makes Spark's partial-agg order and the oracle's
    single-threaded order agree bit-for-bit. An empty cluster keeps
    its previous centroid."""
    cents = _kmeans_fit(df, k, iters, vec_col, id_col)
    return (_kmeans_assign_pass(df, cents, vec_col, id_col, with_dist=True)
            .select(id_col, "cid", "dist2"))


def _kmeans_fit(df: DataFrame, k: int, iters: int,
                vec_col: str, id_col: str) -> list[list[float]]:
    """Lloyd iterations → the trained centroid list (a driver-side
    model artifact).  Shared by ``kmeans_assign`` and
    ``semantic_dedup_pairs`` so the dedup path can run ONE labeling
    pass that keeps the vectors instead of joining labels back."""
    init = _centroids(df, k, vec_col, id_col)
    cents = [list(map(float, c)) for _, c in init]
    k = min(k, len(cents))    # tables smaller than k shrink the model
    dim = len(cents[0])
    # The dim-wide mean aggregate is built as ONE parameterized-SQL
    # string instead of `agg(*[F.round(F.avg(col[i]))...])`: the Column
    # construction alone cost ~0.46 s PER LLOYD ITERATION in Py4J
    # round-trips (hundreds of JVM calls for 64 dims), and analyzing 64
    # separate Column trees added ~0.3 s to each collect — parse-once
    # SQL measured 0.46→0.07 s build and ~0.8→0.5 s job at sf0.1, with
    # bit-identical centroid output (same avg/round expressions).
    mean_exprs = ", ".join(
        f"round(avg(cast({vec_col}[{i}] as double)), 6) AS m{i}"
        for i in range(dim))
    for _ in range(iters):
        assigned = _kmeans_assign_pass(df, cents, vec_col, id_col)
        stats = df.sparkSession.sql(
            f"SELECT cid, {mean_exprs} FROM {{a}} GROUP BY cid", a=assigned)
        new = {r["cid"]: [r[f"m{i}"] for i in range(dim)] for r in stats.collect()}
        cents = [new.get(c, cents[c]) for c in range(k)]
    return cents


def _kmeans_assign_pass(df: DataFrame, cents, vec_col: str, id_col: str,
                        with_dist: bool = False) -> DataFrame:
    """One assignment sweep: nearest centroid by squared L2, distances
    rounded to 6 decimals, ties to the lowest cluster id. numpy with
    sequential per-dimension accumulation — the same left-to-right
    float64 fold order the SQL oracle's list_sum produces."""
    C = [list(c) for c in cents]
    vec_type = df.schema[vec_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        import numpy as np
        import pandas as pd

        M = np.array(C, dtype=np.float64)          # k x dim
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            d2 = np.zeros((len(A), len(C)))
            for i in range(M.shape[1]):            # sequential per dimension
                diff = A[:, i:i + 1] - M[None, :, i]
                d2 += diff * diff
            # round half-away-from-zero (values are >= 0, so floor(+0.5))
            # — np.round is half-even, SQL round() is half-away; a d2
            # landing exactly on a .5 boundary would diverge otherwise
            d2 = np.floor(d2 * 1e6 + 0.5) / 1e6
            cid = np.argmin(d2, axis=1)            # first min → lowest cid
            out = {id_col: pdf[id_col], vec_col: pdf[vec_col],
                   "cid": cid.astype("int64")}
            if with_dist:
                out["dist2"] = np.floor(d2[np.arange(len(A)), cid] * 1e4 + 0.5) / 1e4
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_type}, {vec_col} {vec_type}, cid long"
    if with_dist:
        schema += ", dist2 double"
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(gen, schema=schema)


# per-task block-size ceiling for the within-cluster dense kernel: an
# 8192×8192 float64 cell is ~512 MB of dot matrix — bounded regardless
# of how skewed the cluster sizes are
CLUSTER_BLOCK_CAP = 8192


def semantic_dedup_pairs(df: DataFrame, k: int = 8, iters: int = 2,
                         threshold: float = 0.4, vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         max_cluster_block: int = CLUSTER_BLOCK_CAP) -> DataFrame:
    """SemDedup: k-means to LOCALIZE near-duplicates, then exact cosine
    pairs only WITHIN each cluster — the composition that turns the
    O(n²) all-pairs problem into k independent O((n/k)²) problems.

    Scale shape: ``kmeans_assign`` (zero vector shuffles, driver-held
    model) labels every vector; ONE fact shuffle co-locates the pair
    cells (groupBy → applyInPandas), and the pairwise kernel runs
    block-vectorized with the same sequential-fold cosine as
    ``cosine_pairs_exact``. Recall trade-off is explicit and testable:
    exactly the cross-cluster pairs are lost relative to the exact
    baseline (asserted in tests) — the SemDedup bargain: at 100 TB
    with k ~ corpus/4096 the within-cluster quadratic is tractable and
    near-duplicates overwhelmingly share a cluster.

    Per-cluster state is CAPPED: real embedding corpora skew (a
    near-constant-embedding subpopulation lands in one cluster), and a
    one-task-per-cluster kernel builds an n²-float64 matrix for its
    largest cluster — a 200k-row cluster is a 320 GB matrix.  Clusters
    above ``max_cluster_block`` rows are split into the triangular
    sub-block grid ``_cosine_pairs_grid`` uses (s = ceil(n/cap) salted
    blocks, each unordered pair meets in exactly one (ci, cj) cell), so
    per-task memory is O(cap²) however degenerate the clustering —
    and the hot cluster's quadratic parallelizes across its cells
    instead of serializing in one task.  Cold clusters (s = 1) collapse
    to a single diagonal cell: the uncapped plan.  The bipartite cell
    kernel folds dimensions left-to-right exactly like the old full-
    matrix kernel, so emitted cosines are bit-identical (asserted by a
    capped-vs-uncapped equality test on a skewed corpus).  Cluster
    sizes come from a map-side-combined count broadcast back onto the
    fact — no extra fact shuffle.

    Labeling is ONE vector-carrying mapInPandas pass over the trained
    centroids (``_kmeans_fit``'s driver-side model): the earlier shape
    — ``kmeans_assign`` then a big-big join of labels back onto the
    fact — paid a full extra scan + assign pass AND a two-sided
    shuffle join for data the assign pass already had in hand.  The
    labeled frame is persisted before the size aggregate: broadcasting
    ``sizes`` materializes the count in its own job, and without the
    persist that job AND the main pair job would each re-run the full
    scan + assign pass through the Python workers."""
    from covsonar_spark.operators.dedup import _persist_scoped

    cents = _kmeans_fit(df, k, iters, vec_col, id_col)
    with_cid = _persist_scoped(
        "semdedup_with_cid", _kmeans_assign_pass(df, cents, vec_col, id_col))

    sizes = with_cid.groupBy("cid").agg(F.greatest(
        F.lit(1),
        F.ceil(F.count(F.lit(1)) / F.lit(max_cluster_block))
    ).cast("int").alias("_s"))
    base = (with_cid.join(F.broadcast(sizes), "cid")
            .select(F.col("cid"),
                    F.col(id_col).cast("long").alias("_id"),
                    F.col(vec_col).alias("_v"), F.col("_s"))
            .withColumn("_blk", F.pmod(
                F.xxhash64(F.lit("semdedup-grid"), F.col("_id")),
                F.col("_s")).cast("int")))
    side_a = base.select(
        "cid", "_id", "_v", F.col("_blk").alias("ci"),
        F.explode(F.sequence(F.col("_blk"), F.col("_s") - 1)).alias("cj"),
        F.lit(0).alias("role"))
    side_b = base.where(F.col("_blk") > 0).select(
        "cid", "_id", "_v",
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("ci"),
        F.col("_blk").alias("cj"), F.lit(1).alias("role"))

    def score_cell(key, pdf):
        import numpy as np
        import pandas as pd

        cid, ci, cj = (int(x) for x in key)
        a = pdf[pdf["role"] == 0]
        bb = a if ci == cj else pdf[pdf["role"] == 1]
        if not len(a) or not len(bb):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cid": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        A = np.array([list(v) for v in a["_v"]], dtype=np.float64)
        B = np.array([list(v) for v in bb["_v"]], dtype=np.float64)
        a_ids = a["_id"].to_numpy(dtype=np.int64)
        b_ids = bb["_id"].to_numpy(dtype=np.int64)
        dot = np.zeros((len(A), len(B)))
        na2 = np.zeros(len(A))
        nb2 = np.zeros(len(B))
        for i in range(A.shape[1]):            # sequential: l-to-r fold
            dot += A[:, i:i + 1] * B[:, i]
            na2 += A[:, i] * A[:, i]
            nb2 += B[:, i] * B[:, i]
        cos = np.round(dot / (np.sqrt(na2)[:, None] * np.sqrt(nb2)[None, :]), 4)
        if ci == cj:
            ii, jj = np.nonzero((cos >= threshold)
                                & (a_ids[:, None] < b_ids[None, :]))
            lo, hi = a_ids[ii], b_ids[jj]
        else:
            # cross-block: each unordered pair lives in exactly this
            # cell — keep every hit, normalized to (min, max)
            ii, jj = np.nonzero(cos >= threshold)
            lo = np.minimum(a_ids[ii], b_ids[jj])
            hi = np.maximum(a_ids[ii], b_ids[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "cid": np.full(len(ii), cid, dtype=np.int64),
                             "cosine": cos[ii, jj]})

    return side_a.unionByName(side_b).groupBy("cid", "ci", "cj").applyInPandas(
        score_cell, schema="id_a long, id_b long, cid long, cosine double")


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------

PQ_M = 4        # subspaces
PQ_SUB = 16     # dims per subspace (PQ_M * PQ_SUB = embedding dim)
PQ_K = 16       # codes per subspace


def pq_topk(df: DataFrame, query_id: int = 0, k_top: int = 10,
            rerank_pool: int = 100,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Product-quantization ANN: train one tiny codebook per vector
    SUBSPACE, encode every vector as m small codes, and answer queries
    from a per-query lookup table — the compression half of IVF-PQ and
    the standard way to scan billions of vectors without touching the
    raw floats.

    At 100 TB the economics are the point: a 64-dim float vector is
    256 bytes; its PQ code is m=4 bytes — a 64x smaller scan, and the
    query-side work per vector is m LUT adds instead of a 64-dim dot
    product.  Plan shape: codebook init = one pushed-limit collect;
    ONE Lloyd refinement = one scan emitting (subspace, code, subvec)
    + a (m*k)-cell aggregate collected to the driver (the model is a
    driver artifact, vectors never shuffle); scoring = one final scan
    fused with exact re-rank distances; top-k via
    TakeOrderedAndProject.  Three scans total, zero vector shuffles.

    Cross-engine determinism (the oracle replays codebook training,
    encoding, and LUT scoring in chained CTEs): squared distances are
    rounded half-away to 6 decimals before every argmin (ties -> the
    lowest code id), refined centroid means round to 6, the LUT-sum
    approximation folds subspaces left-to-right and rounds to 6, and
    the exact re-rank distance folds dimensions left-to-right and
    rounds to 4 — the same fixpoint-rounding idiom as
    ``kmeans_assign``.
    """
    import numpy as np
    import pandas as pd

    init_rows = _centroids(df, PQ_K, vec_col, id_col)
    k_eff = len(init_rows)            # corpora smaller than PQ_K shrink the codebook
    init = [[[float(x) for x in vec[s * PQ_SUB:(s + 1) * PQ_SUB]]
             for _, vec in init_rows] for s in range(PQ_M)]   # m x k_eff x sub

    def _sub_d2(As: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
        d2 = np.zeros((len(As), len(C)))
        for i in range(PQ_SUB):                 # sequential per dimension
            diff = As[:, i:i + 1] - C[None, :, i]
            d2 += diff * diff
        return np.floor(d2 * 1e6 + 0.5) / 1e6   # round half-away, 6 dp

    def assign_gen(batches):
        C = [np.array(init[s], dtype=np.float64) for s in range(PQ_M)]
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            frames = []
            for s in range(PQ_M):
                As = A[:, s * PQ_SUB:(s + 1) * PQ_SUB]
                cid = np.argmin(_sub_d2(As, C[s]), axis=1)  # first min -> low cid
                frames.append(pd.DataFrame({
                    "s": np.full(len(As), s, dtype=np.int32),
                    "cid": cid.astype("int64"),
                    "sv": list(As),
                }))
            yield pd.concat(frames)

    assigned = df.select(id_col, vec_col).mapInPandas(
        assign_gen, "s int, cid long, sv array<double>")
    # parse-once SQL for the sub-dim mean agg (same Py4J-construction
    # saving as _kmeans_fit; identical avg/round expressions)
    stats = df.sparkSession.sql(
        "SELECT s, cid, " + ", ".join(
            f"round(avg(sv[{i}]), 6) AS m{i}" for i in range(PQ_SUB))
        + " FROM {a} GROUP BY s, cid", a=assigned)
    upd = {(r["s"], r["cid"]): [r[f"m{i}"] for i in range(PQ_SUB)]
           for r in stats.collect()}
    books = [[upd.get((s, c), init[s][c]) for c in range(k_eff)]
             for s in range(PQ_M)]

    qvec = [float(x) for x in
            df.where(F.col(id_col) == query_id).select(vec_col).first()[0]]
    # per-query LUT: d2(query subvector, refined centroid), same
    # sequential fold + half-away rounding as the executor kernel
    lut = []
    for s in range(PQ_M):
        qs = qvec[s * PQ_SUB:(s + 1) * PQ_SUB]
        row = []
        for c in range(len(books[s])):
            acc = 0.0
            for i in range(PQ_SUB):
                d = qs[i] - books[s][c][i]
                acc += d * d
            row.append(float(np.floor(acc * 1e6 + 0.5) / 1e6))
        lut.append(row)

    def score_gen(batches):
        C = [np.array(books[s], dtype=np.float64) for s in range(PQ_M)]
        L = [np.array(lut[s], dtype=np.float64) for s in range(PQ_M)]
        q = np.array(qvec, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            approx = np.zeros(len(A))
            for s in range(PQ_M):               # left-to-right over subspaces
                As = A[:, s * PQ_SUB:(s + 1) * PQ_SUB]
                cid = np.argmin(_sub_d2(As, C[s]), axis=1)
                approx = approx + L[s][cid]
            approx = np.floor(approx * 1e6 + 0.5) / 1e6
            exact = np.zeros(len(A))
            for i in range(PQ_M * PQ_SUB):      # left-to-right over dims
                diff = A[:, i] - q[i]
                exact += diff * diff
            exact = np.floor(exact * 1e4 + 0.5) / 1e4
            yield pd.DataFrame({id_col: pdf[id_col], "approx_d2": approx,
                                "exact_d2": exact})

    scored = df.select(id_col, vec_col).mapInPandas(
        score_gen, f"{id_col} long, approx_d2 double, exact_d2 double")
    # candidate pool by the compressed distance, then exact re-rank —
    # the standard PQ recall fix (approx ranking alone degrades on
    # unstructured vectors).  At scale the pool select scans ONLY the
    # m-byte codes; the exact distance is then computed for just the
    # pool via a semi-join against the raw vectors (fused into one
    # pass here because the demo corpus fits a single scan).  Both
    # top-k's are TakeOrderedAndProject — no global sort.
    pool = (scored.where(F.col(id_col) != query_id)
            .orderBy("approx_d2", id_col).limit(rerank_pool))
    return pool.orderBy("exact_d2", id_col).limit(k_top)
