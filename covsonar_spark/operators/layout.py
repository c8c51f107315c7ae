"""Physical table layout for the 100 TB tier: bucketing, sort-on-write,
and partition pruning — the Spark-native replacements for the
reference's hand-tuned physical design (17 B-tree indexes + WITHOUT
ROWID clustered PKs, /root/reference/lib/db.sqlite:34-50; SURVEY §4).

Columnar scans + predicate pushdown already replace the secondary
indexes (no explicit structure needed). What pushdown canNOT replace is
join-time data movement: every genome⟕profile / lineitem⋈orders
equi-join shuffles both sides on the key, every time, unless the tables
are CO-LOCATED on disk. Bucketing is that co-location:

  * ``bucketBy(n, key)`` at write time hash-splits each table into the
    same n buckets by join key — Spark's murmur3 on the key, the same
    hash a shuffle would use;
  * two tables bucketed by the same key into the same bucket count
    satisfy the join's required distribution AT SCAN TIME: the
    SortMergeJoin's Exchange nodes vanish from the plan (asserted in
    tests/test_layout.py). At 100 TB that's the difference between
    re-shuffling ~both tables per query and reading them join-ready;
  * ``sortBy(key)`` additionally pre-sorts within each bucket file so
    the merge-join's Sort nodes read pre-ordered runs;
  * equality predicates on the bucket key prune to ONE bucket per scan
    ("SelectedBucketsCount: 1 out of n" in the plan) — the point-lookup
    path (accession → bucket) the reference served with its PK B-tree.

Sizing rule of thumb at the 100 TB tier: pick n_buckets so one bucket
of the biggest bucketed table is ~128-512 MB of parquet (e.g. 30 TB of
lineitem → 65k buckets); bucket counts must match across co-joined
tables, so fix them per join-key domain (seqhash: one count, orderkey:
one count) and scale by powers of two when the corpus grows.

Bucketed tables require the session catalog (``saveAsTable``, not
``save``): bucket metadata lives in the table definition. Pass
``path=`` to keep the data external to the warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and by default sorted-within-bucket)
    catalog table keyed for shuffle-free equi-joins on ``key``."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the
    catalog; a plain ``spark.read.parquet`` of the same files would
    lose it and re-shuffle at join time)."""
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key_left: str, key_right: str, how: str = "inner") -> DataFrame:
    """Equi-join two co-bucketed tables. With matching bucket counts on
    the join keys this plans as a zero-Exchange SortMergeJoin: each
    task merge-joins bucket i of both tables in place."""
    left, right = spark.table(left_table), spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right], how)


# ---------------------------------------------------------------------------
# Z-order (space-filling-curve) file layout
# ---------------------------------------------------------------------------

Z_BITS = 16


def with_zorder(df: DataFrame, c1: str, c2: str,
                lo1, hi1, lo2, hi2, bits: int = Z_BITS,
                out: str = "_z") -> DataFrame:
    """Attach the Morton/Z-value of (c1, c2): each column is
    normalized to a ``bits``-wide integer grid against the given
    bounds, then the bits interleave (c1 even positions, c2 odd).
    The interleave is a codegen'd SQL fold over bit positions — no
    UDF, no shuffle.

    Sorting by this value clusters rows that are close in BOTH
    dimensions into the same files, so file-level min/max statistics
    prune 2-D box predicates — a single-column sort can only ever
    prune its own column (measured in tests/test_layout.py: the
    z-ordered layout reads a fraction of the files the linear layout
    reads for the same box query)."""
    from pyspark.sql import functions as F

    def grid(c, lo, hi):
        if float(hi) == float(lo):      # zero spread: one cell, no 0-div
            return F.lit(0).cast("long")
        scaled = (F.coalesce(F.col(c).cast("double"), F.lit(float(lo)))
                  - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
        # NULLs map to the MIN corner explicitly (least/greatest would
        # silently clamp them to the max cell and pollute its stats)
        cell = F.floor(scaled * (1 << bits)).cast("long")
        return F.greatest(F.least(cell, F.lit((1 << bits) - 1)), F.lit(0))

    interleave = (
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc + shiftleft(shiftright(_zg_a, i) & 1, CAST(2*i AS INT)) "
        f"    + shiftleft(shiftright(_zg_b, i) & 1, CAST(2*i + 1 AS INT)))")
    return (df.withColumn("_zg_a", grid(c1, lo1, hi1))
              .withColumn("_zg_b", grid(c2, lo2, hi2))
              .withColumn(out, F.expr(interleave))
              .drop("_zg_a", "_zg_b"))


def write_zordered(df: DataFrame, path: str, c1: str, c2: str,
                   n_cells: int) -> None:
    """Write ``df`` clustered on the Z-curve of (c1, c2) into
    ``n_cells`` equal z-space cells (hive directories) — one curve
    segment per cell.  Bounds come from a column-pruned min/max scan
    (the histogram operator's two-pass shape).

    Cell assignment is the TOP bits of the z-value — deterministic,
    unlike repartitionByRange's sampled boundaries, so layouts are
    byte-stable across runs (reruns of a 100 TB compaction job must
    not move rows between files).  Equal z-space cells can be
    row-skewed where the data is; size n_cells so the hottest cell
    still fits a task, or recurse on hot cells (kd-style split) —
    the classic trade against sampled range boundaries."""
    from pyspark.sql import functions as F

    # cells are curve-contiguous top-bit ranges, so the actual cell
    # count rounds UP to the next power of two (2^n_bits) — folding
    # the excess back with pmod would glue spatially distant curve
    # segments into one file and break min/max pruning
    n_bits = max(1, (n_cells - 1).bit_length())
    bounds = df.agg(F.min(c1), F.max(c1), F.min(c2), F.max(c2)).first()
    if bounds[0] is None:               # empty input: nothing to write
        df.write.mode("overwrite").parquet(path)
        return
    lo1, hi1, lo2, hi2 = bounds
    z = with_zorder(df, c1, c2, lo1, hi1, lo2, hi2)
    cell = F.expr(f"shiftright(_z, {2 * Z_BITS - n_bits})")
    (z.withColumn("_zcell", cell)
      .repartition(n_cells, "_zcell")
      .sortWithinPartitions("_zcell", "_z")
      .drop("_z")
      .write.mode("overwrite").partitionBy("_zcell").parquet(path))
