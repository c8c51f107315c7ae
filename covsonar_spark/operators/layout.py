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
