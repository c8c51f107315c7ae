"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
training-data corpora (one document object per line).

The reference has no JSON surface (SURVEY §2.1 covers FASTA/CSV/TSV/
GFF3); this is beyond-reference capability for the curation pipeline.

Scale notes (100 TB):
  * ALWAYS pass an explicit schema: schema inference is a full extra
    scan of the data before the real one — read_jsonl requires it.
  * plain and .gz JSONL split the same way as text: plain files split
    by byte range (newline-delimited records make any split valid);
    .gz is one task per file — shard corpora into many files;
  * corrupt lines land in ``_corrupt_record`` (PERMISSIVE mode) and
    are counted, not dropped silently — a curation pipeline must
    account for every input line;
  * the sink writes one file per partition — repartition() to target
    shard sizes (~256 MB is the planner-friendly sweet spot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = ("doc_id long, text string, lang string, "
                    "source string, n_chars long")


def read_jsonl(spark: SparkSession, path: str, schema: str,
               keep_corrupt: bool = True) -> DataFrame:
    """Schema-explicit JSONL read; corrupt lines are retained in
    ``_corrupt_record`` when keep_corrupt (count them downstream)."""
    full = schema + (", _corrupt_record string" if keep_corrupt else "")
    reader = (spark.read.schema(full)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record"))
    return reader.json(path)


def corrupt_line_count(df: DataFrame) -> int:
    """How many input lines failed to parse (must be accounted for).
    Spark refuses queries that touch ONLY ``_corrupt_record`` on a raw
    JSON scan (the parser would have nothing to fail on) — counting
    against the fully-parsed cached frame is the documented pattern."""
    if "_corrupt_record" not in df.columns:
        return 0
    # respect a cache the CALLER established: only add (and later drop)
    # our own if the frame is not already persisted
    own_cache = df.storageLevel.useMemory is False and \
        df.storageLevel.useDisk is False
    if own_cache:
        df = df.cache()
    try:
        return df.where(F.col("_corrupt_record").isNotNull()).count()
    finally:
        if own_cache:
            df.unpersist()


def write_jsonl(df: DataFrame, path: str, *, shards: int | None = None,
                compression: str | None = None) -> None:
    """One JSONL file per partition; repartition to control shard
    count/size, optional gzip for cold storage."""
    if shards:
        df = df.repartition(shards)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
