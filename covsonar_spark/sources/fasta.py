"""FASTA source (S1): plain / .gz / .xz multi-record files → DataFrame
(accession, description, sequence).

Scale shape (reference parses records in a driver loop, sonar.py:496-509;
here the read is distributed two ways):

- **Plain (and .gz) files** go through Spark's text source with the
  record delimiter set to ``"\\n>"`` — one row per FASTA record straight
  off the scan, parsed with JVM column expressions (no Python). For
  uncompressed files the text source SPLITS inside a single giant file,
  so one 1 TB concatenated FASTA fans out across the whole cluster;
  .gz decompresses per-file (codec limitation) but still parallelizes
  across files.
- **.xz files** (no Hadoop codec) fall back to parallelizing the path
  list and parsing per file with a Python generator — right granularity
  for many small compressed uploads, which is what .xz is used for.
"""

from __future__ import annotations

import gzip
import lzma

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FASTA_SCHEMA = T.StructType([
    T.StructField("accession", T.StringType(), False),
    T.StructField("description", T.StringType(), False),
    T.StructField("sequence", T.StringType(), False),
])


def _open(path: str, compressed: str = "auto"):
    fmt = compressed
    if fmt == "auto":
        fmt = "gz" if path.endswith(".gz") else \
              "xz" if path.endswith(".xz") else "none"
    if fmt == "gz":
        return gzip.open(path, "rt")
    if fmt == "xz":
        return lzma.open(path, "rt")
    return open(path)


def iter_fasta_records(path: str, compressed: str = "auto"):
    header, chunks = None, []
    with _open(path, compressed) as fh:
        for line in fh:
            line = line.rstrip()
            if line.startswith(">"):
                if header is not None:
                    yield header.split(" ")[0], header, "".join(chunks)
                header, chunks = line[1:], []
            elif line:
                chunks.append(line)
    if header is not None:
        yield header.split(" ")[0], header, "".join(chunks)


def read_fasta_splittable(spark: SparkSession,
                          paths: list[str] | str,
                          partitions: int | None = None) -> DataFrame:
    """Splittable FASTA scan: ``spark.read.text`` with record delimiter
    ``"\\n>"`` yields one row per record (the first record of each file
    keeps its leading ``>``, stripped below), then pure column
    expressions slice header vs body. Whole-stage-codegen end to end;
    a single multi-TB uncompressed FASTA parallelizes by HDFS split.
    ``partitions`` forces a fan-out before the parse expressions — for
    corpora smaller than one HDFS split (< maxPartitionBytes) that
    would otherwise run the whole parse + every downstream stage on a
    single core.
    """
    raw = spark.read.option("lineSep", "\n>").text(paths)
    if partitions:
        raw = raw.repartition(partitions)
    rec = raw.select(F.regexp_replace("value", "^>", "").alias("rec")) \
             .where(F.length(F.trim("rec")) > 0)
    header = F.regexp_replace(F.substring_index("rec", "\n", 1), "\r$", "")
    body = F.when(F.instr("rec", "\n") > 0,
                  F.expr("substring(rec, instr(rec, '\n') + 1)")) \
            .otherwise(F.lit(""))
    out = rec.select(
        F.substring_index(header, " ", 1).alias("accession"),
        header.alias("description"),
        F.translate(body, "\n\r ", "").alias("sequence"),
    )
    # legacy ';'/'#' comment preambles before the first '>' become a
    # pseudo-record under the lineSep split (the Python iter path just
    # ignores them); dropping comment-marked accessions keeps the two
    # paths agreeing. Preamble that mimics sequence data is not
    # detectable post-split — FASTA files should start with '>'.
    return out.where(~F.col("accession").rlike("^[;#]"))


def read_fasta(spark: SparkSession, paths: list[str] | str,
               partitions: int | None = None,
               compressed: str = "auto") -> DataFrame:
    """Distributed FASTA read. Plain/.gz paths use the splittable text
    scan; .xz (not codec-decodable in the JVM) parses per file on
    executors. Mixed lists are unioned — both branches produce
    FASTA_SCHEMA. ``compressed`` mirrors the reference's ``add
    --compressed`` (none/gz/xz/auto): a non-auto value overrides
    extension detection and routes through the Python parser, since the
    JVM scan trusts extensions for codec selection.
    """
    if isinstance(paths, str):
        paths = [paths]
    if compressed != "auto":
        n = partitions or min(len(paths), 256)
        rdd = spark.sparkContext.parallelize(paths, n) \
            .flatMap(lambda p: iter_fasta_records(p, compressed))
        return spark.createDataFrame(rdd, FASTA_SCHEMA)
    xz = [p for p in paths if p.endswith(".xz")]
    rest = [p for p in paths if not p.endswith(".xz")]
    parts = []
    if not rest and not xz:
        return spark.createDataFrame([], FASTA_SCHEMA)
    if rest:
        parts.append(read_fasta_splittable(spark, rest, partitions=partitions))
    if xz:
        n = partitions or min(len(xz), 256)
        rdd = spark.sparkContext.parallelize(xz, n).flatMap(iter_fasta_records)
        parts.append(spark.createDataFrame(rdd, FASTA_SCHEMA))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
