"""Canonical schemas for the engine's logical tables (FIXTURES.md §2,
mirroring the reference DDL at /root/reference/lib/db.sqlite).

Layout-for-scale notes (100 TB):
  * ``genomes`` — partition by month(date); all metadata predicates
    (lineage, zip, date, lab, …) push down to the parquet scan, and
    date-range queries prune partitions.
  * ``profiles`` / variant tables — bucketed by seqhash so the
    genome⟕profile join and the dedup-ingest join are co-partitioned
    (no shuffle of the big side).
  * profiles keep the token arrays denormalized (the reference's core
    physical trick, lib/sonardb.py:1435-1440) so match is a scan, plus
    the exploded variant tables for restore/VCF paths.
"""

from __future__ import annotations

from pyspark.sql import types as T

METADATA_FIELDS = (
    "lineage", "zip", "gisaid", "ena", "source", "collection", "lab",
    "technology", "platform", "chemistry", "material", "software",
    "software_version",
)

GENOMES = T.StructType([
    T.StructField("accession", T.StringType(), False),
    T.StructField("description", T.StringType(), True),
    T.StructField("seqhash", T.StringType(), False),
    T.StructField("lineage", T.StringType(), True),
    T.StructField("zip", T.StringType(), True),
    T.StructField("date", T.DateType(), True),
    T.StructField("submission_date", T.DateType(), True),
    T.StructField("gisaid", T.StringType(), True),
    T.StructField("ena", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("collection", T.StringType(), True),
    T.StructField("lab", T.StringType(), True),
    T.StructField("technology", T.StringType(), True),
    T.StructField("platform", T.StringType(), True),
    T.StructField("chemistry", T.StringType(), True),
    T.StructField("material", T.StringType(), True),
    T.StructField("software", T.StringType(), True),
    T.StructField("software_version", T.StringType(), True),
    T.StructField("ct", T.DoubleType(), True),
    T.StructField("imported", T.TimestampType(), True),
])

PROFILES = T.StructType([
    T.StructField("seqhash", T.StringType(), False),
    T.StructField("dna_profile", T.ArrayType(T.StringType()), False),
    T.StructField("aa_profile", T.ArrayType(T.StringType()), False),
    T.StructField("fs_profile", T.ArrayType(T.StringType()), False),
    # 64-bit md5-derived bloom fingerprints of the token arrays —
    # match's necessary-condition prefilter (predicates.token_bloom)
    T.StructField("dna_bloom", T.LongType(), True),
    T.StructField("aa_bloom", T.LongType(), True),
])

DNA_VARIANTS = T.StructType([
    T.StructField("seqhash", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),   # 0-based; -1 = leading insertion
    T.StructField("end", T.IntegerType(), False),     # exclusive
    T.StructField("ref", T.StringType(), False),
    T.StructField("alt", T.StringType(), False),      # '' = deletion
])

PROT_VARIANTS = T.StructType([
    T.StructField("seqhash", T.StringType(), False),
    T.StructField("protein", T.StringType(), False),
    T.StructField("locus", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("ref", T.StringType(), False),
    T.StructField("alt", T.StringType(), False),
])

SEQUENCES = T.StructType([
    T.StructField("seqhash", T.StringType(), False),
    T.StructField("sequence", T.StringType(), False),
])

# `essence` output column order (reference view lib/db.sqlite:95-123;
# header = test/expected.csv:1)
ESSENCE_COLUMNS = (
    "accession", "description", "lab", "source", "collection", "technology",
    "platform", "chemistry", "material", "ct", "software", "software_version",
    "gisaid", "ena", "zip", "date", "submission_date", "lineage", "seqhash",
    "dna_profile", "aa_profile", "fs_profile",
)
