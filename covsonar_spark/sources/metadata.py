"""Metadata sources — the `update` subcommand inputs (S2/S3).

Reference: generic CSV/TSV with per-field column remapping and
upper-casing of categorical values (sonar.py:770-853), plus the
pangolin-output special case (sonar.py:795-802: accession = first word
of "Sequence name", lineage = "Lineage").

Spark-first: ``spark.read.csv`` keeps the parse distributed (the
reference DictReader-loops the whole file in the driver); empty cells
become NULL so the merge never overwrites with blanks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fields whose values the reference upper-cases on the way in
UPPERCASED = {
    "lineage", "collection", "source", "lab", "technology", "chemistry",
    "platform", "software", "software_version", "material",
}
DATES = {"date", "submission_date"}


def read_metadata_csv(spark: SparkSession, path: str, fields: dict[str, str],
                      sep: str = ",") -> DataFrame:
    """``fields`` maps engine column → source column, e.g.
    ``{"accession": "acc", "lineage": "pango", "ct": "ct_value"}``.
    Returns one row per accession with only the mapped columns."""
    if "accession" not in fields:
        raise ValueError("fields must map 'accession'")
    raw = spark.read.csv(path, header=True, sep=sep)
    cols = []
    for target, source in fields.items():
        c = F.col(source)
        # reference treats empty strings as "no update" (falsy check)
        c = F.when(F.trim(c) == "", None).otherwise(c)
        if target in UPPERCASED:
            c = F.upper(c)
        elif target == "ct":
            c = c.try_cast("double")   # ANSI mode: plain cast throws on junk
        elif target in DATES:
            c = c.try_cast("date")
        cols.append(c.alias(target))
    df = raw.select(*cols).where(F.col("accession").isNotNull())
    return _dedup_accessions(df)


def _dedup_accessions(df: DataFrame) -> DataFrame:
    """One row per accession, DETERMINISTICALLY: the reference keeps
    the FIRST file-order occurrence (sonar.py:808-810), but a
    distributed read has no row order and dropDuplicates keeps an
    arbitrary one — so ties resolve by the lexicographically smallest
    row instead (documented divergence; any fixed rule beats a
    nondeterministic one)."""
    others = [c for c in df.columns if c != "accession"]
    packed = df.groupBy("accession").agg(
        F.min(F.struct(*[F.col(c) for c in others])).alias("_row"))
    return packed.select("accession",
                         *[F.col(f"_row.{c}").alias(c) for c in others])


def read_pangolin_csv(spark: SparkSession, path: str) -> DataFrame:
    """Pangolin output: key = first word of `Sequence name`, value =
    `Lineage` (sonar.py:795-802)."""
    raw = spark.read.csv(path, header=True, sep=",")
    return _dedup_accessions(raw.select(
        F.split(F.col("Sequence name"), " ")[0].alias("accession"),
        F.col("Lineage").alias("lineage"),
    ).where(F.col("accession").isNotNull()))


def validate_ct(spark: SparkSession, path: str, fields: dict[str, str],
                sep: str = ",") -> list[str]:
    """Reference exits on any non-float ct (sonar.py:841-852); here:
    return the offending accessions so the caller decides."""
    if "ct" not in fields:
        return []
    if "accession" not in fields:
        raise ValueError("validate_ct needs an accession column mapping "
                         "to report offenders (fields['accession'])")
    raw = spark.read.csv(path, header=True, sep=sep)
    bad = raw.select(F.col(fields["accession"]).alias("accession"),
                     F.col(fields["ct"]).alias("ct_raw")) \
             .where((F.trim(F.col("ct_raw")) != "") & F.col("ct_raw").isNotNull()
                    & F.col("ct_raw").try_cast("double").isNull())
    return [r["accession"] for r in bad.collect()]
