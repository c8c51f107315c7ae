"""Lineage taxonomy build — the `update-lineage-info` job (T17/T18).

Reference: lib/Lineages_UPDATER.py downloads pango-designation data,
uncompresses aliases (Aliasor, :26-76), then finds every lineage's
descendants with a triple nested loop over all uncompressed names
(:105-164) — O(n² · depth) in the driver.

Spark design: descendants(P) = { C : uncompressed(C) startswith
uncompressed(P) + "." }. That is one self-join with a prefix predicate
and a group-aggregate — the O(n²) pair space is distributed, and
Catalyst turns the startswith into a cheap comparison per pair. At
pango scale (thousands) this is instant; the same plan holds for
millions of taxa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Aliasor:
    """Pango alias compress/uncompress (Lineages_UPDATER.py:26-76),
    framework-free: ``alias_map`` maps alias letter → full prefix
    (e.g. ``{"BA": "B.1.1.529"}``)."""

    def __init__(self, alias_map: dict[str, str]):
        self.alias_dict = {k: (v if v else k) for k, v in alias_map.items()}
        self.realias_dict = {v: k for k, v in self.alias_dict.items()}

    def uncompress(self, name: str) -> str:
        if not name:
            return ""
        parts = name.split(".")
        full = self.alias_dict.get(parts[0])
        if full is None or len(parts) == 1:
            return name
        return full + "." + ".".join(parts[1:])

    def compress(self, name: str) -> str:
        parts = name.split(".")
        levels = len(parts) - 1
        num_indirections = (levels - 1) // 3
        if num_indirections <= 0:
            return name
        alias = ".".join(parts[: 3 * num_indirections + 1])
        ending = ".".join(parts[3 * num_indirections + 1:])
        return self.realias_dict.get(alias, alias) + "." + ending


def build_sublineage_table(spark: SparkSession, lineages: list[str],
                           alias_map: dict[str, str] | None = None) -> DataFrame:
    """T18 as a self-join: one row per lineage with its full descendant
    set (compressed names, reference output format lineage.all.tsv)."""
    aliasor = Aliasor(alias_map or {})
    rows = [(lin, aliasor.uncompress(lin)) for lin in sorted(set(lineages)) if lin]
    base = spark.createDataFrame(rows, "lineage string, unc string")
    parent = base.select(F.col("lineage").alias("p_lineage"),
                         F.col("unc").alias("p_unc"))
    child = base.select(F.col("lineage").alias("c_lineage"),
                        F.col("unc").alias("c_unc"))
    pairs = parent.join(
        child, F.col("c_unc").startswith(F.concat(F.col("p_unc"), F.lit("."))))
    # lts ordering key (zero-pad numeric segments of the uncompressed
    # name, Lineages_UPDATER.py:79-84) as a pure column expression
    k = F.array_join(F.transform(
        F.split("c_unc", "\\."),
        lambda p: F.when(p.rlike("^[0-9]+$"), F.lpad(p, 6, "0")).otherwise(p)), ".")
    closed = pairs.withColumn("k", k).groupBy(
        F.col("p_lineage").alias("lineage")).agg(
        F.transform(F.array_sort(F.collect_list(F.struct("k", "c_lineage"))),
                    lambda s: s["c_lineage"]).alias("subs"))
    out = base.select("lineage").join(closed, "lineage", "left").select(
        "lineage",
        F.when(F.col("subs").isNull(), F.array().cast("array<string>"))
         .otherwise(F.col("subs")).alias("subs"))
    return out.select(
        "lineage",
        F.when(F.size("subs") == 0, F.lit("none"))
         .otherwise(F.concat_ws(",", "subs")).alias("sublineage"),
    ).orderBy("lineage")


def load_sublineage_map(path: str) -> dict[str, list[str]]:
    """Read a lineage.all.tsv-format file into the broadcastable
    lineage → direct+transitive sublineages map the match engine uses
    (reference sonarDB.lineage_sublineage_dict, lib/sonardb.py:2213-2218)."""
    out: dict[str, list[str]] = {}
    with open(path) as fh:
        header = fh.readline()
        assert header.rstrip("\n").split("\t")[:2] == ["lineage", "sublineage"]
        for line in fh:
            lin, subs = line.rstrip("\n").split("\t")[:2]
            out[lin] = [] if subs == "none" else subs.split(",")
    return out
