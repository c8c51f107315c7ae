"""Shared covsonar-domain test fixtures: a 4-genome corpus modeled on the
reference's CI fixtures (FIXTURES.md §1/§3) without requiring the
alignment stage."""

from __future__ import annotations

import datetime as dt

from covsonar_spark.schemas import GENOMES, PROFILES


def _g(acc, seqhash, lineage=None, zip_=None, date=None, lab=None, source=None,
       collection=None, technology=None, platform=None, chemistry=None,
       material=None, software=None, software_version=None, ct=None,
       gisaid=None, ena=None, description=None):
    return {
        "accession": acc, "description": description or acc, "seqhash": seqhash,
        "lineage": lineage, "zip": zip_, "date": date, "submission_date": None,
        "gisaid": gisaid, "ena": ena, "source": source, "collection": collection,
        "lab": lab, "technology": technology, "platform": platform,
        "chemistry": chemistry, "material": material, "software": software,
        "software_version": software_version, "ct": ct,
        "imported": dt.datetime(2021, 2, 1, 12, 0, 0),
    }


GENOME_ROWS = [
    _g("NC_045512.2", "hash_ref", lineage="B", zip_="99999",
       date=dt.date(2019, 12, 30), source="GENBANK", lab="L1"),
    _g("test1", "hash_1", lineage="B.1.1.7", zip_="01778",
       date=dt.date(2021, 1, 12), lab="L1", source="DESH", collection="RANDOM",
       technology="ILLUMINA", platform="MISEQ", chemistry="FLEX",
       material="SWAP", software="COVPIPE", software_version="3.0.5", ct=22.5,
       gisaid="g1", ena="e1"),
    _g("test2", "hash_2", lineage="B.1.1.189", zip_="01777",
       date=dt.date(2021, 1, 24), lab="L2", source="DESH", collection="SUSPECT",
       technology="ILLUMINA", platform="MISEQ", chemistry="FLEX",
       material="SWAP", software="COVPIPE", software_version="3.0.5", ct=28.0,
       gisaid="g2", ena="e2"),
    _g("test3", "hash_3", lineage="B.1.177", zip_="10115",
       date=dt.date(2021, 2, 2), lab="L3", source="LAB", collection="RANDOM",
       technology="NANOPORE", platform="MINION", ct=19.0),
]

PROFILE_ROWS = [
    {"seqhash": "hash_ref", "dna_profile": [], "aa_profile": [], "fs_profile": []},
    {"seqhash": "hash_1",
     "dna_profile": ["C241T", "C3267T", "del:11288:9", "del:21765:6", "A23063T"],
     "aa_profile": ["ORF1a:T1001I", "S:del:68:3", "S:N501Y", "S:D614G"],
     "fs_profile": []},
    {"seqhash": "hash_2",
     "dna_profile": ["C241T", "G1820A", "del:21765:6", "A23403G"],
     "aa_profile": ["ORF1a:G519S", "S:D614G"],
     "fs_profile": []},
    {"seqhash": "hash_3",
     "dna_profile": ["C241T", "A23403G", "del:21765:5", "G29000W", "A29001N"],
     "aa_profile": ["S:D614G", "N:A35X"],
     "fs_profile": ["del:21765:5"]},
]

SUBLINEAGES = {
    "B.1.1": ["B.1.1.7", "B.1.1.189"],
    "B.1": ["B.1.1", "B.1.177"],
    "B": ["B.1"],
}


def essence_df(spark):
    from covsonar_spark.operators.match import build_essence

    genomes = spark.createDataFrame(GENOME_ROWS, GENOMES)
    profiles = spark.createDataFrame(PROFILE_ROWS, PROFILES)
    return build_essence(genomes, profiles)
