"""End-to-end ingest → match → restore on the reference's own CI corpus
(test.fasta + test2.fasta), validated against expected.csv /
expected2.csv / expected3.csv — the Spark twin of reference test.sh."""

from __future__ import annotations

import csv

import pytest

from covsonar_spark.functions.genetics import harmonize, parse_gff3, read_fasta_one
from covsonar_spark.operators.match import MatchQuery
from covsonar_spark.operators.restore import restore_genomes
from covsonar_spark.sources.fasta import read_fasta
from covsonar_spark.store import SonarStore

REF_DIR = "/root/reference"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    _, _, ref = read_fasta_one(f"{REF_DIR}/lib/ref.fna")
    ref = harmonize(ref)
    cds = parse_gff3(f"{REF_DIR}/lib/ref.gff3", ref)
    st = SonarStore(spark, str(tmp_path_factory.mktemp("sonar_db")), ref, cds)
    records = read_fasta(spark, [f"{REF_DIR}/test/test.fasta",
                                 f"{REF_DIR}/test/test2.fasta"])
    report = st.add_fasta_df(records)
    assert report["errors"] == {}
    assert report["paranoid_mismatches"] == []
    assert report["added_accessions"] == 4
    return st


def test_counts(store):
    assert store.table("genomes").count() == 4
    assert store.table("sequences").count() == 4
    assert store.table("profiles").count() == 4


def test_match_profiles_vs_expected_csv(store):
    exp = {r["accession"]: r
           for r in csv.DictReader(open(f"{REF_DIR}/test/expected.csv"))}
    rows = {r["accession"]: r for r in store.match(MatchQuery(
        accessions=list(exp))).collect()}
    assert set(rows) == set(exp)
    for acc, e in exp.items():
        got = rows[acc]
        assert " ".join(got["dna_profile"]) == e["dna_profile"].strip(), acc
        assert " ".join(got["aa_profile"]) == e["aa_profile"].strip(), acc
        assert " ".join(got["fs_profile"]) == e["fs_profile"].strip(), acc
        assert got["seqhash"] == e["seqhash"], acc


def test_match_ambig_vs_expected3_csv(store):
    row = next(csv.DictReader(open(f"{REF_DIR}/test/expected3.csv")))
    got = store.match(MatchQuery(frameshifts=1, ambig=True)).collect()
    assert len(got) == 1
    g = got[0]
    assert g["accession"] == "test3"
    assert " ".join(g["dna_profile"]) == row["dna_profile"].strip()
    assert " ".join(g["aa_profile"]) == row["aa_profile"].strip()
    assert " ".join(g["fs_profile"]) == row["fs_profile"].strip()


def test_frameshift_counts(store):
    # test.sh:163-171 — 3 genomes without frameshifts
    n = store.match(MatchQuery(frameshifts=-1, count=True)).collect()[0]["count"]
    assert n == 3


def test_restore_round_trip(store):
    # test.sh:184-193 — restore byte-equals the input FASTA sequence
    _, _, want = read_fasta_one(f"{REF_DIR}/test/test2.fasta")
    got = restore_genomes(store, ["test3"]).collect()[0]
    assert got["sequence"] == harmonize(want)
    # every accession round-trips
    restored = {r["accession"]: r["sequence"]
                for r in restore_genomes(store).collect()}
    assert len(restored) == 4


def test_readd_is_idempotent(store, spark):
    # re-adding the same corpus creates no new sequences and keeps counts
    records = read_fasta(spark, [f"{REF_DIR}/test/test.fasta"])
    report = store.add_fasta_df(records)
    assert report["new_sequences"] == 0
    assert store.table("genomes").count() == 4
    assert store.table("profiles").count() == 4


def test_conflicting_sequence_rejected(store, spark):
    bad = spark.createDataFrame(
        [("test1", "test1 desc", "ACGT" * 100)],
        "accession string, description string, sequence string")
    with pytest.raises(ValueError, match="different"):
        store.add_fasta_df(bad)
