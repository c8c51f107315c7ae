"""Match-engine semantics tests, pinned to the reference's test.sh
assertions (SURVEY §5, FIXTURES §3) on a synthetic 4-genome corpus."""

from __future__ import annotations

import pytest

from covsonar_spark.operators.match import MatchEngine, MatchQuery

from tests.fixtures import SUBLINEAGES, essence_df


@pytest.fixture(scope="module")
def engine(spark):
    return MatchEngine(essence_df(spark), SUBLINEAGES)


def accs(df):
    return sorted(r["accession"] for r in df.select("accession").collect())


def test_match_all(engine):
    assert accs(engine.run(MatchQuery())) == ["NC_045512.2", "test1", "test2", "test3"]


def test_profile_and_group(engine):
    q = MatchQuery(profiles=[["C241T", "del:21765:6"]])
    assert accs(engine.run(q)) == ["test1", "test2"]


def test_profile_aa(engine):
    q = MatchQuery(profiles=[["S:N501Y"]])
    assert accs(engine.run(q)) == ["test1"]


def test_profile_mixed_dna_aa_group(engine):
    q = MatchQuery(profiles=[["C241T", "S:D614G"]])
    assert accs(engine.run(q)) == ["test1", "test2", "test3"]


def test_profile_or_groups(engine):
    q = MatchQuery(profiles=[["S:N501Y"], ["G1820A"]])
    assert accs(engine.run(q)) == ["test1", "test2"]


def test_profile_exclude(engine):
    q = MatchQuery(profiles=[["C241T"]], exclude_profiles=[["A23063T"]])
    assert accs(engine.run(q)) == ["test2", "test3"]


def test_iupac_ambiguity_expansion(engine):
    # G29000W covers G29000A/G29000T/G29000W; test3 carries G29000W literally
    q = MatchQuery(profiles=[["G29000W"]])
    assert accs(engine.run(q)) == ["test3"]
    # A searched explicit variant does NOT match the stored ambiguous call
    q = MatchQuery(profiles=[["G29000A"]])
    assert accs(engine.run(q)) == []


def test_trailing_N_wildcard_flips_group_to_or(engine):
    # A29001N ends in N → group (A29001N, C999999T) becomes OR → test3 matches
    q = MatchQuery(profiles=[["A29001N", "C999999T"]])
    assert accs(engine.run(q)) == ["test3"]


def test_aa_X_any_change(engine):
    # N:A35X matches any change at N:35 — test3 stores N:A35X itself
    q = MatchQuery(profiles=[["N:A35X"]])
    assert accs(engine.run(q)) == ["test3"]


def test_metadata_filters(engine):
    q = MatchQuery(dates=["2021-01-01:2021-01-31"], profiles=[["C241T"]])
    assert accs(engine.run(q)) == ["test1", "test2"]
    q = MatchQuery(accessions=["test2"])
    assert accs(engine.run(q)) == ["test2"]
    q = MatchQuery(zips=["0177"])
    assert accs(engine.run(q)) == ["test1", "test2"]
    q = MatchQuery(accessions=["^NC_045512.2"], lineages=["^B.1.177"])
    assert accs(engine.run(q)) == ["test1", "test2"]
    q = MatchQuery(min_ct=20.0, max_ct=25.0)
    assert accs(engine.run(q)) == ["test1"]


def test_date_negation(engine):
    q = MatchQuery(dates=["^2021-01-01:2021-01-31"])
    assert accs(engine.run(q)) == ["NC_045512.2", "test3"]


def test_lineage_wildcard(engine):
    # LIKE semantics: B.1.177 also starts with 'B.1.1'
    q = MatchQuery(lineages=["B.1.1%"])
    assert accs(engine.run(q)) == ["test1", "test2", "test3"]
    q = MatchQuery(lineages=["B.1.1.%"])
    assert accs(engine.run(q)) == ["test1", "test2"]


def test_sublineage_closure(engine):
    q = MatchQuery(lineages=["B.1"], with_sublineage=True)
    assert accs(engine.run(q)) == ["test1", "test2", "test3"]
    q = MatchQuery(lineages=["B.1.1"], with_sublineage=True)
    assert accs(engine.run(q)) == ["test1", "test2"]


def test_frameshift_tristate(engine):
    assert accs(engine.run(MatchQuery(frameshifts=1))) == ["test3"]
    assert accs(engine.run(MatchQuery(frameshifts=-1))) == ["NC_045512.2", "test1", "test2"]


def test_count(engine):
    rows = engine.run(MatchQuery(profiles=[["C241T"]], count=True)).collect()
    assert rows[0]["count"] == 3


def test_software_version_requires_software(engine):
    with pytest.raises(ValueError):
        engine.run(MatchQuery(software_version="3.0.5"))


def test_ambig_output_filter(engine):
    # default: ambiguous terminal calls dropped from output profiles
    q = MatchQuery(accessions=["test3"])
    row = engine.run(q).collect()[0]
    assert "G29000W" not in row["dna_profile"]
    assert "A29001N" not in row["dna_profile"]
    assert "del:21765:5" in row["dna_profile"]      # deletions kept
    assert "N:A35X" not in row["aa_profile"]
    # --ambig keeps everything
    row = engine.run(MatchQuery(accessions=["test3"], ambig=True)).collect()[0]
    assert "G29000W" in row["dna_profile"] and "N:A35X" in row["aa_profile"]
    # searched tokens survive the filter
    row = engine.run(MatchQuery(profiles=[["G29000W"]])).collect()[0]
    assert "G29000W" in row["dna_profile"]


def test_essence_projection_columns(engine):
    from covsonar_spark.schemas import ESSENCE_COLUMNS

    df = engine.run(MatchQuery(accessions=["test1"]))
    assert tuple(df.columns) == ESSENCE_COLUMNS


def test_wildcard_expansion_overflow_stays_distributed(spark, monkeypatch):
    """Round-5 verdict item: a %-pattern whose distinct expansion
    exceeds the semi-join threshold must never be collected to the
    driver — expand_lineages returns a DataFrame and the match applies
    it as a (semi/anti) join with identical results."""
    import datetime

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from covsonar_spark.operators import predicates as P
    from covsonar_spark.operators.match import (MatchEngine, MatchQuery,
                                                expand_lineages)
    from covsonar_spark.schemas import GENOMES

    rows = []
    for i in range(40):
        # mix of Q.* (wildcard hits), R.* (exclude survivors) and NULL
        lin = (None if i % 10 == 0
               else f"R.{i}" if i % 7 == 0 else f"Q.{i % 8}")
        rows.append((f"ACC{i}", None, f"h{i}", lin, None,
                     datetime.date(2021, 1, 1 + i % 27), None, None,
                     None, None, None, None, None, None, None, None,
                     None, None, None, None))
    genomes = spark.createDataFrame(rows, schema=GENOMES)
    profiles = spark.createDataFrame(
        [(f"h{i}", [], [], [], None, None) for i in range(40)],
        "seqhash string, dna_profile array<string>, "
        "aa_profile array<string>, fs_profile array<string>, "
        "dna_bloom long, aa_bloom long")
    from covsonar_spark.operators.match import build_essence

    essence = build_essence(genomes, profiles)
    eng = MatchEngine(essence, {"Q.1": ["Q.1.1"]})

    expect_inc = sorted(
        r["accession"] for r in eng.run(
            MatchQuery(lineages=["Q.%"])).select("accession").collect())
    expect_exc = sorted(
        r["accession"] for r in eng.run(
            MatchQuery(lineages=["^Q.%"])).select("accession").collect())
    assert expect_inc and expect_exc

    monkeypatch.setattr(P, "IN_SEMIJOIN_THRESHOLD", 3)   # Q.% → 8 values
    resolved = expand_lineages(essence, ["Q.%"], False, {})
    assert isinstance(resolved, DataFrame)               # stayed a plan

    got_inc = sorted(
        r["accession"] for r in eng.run(
            MatchQuery(lineages=["Q.%"])).select("accession").collect())
    got_exc = sorted(
        r["accession"] for r in eng.run(
            MatchQuery(lineages=["^Q.%"])).select("accession").collect())
    assert got_inc == expect_inc
    # NOT-IN NULL semantics preserved: NULL lineages match neither path
    assert got_exc == expect_exc
    assert not any(r["lineage"] is None for r in eng.run(
        MatchQuery(lineages=["^Q.%"])).select("lineage").collect())

    # closure composes with the distributed path (broadcast edge join)
    with_sub = eng.run(MatchQuery(lineages=["Q.1%"], with_sublineage=True))
    lit = eng.run(MatchQuery(lineages=["Q.1", "Q.1.1"]))
    assert sorted(r["accession"] for r in with_sub.collect()) == \
        sorted(r["accession"] for r in lit.collect())
