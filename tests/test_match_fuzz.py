"""Metamorphic fuzz of the match engine: 40 seeded random corpora /
query combinations checked against algebraic laws the reference
semantics guarantee — complementation, monotonicity, range splitting,
closure containment, count consistency.  Complements the golden
test.sh replay (exact expected rows on the reference corpus) with
properties that hold on ANY corpus."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from covsonar_spark.operators.match import MatchEngine, MatchQuery, build_essence

from tests.fixtures import SUBLINEAGES, _g

_DNA = ["C241T", "G1820A", "A23063T", "A23403G", "del:21765:6",
        "del:11288:9", "C3267T", "G29000T"]
_AA = ["S:N501Y", "S:D614G", "ORF1a:T1001I", "N:A35K", "S:del:68:3"]
_LIN = ["B", "B.1", "B.1.1", "B.1.1.7", "B.1.1.189", "B.1.177"]
_LABS = ["L1", "L2", "L3", "L4"]
_ZIPS = ["01778", "01777", "10115", "99999"]


def _corpus(rng: random.Random, n: int = 60):
    genomes, profiles = [], []
    for i in range(n):
        acc, sh = f"g{i:03d}", f"h{i:03d}"
        genomes.append(_g(
            acc, sh,
            lineage=rng.choice(_LIN),
            zip_=rng.choice(_ZIPS),
            date=dt.date(2021, rng.randint(1, 3), rng.randint(1, 28)),
            lab=rng.choice(_LABS),
            ct=round(rng.uniform(15, 35), 1)))
        dna = sorted(rng.sample(_DNA, rng.randint(0, 5)))
        aa = sorted(rng.sample(_AA, rng.randint(0, 3)))
        fs = [t for t in dna if t == "del:21765:6" and rng.random() < 0.3]
        profiles.append({"seqhash": sh, "dna_profile": dna,
                         "aa_profile": aa, "fs_profile": fs})
    return genomes, profiles


@pytest.fixture(scope="module")
def fuzz_engine(spark):
    from covsonar_spark.schemas import GENOMES, PROFILES

    rng = random.Random(20260814)
    genomes, profiles = _corpus(rng)
    ess = build_essence(spark.createDataFrame(genomes, GENOMES),
                        spark.createDataFrame(profiles, PROFILES))
    return MatchEngine(ess.cache(), SUBLINEAGES)


def _accs(engine, q):
    return frozenset(r["accession"]
                     for r in engine.run(q).select("accession").collect())


def test_negation_partitions_the_corpus(fuzz_engine):
    """For every dimension: include(X) and include(^X) partition the
    rows where the dimension's semantics make them complementary."""
    rng = random.Random(1)
    everything = _accs(fuzz_engine, MatchQuery())
    for dim, vals in [("lineages", _LIN), ("labs", _LABS)]:
        for _ in range(5):
            v = rng.choice(vals)
            pos = _accs(fuzz_engine, MatchQuery(**{dim: [v]}))
            neg = _accs(fuzz_engine, MatchQuery(**{dim: [f"^{v}"]}))
            assert pos | neg == everything and not (pos & neg)


def test_extra_or_group_grows_extra_and_token_shrinks(fuzz_engine):
    rng = random.Random(2)
    for _ in range(8):
        base_tok = rng.choice(_DNA)
        extra_tok = rng.choice(_AA)
        base = _accs(fuzz_engine, MatchQuery(profiles=[[base_tok]]))
        wider = _accs(fuzz_engine,
                      MatchQuery(profiles=[[base_tok], [extra_tok]]))
        narrower = _accs(fuzz_engine,
                         MatchQuery(profiles=[[base_tok, extra_tok]]))
        assert narrower <= base <= wider


def test_metadata_conjunction_is_intersection(fuzz_engine):
    rng = random.Random(3)
    for _ in range(6):
        lin, lab = rng.choice(_LIN), rng.choice(_LABS)
        both = _accs(fuzz_engine, MatchQuery(lineages=[lin], labs=[lab]))
        assert both == (_accs(fuzz_engine, MatchQuery(lineages=[lin]))
                        & _accs(fuzz_engine, MatchQuery(labs=[lab])))


def test_date_range_splits(fuzz_engine):
    whole = _accs(fuzz_engine, MatchQuery(dates=["2021-01-01:2021-03-28"]))
    left = _accs(fuzz_engine, MatchQuery(dates=["2021-01-01:2021-02-14"]))
    right = _accs(fuzz_engine, MatchQuery(dates=["2021-02-15:2021-03-28"]))
    assert left | right == whole and not (left & right)


def test_ct_range_is_interval_algebra(fuzz_engine):
    wide = _accs(fuzz_engine, MatchQuery(min_ct=15.0, max_ct=35.0))
    narrow = _accs(fuzz_engine, MatchQuery(min_ct=20.0, max_ct=30.0))
    assert narrow <= wide


def test_sublineage_closure_contains_plain(fuzz_engine):
    for lin in ("B.1", "B.1.1"):
        plain = _accs(fuzz_engine, MatchQuery(lineages=[lin]))
        closed = _accs(fuzz_engine,
                       MatchQuery(lineages=[lin], with_sublineage=True))
        assert plain <= closed


def test_count_matches_row_count(fuzz_engine):
    rng = random.Random(4)
    for _ in range(5):
        q = MatchQuery(lineages=[rng.choice(_LIN)],
                       labs=[rng.choice(_LABS)])
        rows = len(_accs(fuzz_engine, q))
        qc = MatchQuery(lineages=q.lineages, labs=q.labs, count=True)
        assert fuzz_engine.run(qc).first()["count"] == rows


def test_include_then_exclude_same_group_is_empty(fuzz_engine):
    rng = random.Random(5)
    for _ in range(5):
        tok = rng.choice(_DNA)
        both = _accs(fuzz_engine, MatchQuery(
            profiles=[[tok]], exclude_profiles=[[tok]]))
        assert both == frozenset()
