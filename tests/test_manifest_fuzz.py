"""Randomized equivalence fuzz for the file-manifest pruning paths:
for random small stores (random lineages / dates / zips / ct /
profiles, clustered so pruning actually fires) and random MatchQuery
mixes (includes, excludes, wildcards, sublineage closure, date ranges,
zip prefixes, ct ranges, profile groups), a match through the
manifests must return exactly the rows of the manifest-free engine.
This is the property the per-case tests in test_manifest.py sample;
here it is hammered across the query grammar."""

from __future__ import annotations

import datetime
import os
import random

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.match import MatchEngine, MatchQuery
from covsonar_spark.store import SonarStore, _SCHEMAS


def _store(spark, root: str, rng: random.Random, n: int = 90,
           correlate: bool = True):
    """``correlate=False`` draws the date month INDEPENDENTLY of the
    lineage band — the anti-correlated layout where a date range can
    prune away every file holding a wildcard's lineages (the round-5
    review's divergence class, which the correlated layout can never
    trigger)."""
    st = SonarStore.open(spark, root)
    # taxonomy: L.0..L.3 children of L, so with_sublineage has closure
    st.sublineage_map = {"L": [f"L.{k}" for k in range(4)],
                         **{f"L.{k}": [] for k in range(4)}}
    genomes, profiles = [], []
    for i in range(n):
        k = i % 4
        dk = rng.randrange(4) if not correlate else k
        lin = rng.choice([f"L.{k}", f"L.{k}", None])
        date = (None if rng.random() < 0.15 else
                datetime.date(2021, 2 * dk + 1, 1 + rng.randrange(27)))
        zipc = None if rng.random() < 0.2 else str(10000 * (k + 1)
                                                   + rng.randrange(90))
        ct = None if rng.random() < 0.3 else float(10 * k + rng.randrange(5))
        genomes.append((f"ACC{i}", None, f"h{i}", lin, zipc, date, None,
                        None, None, None, None, None, None, None, None,
                        None, None, None, ct, None))
        toks = [f"C{k * 100 + 10 + rng.randrange(7)}T",
                f"C{k * 100 + 50}T"]
        if rng.random() < 0.2:
            toks.append("C999N")            # ambiguity-tail token
        profiles.append((f"h{i}", toks, [f"S:N{k * 100 + 501}Y"], [],
                         None, None))
    spark.createDataFrame(genomes, schema=_SCHEMAS["genomes"]) \
        .repartitionByRange(4, "lineage", "date") \
        .write.parquet(os.path.join(root, "genomes"))
    gdf = spark.createDataFrame(profiles, schema=_SCHEMAS["profiles"])
    gdf.withColumn("band", F.expr("cast(substring(seqhash, 2) as int) % 4")) \
        .repartitionByRange(4, "band").drop("band") \
        .write.parquet(os.path.join(root, "profiles"))
    st.build_manifest("genomes")
    st.build_manifest("profiles")
    return st


def _random_query(rng: random.Random, narrow_wildcards: bool = False) -> MatchQuery:
    q = MatchQuery()
    k = rng.randrange(4)
    if rng.random() < 0.6:
        pool = [f"L.{k}", f"L.{(k + 1) % 4}", "L.%", "l.1%", "^L.2",
                "ZZZ%", "L"]
        if narrow_wildcards:
            # single-band wildcards: the expansion set lives in few
            # files, so date/zip pruning can remove ALL of them — the
            # pruned-expansion divergence trigger
            pool += [f"L.{k}%", f"L.{(k + 2) % 4}%"]
        q.lineages = rng.sample(pool, rng.randrange(1, 3))
        q.with_sublineage = rng.random() < 0.4
    if rng.random() < 0.5:
        m = 2 * k + 1
        a = f"2021-{m:02d}-01"
        b = f"2021-{m:02d}-{rng.choice([10, 27]):02d}"
        spec = rng.choice([f"{a}:{b}", a, f"^{a}:{b}"])
        q.dates = [spec]
    if rng.random() < 0.3:
        q.zips = [rng.choice([str(10000 * (k + 1))[:3],
                              f"^{10000 * (k + 1)}"])]
    if rng.random() < 0.3:
        q.min_ct = float(10 * k)
        if rng.random() < 0.5:
            q.max_ct = q.min_ct + rng.choice([2.0, 40.0])
    if rng.random() < 0.6:
        tok = f"C{k * 100 + 50}T"
        grp = [tok] if rng.random() < 0.7 else [tok, f"C{k * 100 + 12}T"]
        if rng.random() < 0.25:
            grp = [f"S:N{k * 100 + 501}Y"]
        q.profiles = [grp]
        if rng.random() < 0.3:
            q.profiles.append([f"C{((k + 2) % 4) * 100 + 50}T"])
    if rng.random() < 0.25:
        q.exclude_profiles = [[f"C{((k + 1) % 4) * 100 + 50}T"]]
    if rng.random() < 0.2:
        q.count = True
    return q


@pytest.mark.parametrize("seed", range(12))
def test_pruned_match_equals_unpruned(spark, tmp_path, seed):
    rng = random.Random(1000 + seed)
    st = _store(spark, str(tmp_path / "db"), rng)
    plain = MatchEngine(st.essence(), st.sublineage_map)
    for _ in range(6):
        q = _random_query(rng)
        try:
            exp = sorted(map(tuple, plain.run(q).collect()))
        except ValueError:
            continue                        # invalid spec: engine raises
        got = sorted(map(tuple, st.match(q).collect()))
        assert got == exp, f"query diverged under pruning: {q}"


@pytest.mark.parametrize("seed", range(6))
def test_pruned_match_equals_unpruned_anticorrelated(spark, tmp_path, seed):
    """Anti-correlated lineage⊥date layout + single-band wildcards:
    hammers the round-5 divergence class (pruning removes every file
    holding a wildcard's lineages → the engine's expansion must still
    run over the FULL table, or the lineage predicate is dropped)."""
    rng = random.Random(7000 + seed)
    st = _store(spark, str(tmp_path / "db"), rng, correlate=False)
    plain = MatchEngine(st.essence(), st.sublineage_map)
    for _ in range(6):
        q = _random_query(rng, narrow_wildcards=True)
        try:
            exp = sorted(map(tuple, plain.run(q).collect()))
        except ValueError:
            continue
        got = sorted(map(tuple, st.match(q).collect()))
        assert got == exp, f"query diverged under pruning: {q}"
