"""Property-fuzz time travel against MATERIALIZED history (round-6
verdict #8): for a random interleaving of append / metadata-update /
remove / re-add / optimize mutations, ``match_at(q, v)`` must equal the
match result materialized at the instant commit ``v`` published — for
every retained version and for wildcard, literal and date queries.
Runs on a plain LOCAL root: the round-7 unification gives posix stores
the same MVCC history as object-store roots."""

from __future__ import annotations

import datetime
import random

import pytest

from covsonar_spark.operators.match import MatchQuery
from covsonar_spark.store import _SCHEMAS, SonarStore

LINS = ["L.1", "L.1.2", "L.2", "M.3"]


def _genome_row(i: int, lin: str):
    return (f"ACC{i:03d}", None, f"h{i}", lin,
            str(10000 + i), datetime.date(2021, 1 + i % 6, 1 + i % 27),
            None, None, None, None, None, None, None, None,
            None, None, None, None, None, None)


def _profile_row(i: int):
    return (f"h{i}", [f"C{100 + i % 7}T"], [], [], None, None)


QUERIES = [
    ("all", MatchQuery()),
    ("wildcard", MatchQuery(lineages=["L.1%"])),
    ("literal", MatchQuery(lineages=["L.2"])),
    ("dated", MatchQuery(dates=["2021-01-01:2021-03-31"])),
]


def _materialize(st: SonarStore) -> dict[str, set]:
    out = {}
    for name, q in QUERIES:
        out[name] = {(r["accession"], r["lineage"])
                     for r in st.match(q).select(
                         "accession", "lineage").collect()}
    return out


@pytest.mark.parametrize("seed", [11, 23, 37, 41, 59, 73])
def test_match_at_equals_materialized_history(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / "db")
    st = SonarStore.open(spark, root)

    alive: dict[int, str] = {}      # genome id -> lineage
    next_id = 0

    def frames(ids):
        g = spark.createDataFrame(
            [_genome_row(i, alive[i]) for i in ids], _SCHEMAS["genomes"])
        p = spark.createDataFrame(
            [_profile_row(i) for i in ids], _SCHEMAS["profiles"])
        return g, p

    # v1: seed population
    for _ in range(8):
        alive[next_id] = rng.choice(LINS)
        next_id += 1
    with st._mutation_session():
        g, p = frames(sorted(alive))
        st._append("genomes", g)
        st._append("profiles", p)

    history = [(st._log.latest()[0], _materialize(st))]
    removed_pool: list[int] = []

    # 12 steps so the log crosses the v11 checkpoint boundary: the
    # tail of history resolves through DELTA commits chained to a
    # checkpoint, not just full snapshots (round-8 compaction)
    for _step in range(12):
        op = rng.choice(["append", "relabel", "remove", "readd",
                         "optimize", "vacuum"])
        if op == "append":
            new = []
            for _ in range(rng.randint(1, 3)):
                alive[next_id] = rng.choice(LINS)
                new.append(next_id)
                next_id += 1
            with st._mutation_session():
                g, p = frames(new)
                st._append("genomes", g)
                st._append("profiles", p)
        elif op == "relabel" and alive:
            picks = rng.sample(sorted(alive), min(3, len(alive)))
            for i in picks:
                alive[i] = rng.choice(LINS)
            st.update_metadata(spark.createDataFrame(
                [(f"ACC{i:03d}", alive[i]) for i in picks],
                "accession string, lineage string"))
        elif op == "remove" and len(alive) > 2:
            picks = rng.sample(sorted(alive), rng.randint(1, 2))
            st.remove([f"ACC{i:03d}" for i in picks])
            for i in picks:
                removed_pool.append(i)
                del alive[i]
        elif op == "readd" and removed_pool:
            i = removed_pool.pop()
            alive[i] = rng.choice(LINS)
            with st._mutation_session():
                g, p = frames([i])
                st._append("genomes", g)
                st._append("profiles", p)
        elif op == "vacuum":
            # GC is a first-class mutation class: retention must keep
            # every surviving version's DELTA CHAIN resolvable while
            # reaping older data — and must drop vacuumed versions
            # from the model (their dirs may be gone)
            keep = rng.randint(2, 4)
            st.vacuum(retain_last=keep, min_age_s=0.0)
            latest_v = st._log.latest()[0]
            history = [(v, m) for v, m in history
                       if v > latest_v - keep]
            continue              # vacuum publishes no commit
        else:
            st.optimize(rows_per_file=50)
        history.append((st._log.latest()[0], _materialize(st)))

    # versions are linear and every retained version's match_at equals
    # what match() returned the moment that commit was the latest
    assert [v for v, _m in history] == sorted({v for v, _m in history})
    for v, want in history:
        for name, q in QUERIES:
            got = {(r["accession"], r["lineage"])
                   for r in st.match_at(q, v).select(
                       "accession", "lineage").collect()}
            assert got == want[name], \
                f"seed {seed} version {v} query {name}"
