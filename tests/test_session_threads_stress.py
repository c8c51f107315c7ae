"""Randomized multi-thread hammer on ONE SonarStore handle: writer
threads mutate in a loop while reader threads continuously resolve the
table.  Invariants (the round-7 thread-scoping contract):

* a reader NEVER observes a partially-staged state — every count it
  sees corresponds to some COMMITTED version's row count;
* writer mutations serialize: the commit log is a linear version
  sequence with no lost updates;
* the handle survives the whole run (no deadlock from the session
  mutex, no leaked session state).

Bounded runtime: few threads, few rounds, tiny frames.
"""

from __future__ import annotations

import threading

from covsonar_spark.store import SonarStore

N_WRITER_ROUNDS = 4
N_READERS = 3


def test_threaded_readers_see_only_committed_states(spark, tmp_path):
    root = str(tmp_path / "db")
    store = SonarStore.open(spark, root)
    schema = store.table("genomes").schema

    def frame(n):
        row = tuple("v%d" % n if not f.nullable else None
                    for f in schema.fields)
        return spark.createDataFrame([row] * n, schema)

    # committed row counts, in commit order: 0 (fresh), then 1..N
    legal_counts = set(range(0, N_WRITER_ROUNDS + 1))
    stop = threading.Event()
    errors: list[str] = []

    def reader():
        while not stop.is_set():
            try:
                n = store.table("genomes").count()
            except Exception as exc:  # noqa: BLE001
                errors.append(f"reader raised: {exc!r}")
                return
            if n not in legal_counts:
                errors.append(f"reader saw uncommitted count {n}")
                return

    readers = [threading.Thread(target=reader) for _ in range(N_READERS)]
    for t in readers:
        t.start()
    writer_errors: list[str] = []

    def writer(round_no):
        try:
            with store._mutation_session():
                store._overwrite("genomes", frame(round_no))
        except Exception as exc:  # noqa: BLE001
            writer_errors.append(f"writer {round_no} raised: {exc!r}")

    # CONCURRENT writer threads in pairs (a trailing odd round runs
    # alone) — they must serialize on the session mutex + lease, each
    # round producing exactly ONE commit
    rounds = list(range(1, N_WRITER_ROUNDS + 1))
    for i in range(0, len(rounds), 2):
        batch = [threading.Thread(target=writer, args=(r,))
                 for r in rounds[i:i + 2]]
        for t in batch:
            t.start()
        for t in batch:
            t.join()
    stop.set()
    for t in readers:
        t.join()

    assert not errors, errors
    assert not writer_errors, writer_errors
    # linear history, one commit per writer invocation (4 rounds -> the
    # paired loop runs writer 4 times at N_WRITER_ROUNDS=4: rounds
    # 1,2,3,4), versions strictly consecutive — no lost update
    versions = [h["version"] for h in store.history()]
    assert versions == list(range(1, len(versions) + 1))
    assert len(versions) == N_WRITER_ROUNDS
    # final state is whichever writer of the last pair committed last —
    # either way a fully-committed frame
    assert store.table("genomes").count() in (N_WRITER_ROUNDS - 1,
                                              N_WRITER_ROUNDS)
