"""Pure-Python commit-log protocol tests (LocalFS — no SparkSession):
O(1)-read latest() resolution through the _last hint, vacuum retention
guards (superseded commit files honor min_age; legacy adopted dirs are
reaped once unreferenced), and the rename-rendezvous stale-lease break
where at most one concurrent acquirer proceeds."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from covsonar_spark.commitlog import CommitLog, StoreWriteConflict


def _log(tmp_path) -> CommitLog:
    root = str(tmp_path / "db")
    os.makedirs(root, exist_ok=True)
    return CommitLog(None, root)   # LocalFS path needs no SparkSession


class CountingFS:
    """Wraps the log's fs, counting read_bytes / list_names / exists."""

    def __init__(self, inner):
        self.inner = inner
        self.reads = 0
        self.lists = 0
        self.exists_calls = 0

    def read_bytes(self, path):
        self.reads += 1
        return self.inner.read_bytes(path)

    def list_names(self, path):
        self.lists += 1
        return self.inner.list_names(path)

    def exists(self, path):
        self.exists_calls += 1
        return self.inner.exists(path)

    def __getattr__(self, a):
        return getattr(self.inner, a)


def test_latest_resolves_1000_commit_log_in_two_reads(tmp_path):
    """The _last hint makes resolving the newest commit O(1) object
    reads — never a listing of the (here 1000-file) log directory."""
    log = _log(tmp_path)
    v = 0
    for i in range(1000):
        v = log.commit(v, {"genomes": [f"d{i}"]})
    assert v == 1000
    counter = CountingFS(log.fs)
    log.fs = counter
    got = log.latest()
    assert got[0] == 1000 and got[1] == {"genomes": ["d999"]}
    assert counter.lists == 0, "hinted resolution must not list _log/"
    assert counter.reads <= 2, f"{counter.reads} reads (hint + commit)"


def test_latest_heals_stale_hint_by_probing_forward(tmp_path):
    """A lagging hint (crash between commit rename and hint write, or
    out-of-order hint writers) is healed by exists() probes — the
    commit files, not the hint, are the source of truth."""
    log = _log(tmp_path)
    v = 0
    for i in range(5):
        v = log.commit(v, {"t": [f"d{i}"]})
    log.fs.write_bytes(f"{log.log_dir}/_last",
                       json.dumps({"version": 2}).encode())
    assert log.latest()[0] == 5
    # a TORN hint falls back to listing, same answer
    log.fs.write_bytes(f"{log.log_dir}/_last", b"{not json")
    assert log.latest()[0] == 5


def test_commit_conflict_and_unique_ids(tmp_path):
    log = _log(tmp_path)
    log.commit(0, {"t": ["a"]}, commit_id="cid-A")
    with pytest.raises(StoreWriteConflict):
        log.commit(0, {"t": ["b"]}, commit_id="cid-B")
    got = log.latest()
    assert got[2] == "cid-A"          # the winner's id, never the loser's
    assert log.read_commit(1)["id"] == "cid-A"


def test_vacuum_superseded_commit_files_honor_min_age(tmp_path):
    """A pinned time-travel reader may still need a superseded commit's
    METADATA while its data dirs are retained — commit files get the
    same min_age floor the data dirs do (round-6 review, low)."""
    log = _log(tmp_path)
    v = 0
    for i in range(5):
        v = log.commit(v, {"t": []})
    removed = log.vacuum({}, retain_last=2, min_age_s=3600.0)
    assert removed == 0
    assert log.versions() == [1, 2, 3, 4, 5]   # all younger than min_age
    log.vacuum({}, retain_last=2, min_age_s=0.0)
    assert log.versions() == [4, 5]


def test_vacuum_reaps_unreferenced_legacy_dir(tmp_path):
    """An adopted legacy plain dir whose table was later replaced
    through the log is superseded data: once NO retained snapshot
    references it (and it is old enough), vacuum deletes it — a
    replaced 100 TB legacy table must not strand a stale copy."""
    log = _log(tmp_path)
    root = log.root
    legacy = f"{root}/genomes"
    os.makedirs(legacy)
    with open(f"{legacy}/part-0.parquet", "w") as fh:
        fh.write("x")
    v = log.commit(0, {"genomes": [legacy]})          # adoption commit
    v = log.commit(v, {"genomes": [f"{root}/_data/genomes/c-1"]})  # replace
    # still referenced by retained v1: kept even at age 0
    assert log.vacuum({}, retain_last=2, min_age_s=0.0,
                      legacy_paths={"genomes": legacy}) == 0
    assert os.path.isdir(legacy)
    v = log.commit(v, {"genomes": [f"{root}/_data/genomes/c-2"]})
    # v1 out of retention; too young under the default floor: kept
    assert log.vacuum({}, retain_last=2, min_age_s=3600.0,
                      legacy_paths={"genomes": legacy}) == 0
    assert os.path.isdir(legacy)
    # old enough and unreferenced: reaped
    assert log.vacuum({}, retain_last=2, min_age_s=0.0,
                      legacy_paths={"genomes": legacy}) == 1
    assert not os.path.exists(legacy)


def test_stale_break_at_most_one_acquirer(tmp_path):
    """Two concurrent waiters diagnose the same stale lease: the
    rename-rendezvous break lets EXACTLY ONE of them acquire (the
    delete-then-recreate break this replaced let both through)."""
    log = _log(tmp_path)
    owner = log.acquire_lease()
    lock = f"{log.log_dir}/LOCK"
    old = time.time() - 10_000
    os.utime(lock, (old, old))        # holder "died" (no heartbeat)

    results: list[str] = []
    errors: list[BaseException] = []

    def contender():
        try:
            results.append(CommitLog(None, log.root).acquire_lease(
                timeout=2.0, lease_timeout=3600.0))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ts = [threading.Thread(target=contender) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 1, f"{len(results)} acquirers got the lease"
    assert len(errors) == 3
    assert all(isinstance(e, TimeoutError) for e in errors)
    assert owner not in results


def test_orphaned_break_rendezvous_is_gcd(tmp_path):
    """A breaker that crashed between its rename win and delete leaves
    LOCK.breaking behind; once it ages out, later breakers GC it and
    the lease stays breakable."""
    log = _log(tmp_path)
    log.acquire_lease()
    lock = f"{log.log_dir}/LOCK"
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    # simulate the crashed breaker's leftover rendezvous file
    log.fs.write_bytes(f"{lock}.breaking", b'{"owner": "dead"}')
    os.utime(f"{lock}.breaking", (old, old))
    got = log.acquire_lease(timeout=5.0)
    assert got
    assert not os.path.exists(f"{lock}.breaking")


def test_vacuum_keeps_latest_commit_always(tmp_path):
    log = _log(tmp_path)
    v = log.commit(0, {"t": []})
    log.vacuum({}, retain_last=0, min_age_s=0.0)   # clamped to 1
    assert log.versions() == [v]
    assert log.latest()[0] == v
