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


# -- round-8 checkpoint + delta compaction ----------------------------------

def _chain(log, n, model=None, v=0, cp=None):
    """Drive n commits the way the store does: thread base_tables +
    base_checkpoint from each latest() into the next commit.  Mutation
    mix: append a dir to t1 every commit, replace t2 every 3rd, drop/
    re-add t3 every 7th.  Returns (version, model_history dict)."""
    model = dict(model or {})
    hist = {}
    for i in range(n):
        snap = log.latest()
        base_tables = dict(snap[1]) if snap else {}
        base_cp = getattr(snap, "checkpoint", None) if snap else None
        model = {t: list(d) for t, d in base_tables.items()}
        model.setdefault("t1", [])
        model["t1"] = model["t1"] + [f"{log.root}/_data/t1/c-{v + i}"]
        if i % 3 == 2:
            model["t2"] = [f"{log.root}/_data/t2/c-{v + i}"]
        if i % 7 == 6:
            model.pop("t3", None)
        elif i % 7 == 3:
            model["t3"] = [f"{log.root}/_data/t3/c-{v + i}"]
        new_v = log.commit(snap[0] if snap else 0, model,
                           base_tables=base_tables if snap else None,
                           base_checkpoint=base_cp)
        hist[new_v] = {t: list(d) for t, d in model.items()}
    return hist


def test_checkpoint_cadence_and_delta_bodies(tmp_path):
    """v1 is a full snapshot; the next CHECKPOINT_INTERVAL-1 commits
    are deltas chaining to it; then a fresh full snapshot — and an
    append-only delta carries ONLY the appended dirs, so per-commit
    metadata bytes stay bounded however long the log and however wide
    the store."""
    from covsonar_spark.commitlog import CHECKPOINT_INTERVAL as CI

    log = _log(tmp_path)
    hist = _chain(log, 2 * CI + 3)
    fulls = [v for v in sorted(hist)
             if "tables" in log.read_commit(v)]
    assert fulls == [1, CI + 1, 2 * CI + 1]
    # delta bodies: the pure-append commits carry only the new t1 dir
    raw = log.read_commit(2)
    assert "tables" not in raw and raw["checkpoint"] == 1
    assert set(raw["delta"]) == {"add"}
    assert list(raw["delta"]["add"]) == ["t1"]
    assert len(raw["delta"]["add"]["t1"]) == 1
    # a replace shows up as "set", a drop as "del"
    assert "set" in log.read_commit(3)["delta"]          # i=2 → t2
    assert "del" in log.read_commit(7)["delta"]          # i=6 → t3


def test_resolve_reconstructs_every_version(tmp_path):
    """resolve(v) equals the independently-maintained model at EVERY
    version, full or delta — and snapshot()/latest() agree with it."""
    log = _log(tmp_path)
    hist = _chain(log, 17)
    for v, want in hist.items():
        assert log.resolve(v)["tables"] == want, v
        assert log.snapshot(v) == want
    newest = max(hist)
    got = log.latest()
    assert got[0] == newest and got[1] == hist[newest]
    assert got.checkpoint == ((newest - 1) // 10) * 10 + 1


def test_latest_stays_o1_reads_on_checkpointed_log(tmp_path):
    """The _last hint embeds the resolved snapshot: resolving the
    newest commit of a long delta-compacted log costs ONE read (the
    hint), never a chain walk or a listing."""
    log = _log(tmp_path)
    hist = _chain(log, 25)
    counter = CountingFS(log.fs)
    log.fs = counter
    got = log.latest()
    assert got[0] == 25 and got[1] == hist[25]
    assert counter.lists == 0
    assert counter.reads <= 1, counter.reads
    # a LAGGING hint (crash between rename and hint write) heals by
    # reading only the missing suffix
    log.fs = counter.inner
    log.fs.write_bytes(
        f"{log.log_dir}/_last",
        json.dumps({"version": 23, "id": "x",
                    "checkpoint": 21,
                    "tables": log.resolve(23)["tables"]}).encode())
    counter = CountingFS(log.fs)
    log.fs = counter
    got = log.latest()
    assert got[0] == 25 and got[1] == hist[25]
    assert counter.reads <= 3 and counter.lists == 0


def test_legacy_version_only_hint_falls_back(tmp_path):
    """A pre-r8 hint ({"version": n} without tables) can't anchor a
    delta roll-forward: latest() falls back to the listing + chain
    walk and still answers correctly."""
    log = _log(tmp_path)
    hist = _chain(log, 13)
    log.fs.write_bytes(f"{log.log_dir}/_last",
                       json.dumps({"version": 13}).encode())
    got = log.latest()
    assert got[0] == 13 and got[1] == hist[13]


def test_resolve_range_reads_are_bounded(tmp_path):
    """history(limit=n)'s resolver walks ONE chain for all requested
    versions: reads ≤ span + CHECKPOINT_INTERVAL even when every
    requested version is a delta."""
    log = _log(tmp_path)
    hist = _chain(log, 28)
    counter = CountingFS(log.fs)
    log.fs = counter
    got = log.resolve_range([26, 27, 28])
    assert set(got) == {26, 27, 28}
    for v in got:
        assert got[v]["tables"] == hist[v]
    # chain: checkpoint 21 + deltas 22..28 (+1 raw re-read of 26)
    assert counter.reads <= 10, counter.reads
    assert counter.lists == 0


def test_vacuum_keeps_retained_versions_delta_chains(tmp_path):
    """Commit-file GC never deletes a file a retained delta still
    chains through: after vacuum, every retained version still
    resolves — and the chain files older than the oldest retained
    version's checkpoint ARE deleted."""
    log = _log(tmp_path)
    hist = _chain(log, 25)           # checkpoints at 1, 11, 21
    log.vacuum({}, retain_last=2, min_age_s=0.0)
    vs = log.versions()
    assert vs[0] == 21 and vs[-1] == 25    # 24's chain starts at 21
    for v in (24, 25):
        assert log.resolve(v)["tables"] == hist[v]
    # the hint survived; latest still one read
    counter = CountingFS(log.fs)
    log.fs = counter
    assert log.latest()[0] == 25
    assert counter.reads <= 1
    # resolving a vacuumed version fails loudly, not wrongly
    with pytest.raises(ValueError):
        log.resolve(12)


def test_direct_commit_without_base_stays_full(tmp_path):
    """Callers that don't thread base_tables (first commit, adoption,
    tests, external tools) always get full snapshots — the pre-r8
    behavior, still valid."""
    log = _log(tmp_path)
    v = log.commit(0, {"t": ["a"]})
    v = log.commit(v, {"t": ["a", "b"]})
    for ver in (1, 2):
        assert "tables" in log.read_commit(ver)
    assert log.latest()[1] == {"t": ["a", "b"]}


def test_10k_commit_log_bounded_metadata_and_o1_reads(tmp_path):
    """Round-8 done-criterion: a 10k-commit log (the long-lived
    frequently-updated store the all-full-snapshot design degraded on)
    keeps per-commit metadata bytes BOUNDED — every delta commit stays
    tiny regardless of log length, full snapshots appear exactly every
    CHECKPOINT_INTERVAL commits — while latest() still resolves in ≤1
    read and a bounded-window history resolve stays O(window)."""
    from covsonar_spark.commitlog import CHECKPOINT_INTERVAL as CI

    log = _log(tmp_path)
    n = 10_000
    snap = None
    for i in range(n):
        snap = log.latest()
        base = dict(snap[1]) if snap else {}
        cp = getattr(snap, "checkpoint", None) if snap else None
        # optimized-store shape: compact dir lists (replace, not
        # unbounded append) — dir-list growth is a table property
        # optimize() owns, not a log property
        tables = {"genomes": [f"{log.root}/_data/genomes/c-{i}"],
                  "profiles": [f"{log.root}/_data/profiles/c-{i}"]}
        log.commit(snap[0] if snap else 0, tables,
                   base_tables=base if snap else None,
                   base_checkpoint=cp)
    sizes = {}
    fulls = 0
    for v in (1, 2, CI, CI + 1, n // 2, n - 1, n):
        raw = log.fs.read_bytes(log._commit_path(v))
        sizes[v] = len(raw)
        if "\"tables\"" in raw.decode():
            fulls += 1
    # deltas stay small at any depth; fulls only at the cadence
    for v, s in sizes.items():
        if (v - 1) % CI == 0:
            continue
        assert s < 600, (v, s)
    assert fulls == sum(1 for v in sizes if (v - 1) % CI == 0)
    counter = CountingFS(log.fs)
    log.fs = counter
    got = log.latest()
    assert got[0] == n
    assert counter.reads <= 1 and counter.lists == 0
    counter.reads = 0
    got = log.resolve_range(list(range(n - 4, n + 1)))
    assert len(got) == 5
    assert counter.reads <= 5 + CI + 1, counter.reads
    assert counter.lists == 0


# -- round-8 second review pass: retention-floor precision ------------------

def _replace_chain(log, n):
    """n commits, each REPLACING table t1's single dir (d1, d2, …) —
    real dirs on disk so vacuum's mtime checks engage."""
    snap = None
    for i in range(1, n + 1):
        snap = log.latest()
        base = dict(snap[1]) if snap else {}
        cp = getattr(snap, "checkpoint", None) if snap else None
        d = f"{log.root}/_data/t1/c-{i:04d}"
        os.makedirs(d, exist_ok=True)
        log.commit(snap[0] if snap else 0, {"t1": [d]},
                   base_tables=base if snap else None,
                   base_checkpoint=cp)
    return [f"{log.root}/_data/t1/c-{i:04d}" for i in range(1, n + 1)]


def test_floor_rises_exactly_past_broken_versions(tmp_path):
    """Vacuum raises the retention floor only past the versions whose
    data it ACTUALLY deletes: sub-retention versions whose dirs are
    still min-age-protected stay time-travelable."""
    log = _log(tmp_path)
    dirs = _replace_chain(log, 5)            # v1..v5 → d1..d5
    old = time.time() - 7200
    for d in dirs[:2]:                       # age ONLY d1, d2
        os.utime(d, (old, old))
    log.vacuum({"t1": f"{log.root}/_data/t1"},
               retain_last=2, min_age_s=3600.0)
    assert not os.path.exists(dirs[0]) and not os.path.exists(dirs[1])
    assert os.path.exists(dirs[2])           # min-age protected
    assert log.data_floor() == 3             # past v2, NOT to keep_vs[0]
    assert log.resolve(3)["tables"] == {"t1": [dirs[2]]}
    with pytest.raises(ValueError, match="retention floor"):
        log.resolve(2)
    # the next vacuum that reaps d3 moves the floor past v3
    os.utime(dirs[2], (old, old))
    log.vacuum({"t1": f"{log.root}/_data/t1"},
               retain_last=2, min_age_s=3600.0)
    assert log.data_floor() == 4
    with pytest.raises(ValueError, match="retention floor"):
        log.resolve(3)


def test_garbage_only_vacuum_leaves_floor_alone(tmp_path):
    """Reaping uncommitted garbage (a crashed writer's staged dir,
    referenced by NO version) or reaping nothing must not move the
    floor — optimize() vacuums after every mutation."""
    log = _log(tmp_path)
    dirs = _replace_chain(log, 4)
    garbage = f"{log.root}/_data/t1/c-garbage"
    os.makedirs(garbage)
    old = time.time() - 7200
    os.utime(garbage, (old, old))
    assert log.vacuum({"t1": f"{log.root}/_data/t1"},
                      retain_last=2, min_age_s=3600.0) == 1
    assert not os.path.exists(garbage)
    assert log.data_floor() == 1             # nothing referenced died
    assert log.resolve(1)["tables"] == {"t1": [dirs[0]]}
    # a no-op vacuum (everything young) is also floor-neutral
    log.vacuum({"t1": f"{log.root}/_data/t1"},
               retain_last=2, min_age_s=3600.0)
    assert log.data_floor() == 1


def test_floor_publish_failure_drops_breaking_deletions(tmp_path,
                                                        monkeypatch):
    """Fail CLOSED: when the floor marker can't be written, vacuum
    keeps the deletions that would break sub-retention versions and
    reaps only pure garbage."""
    log = _log(tmp_path)
    dirs = _replace_chain(log, 4)
    garbage = f"{log.root}/_data/t1/c-garbage"
    os.makedirs(garbage)
    old = time.time() - 7200
    for d in (dirs[0], dirs[1], garbage):
        os.utime(d, (old, old))
    real_wb = log.fs.write_bytes

    def wb(path, data, overwrite=True):
        if path.endswith("_floor"):
            raise OSError("fs down")
        return real_wb(path, data, overwrite)

    monkeypatch.setattr(log.fs, "write_bytes", wb)
    removed = log.vacuum({"t1": f"{log.root}/_data/t1"},
                         retain_last=2, min_age_s=3600.0)
    assert removed == 1                      # only the garbage dir
    assert os.path.exists(dirs[0]) and os.path.exists(dirs[1])
    assert not os.path.exists(garbage)
    assert log.data_floor() == 1
    assert log.resolve(1)["tables"] == {"t1": [dirs[0]]}


def test_unreadable_floor_marker_fails_safe(tmp_path):
    """A PRESENT but unreadable floor marker raises instead of
    defaulting to 1 (defaulting would re-allow time travel to reaped
    versions); a genuinely absent marker reads as 1."""
    log = _log(tmp_path)
    _replace_chain(log, 2)
    assert log.data_floor() == 1
    log.fs.write_bytes(f"{log.log_dir}/_floor", b"{torn garbage")
    with pytest.raises(RuntimeError, match="unreadable"):
        log.data_floor()
    with pytest.raises(RuntimeError):
        log.resolve(1)                       # floor check fails safe


def test_lease_wait_diagnostic_lines(tmp_path, monkeypatch, capsys):
    """While acquire_lease waits it periodically reports WHY on stderr:
    a live (heartbeat-fresh) holder is named as such, and the eventual
    TimeoutError says the holder was live — the signal an operator
    needs to tell post-crash healing from waiting out a live writer."""
    from covsonar_spark import commitlog as cl

    monkeypatch.setattr(cl, "LEASE_NOTE_INTERVAL", 0.05)
    log = cl.CommitLog(None, str(tmp_path))
    owner = log.acquire_lease()
    try:
        with pytest.raises(TimeoutError) as ei:
            log.acquire_lease(timeout=0.8)
        err = capsys.readouterr().err
        assert "waiting on writer lease" in err
        assert "LIVE writer" in err
        assert "heartbeating" in str(ei.value)
    finally:
        log.release_lease(owner)
    assert log.acquire_lease(timeout=5.0)
