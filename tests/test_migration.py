"""S11 — store schema versioning and stepwise migration (reference
``upgrade_db`` lib/sonardb.py:1383-1421 + lib/migrate/4.sql): a
pre-versioning store (unpartitioned genomes, string dates, no
submission_date column) must open cleanly as a current-version store
with no data loss."""

from __future__ import annotations

import os

import pytest

from covsonar_spark.store import SCHEMA_VERSION, SonarStore


def _write_v1_store(spark, root):
    """Simulate a store written before versioning: genomes lacks
    submission_date, carries string-typed dates, and is unpartitioned."""
    rows = [
        ("ACC1", "d1", "hashA", "B.1.1.7", "2021-01-15"),
        ("ACC2", "d2", "hashB", "B.1.617.2", "2021-06-02"),
        ("ACC3", None, "hashA", None, None),
    ]
    df = spark.createDataFrame(
        rows, "accession: string, description: string, seqhash: string, "
              "lineage: string, date: string")
    df.coalesce(1).write.parquet(os.path.join(root, "genomes"))


def test_v1_store_upgrades_on_open(spark, tmp_path):
    root = str(tmp_path / "db")
    _write_v1_store(spark, root)
    assert SonarStore.version(root) == 1

    st = SonarStore.open(spark, root)
    assert SonarStore.version(root) == SCHEMA_VERSION

    g = st.table("genomes")
    assert "submission_date" in g.columns
    types = dict(g.dtypes)
    assert types["date"] == "date"
    assert types["submission_date"] == "date"
    rows = {r["accession"]: r for r in g.collect()}
    assert set(rows) == {"ACC1", "ACC2", "ACC3"}
    assert str(rows["ACC1"]["date"]) == "2021-01-15"
    assert rows["ACC3"]["date"] is None
    # the physical rewrite is a commit: the migrated genomes live in
    # the log, superseding the legacy plain dir
    assert len(st.history()) >= 1
    assert st._live_dirs("genomes")
    assert all("_data/genomes/c-" in d for d in st._live_dirs("genomes"))


def test_upgrade_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "db")
    _write_v1_store(spark, root)
    assert SonarStore.upgrade(spark, root) == (1, SCHEMA_VERSION)
    assert SonarStore.upgrade(spark, root) == (SCHEMA_VERSION, SCHEMA_VERSION)


def test_fresh_store_marks_current_version(spark, tmp_path):
    root = str(tmp_path / "fresh")
    SonarStore.open(spark, root)
    with open(os.path.join(root, "VERSION")) as fh:
        assert int(fh.read()) == SCHEMA_VERSION


def test_newer_store_is_refused(spark, tmp_path):
    root = str(tmp_path / "future")
    os.makedirs(root)
    with open(os.path.join(root, "VERSION"), "w") as fh:
        fh.write(str(SCHEMA_VERSION + 1))
    with pytest.raises(ValueError, match="newer than this engine"):
        SonarStore.upgrade(spark, root)


def test_lease_excludes_second_writer(spark, tmp_path):
    """The commit-log writer lease on a LOCAL root: a held lease makes
    a second acquirer time out; release frees it; a stale lease
    (backdated mtime — a dead holder that stopped heartbeating) is
    broken by the rename-rendezvous protocol."""
    import os
    import time

    from covsonar_spark.commitlog import CommitLog

    root = str(tmp_path / "db")
    os.makedirs(root)
    log = CommitLog(spark, root)
    owner = log.acquire_lease()
    with pytest.raises(TimeoutError):
        log.acquire_lease(timeout=0.5)
    log.release_lease(owner)
    o2 = log.acquire_lease(timeout=0.5)
    # stale lease: backdate the lock file and break it
    lock = os.path.join(root, "_log", "LOCK")
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    o3 = log.acquire_lease(timeout=5, lease_timeout=3600)
    assert o3 != o2
    log.release_lease(o3)


def test_heartbeat_keeps_long_mutation_alive(spark, tmp_path):
    """A holder that heartbeats is never diagnosed stale, even when
    the lock's original mtime is ancient; heartbeat() refuses to touch
    a lock owned by someone else."""
    import os
    import time

    from covsonar_spark.commitlog import CommitLog

    root = str(tmp_path / "db")
    os.makedirs(root)
    log = CommitLog(spark, root)
    owner = log.acquire_lease()
    lock = os.path.join(root, "_log", "LOCK")
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    assert log.heartbeat(owner)            # refreshes mtime
    assert time.time() - os.path.getmtime(lock) < 60
    assert not log.heartbeat("not-the-owner")
    log.release_lease(owner)


def test_legacy_crash_artifacts_read_and_adopt(spark, tmp_path):
    """Pre-unification crash artifacts (the old posix rename-pair
    protocol): a store left with the final dir missing and only the
    ``.old`` pre-swap snapshot must (a) READ as that snapshot, never
    empty, and (b) be ADOPTED into the commit log by the first
    mutation so the data survives."""
    import os
    import shutil

    root = str(tmp_path / "store")
    store = SonarStore.open(spark, root)
    schema = store.table("genomes").schema
    row = tuple("v" if not f.nullable else None for f in schema.fields)
    df = spark.createDataFrame([row], schema)
    df.write.parquet(store._path("genomes"))        # legacy plain layout
    assert store.table("genomes").count() == 1
    # simulate the pre-unification crash window: final moved to .old
    os.rename(store._path("genomes"), store._path("genomes") + ".old")
    assert store.table("genomes").count() == 1      # served from .old
    # first mutation adopts the artifact; subsequent reads resolve the log
    store.update_metadata(spark.createDataFrame(
        [(row[0], "LAB")], "accession string, lab string"))
    assert store.table("genomes").where("lab = 'LAB'").count() == 1
    assert [h["version"] for h in store.history()] == [1]
    # a completed .tmp (fully written, _SUCCESS present) adopts too
    root2 = str(tmp_path / "store2")
    store2 = SonarStore.open(spark, root2)
    df.write.parquet(store2._path("genomes") + ".tmp")
    assert os.path.exists(
        os.path.join(store2._path("genomes") + ".tmp", "_SUCCESS"))
    assert store2.table("genomes").count() == 1
    store2.update_metadata(spark.createDataFrame(
        [(row[0], "LAB2")], "accession string, lab string"))
    assert store2.table("genomes").where("lab = 'LAB2'").count() == 1
    shutil.rmtree(root2)


def test_reader_snapshot_survives_writer_commit(spark, tmp_path):
    """Real MVCC (what the pre-unification .old retention only
    approximated): a reader's lazy plan pinned to version N still
    executes after a writer publishes N+1, because superseded dirs
    stay on disk for the vacuum retention window."""
    root = str(tmp_path / "store")
    store = SonarStore.open(spark, root)
    schema = store.table("genomes").schema
    row = tuple("v" if not f.nullable else None for f in schema.fields)
    with store._mutation_session():
        store._overwrite("genomes", spark.createDataFrame([row], schema))
    snapshot = store.table("genomes")               # lazy plan over v1
    with store._mutation_session():
        store._overwrite("genomes", spark.createDataFrame([], schema))
    assert snapshot.count() == 1                    # v1 dirs retained
    assert store.table("genomes").count() == 0      # v2 is current


def test_unreadable_databearing_legacy_dir_raises(spark, tmp_path):
    """A legacy table dir that holds data files but cannot be read
    surfaces as StoreReadError — never a silent empty table."""
    import os

    from covsonar_spark.store import StoreReadError

    root = str(tmp_path / "store")
    store = SonarStore.open(spark, root)
    gdir = store._path("genomes")
    os.makedirs(gdir)
    with open(os.path.join(gdir, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not parquet at all")
    with pytest.raises(StoreReadError, match="could not be read"):
        store.table("genomes").count()


def test_upgrade_fast_path_skips_lease(spark, tmp_path):
    """A current store opens read-only even while a writer holds the
    lease (the lease-free upgrade fast path)."""
    root = str(tmp_path / "store")
    SonarStore.open(spark, root)              # writes VERSION marker
    log_owner = SonarStore(spark, root)._log.acquire_lease()
    try:
        st = SonarStore.open(spark, root)     # must not block or raise
        assert st.table("genomes").count() == 0
    finally:
        SonarStore(spark, root)._log.release_lease(log_owner)


def test_emptied_table_still_reads_empty(spark, tmp_path):
    """The legitimate empty case stays intact: a table overwritten
    with zero rows reads as 0 rows."""
    root = str(tmp_path / "store")
    store = SonarStore.open(spark, root)
    schema = store.table("genomes").schema
    with store._mutation_session():
        store._overwrite("genomes", spark.createDataFrame([], schema))
    assert store.table("genomes").count() == 0
