"""Log-structured commit protocol — store mutations on object-store /
remote-scheme roots.

The reference inherits mutation atomicity from SQLite's single-file
transaction (/root/reference/lib/sonardb.py:1316-1356).  The local
parquet store replaces that with posix rename pairs (store.py
``_overwrite``) — atomic on local FS and HDFS, impossible on object
stores.  This module is the third leg: a Delta/Iceberg-style versioned
metadata log that needs only

  * immutable blob writes (every data directory is written once under a
    fresh uuid name and never modified), and
  * ONE atomicity primitive: rename-without-replace of the commit file
    (Hadoop ``FileSystem.rename`` refuses an existing destination on
    HDFS/viewfs/local; S3A users enable directory-marker/conditional
    semantics or front the log with an HDFS/DynamoDB-style coordinator,
    the same deployment requirement Delta-on-S3 has).

Protocol:

  * ``root/_log/v<20-digit>.json`` — commit N: a FULL snapshot mapping
    each table to its ordered list of live data directories (written
    small: tens of entries; a production evolution would checkpoint +
    delta like Delta's _last_checkpoint, same read semantics).
  * writers stage new uuid-named directories under ``root/<table>/``,
    then publish ONE commit covering every staged table — multi-table
    ingest is atomic, which the posix protocol never had.
  * commit = write ``v<N+1>.json.tmp-<uuid>`` fully, then rename to the
    final name.  Exactly one concurrent committer wins the rename; the
    loser raises :class:`StoreWriteConflict` (its staged dirs become
    garbage for :meth:`vacuum`).  Readers only ever open fully-renamed
    commit files, so a torn commit is unobservable.
  * readers resolve the highest ``v*.json`` — old-snapshot-or-new, the
    same contract the local swap protocol documents.
  * an ADVISORY lease file (``_log/LOCK``) serializes writers to avoid
    wasted work; correctness never depends on it — the rename race is
    the real arbiter.

Crash windows: before the commit rename, nothing is published (staged
dirs are invisible garbage); after it, the mutation is complete.  There
is no half state, which is exactly what the posix protocol's
``_heal``/``.old`` machinery existed to repair.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import SparkSession

LOG_DIR = "_log"
LOCK_NAME = "LOCK"


class StoreWriteConflict(RuntimeError):
    """Another writer committed first; the mutation must be retried
    against the new snapshot (optimistic concurrency, Delta-style)."""


class HadoopFS:
    """Thin py4j facade over the root's owning Hadoop FileSystem — the
    same FS Spark's reader resolves, so every scheme Spark can query
    can also host the commit log."""

    def __init__(self, spark: SparkSession, root: str):
        self._spark = spark
        self._root = root
        self._fs = None      # resolved lazily: constructing a store on
        #                      an unreachable mount must not throw —
        #                      the first actual access does

    @property
    def _Path(self):
        return self._spark._jvm.org.apache.hadoop.fs.Path

    @property
    def fs(self):
        if self._fs is None:
            self._fs = self._Path(self._root).getFileSystem(
                self._spark.sparkContext._jsc.hadoopConfiguration())
        return self._fs

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._Path(path))

    def mkdirs(self, path: str) -> None:
        self.fs.mkdirs(self._Path(path))

    def delete(self, path: str, recursive: bool = True) -> bool:
        return self.fs.delete(self._Path(path), recursive)

    def mtime(self, path: str) -> float:
        return self.fs.getFileStatus(
            self._Path(path)).getModificationTime() / 1000.0

    def write_bytes(self, path: str, data: bytes,
                    overwrite: bool = True) -> None:
        out = self.fs.create(self._Path(path), overwrite)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, path: str) -> bytes:
        # IOUtils RETURNS the array — py4j passes byte[] arguments by
        # value, so a readFully(buf) mutation would never reach Python
        inp = self.fs.open(self._Path(path))
        try:
            data = self._spark._jvm.org.apache.commons.io.IOUtils \
                .toByteArray(inp)
            return bytes(data)
        finally:
            inp.close()

    def rename_no_replace(self, src: str, dst: str) -> bool:
        """Atomic publish: Hadoop's contract returns False when ``dst``
        exists (HDFS, viewfs, RawLocalFileSystem) — the put-if-absent
        primitive the commit race is decided by."""
        if self.fs.exists(self._Path(dst)):
            return False
        return bool(self.fs.rename(self._Path(src), self._Path(dst)))

    def list_names(self, path: str) -> list[str]:
        p = self._Path(path)
        if not self.fs.exists(p):
            return []
        return [st.getPath().getName() for st in self.fs.listStatus(p)]


class CommitLog:
    """The versioned snapshot log of one store root."""

    def __init__(self, spark: SparkSession, root: str):
        self.root = root.rstrip("/")
        self.log_dir = f"{self.root}/{LOG_DIR}"
        self.fs = HadoopFS(spark, root)

    # -- read side ----------------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for name in self.fs.list_names(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest(self) -> tuple[int, dict] | None:
        """(version, {table: [data dir, …]}) of the newest commit, or
        None when the log holds no commit (fresh / non-log store).
        Retries once on a commit deleted between list and read (an
        aggressive vacuum of superseded versions)."""
        for _ in range(2):
            vs = self.versions()
            if not vs:
                return None
            try:
                raw = self.fs.read_bytes(self._commit_path(vs[-1]))
            except Exception:  # noqa: BLE001 — racing vacuum: re-list
                time.sleep(0.05)
                continue
            snap = json.loads(raw.decode())
            return vs[-1], snap.get("tables", {})
        raise RuntimeError(f"commit log unreadable at {self.log_dir}")

    def snapshot(self, version: int) -> dict:
        raw = self.fs.read_bytes(self._commit_path(version))
        return json.loads(raw.decode()).get("tables", {})

    # -- write side -----------------------------------------------------

    def _commit_path(self, version: int) -> str:
        return f"{self.log_dir}/v{version:020d}.json"

    def commit(self, base_version: int, tables: dict) -> int:
        """Publish ``tables`` as version ``base_version + 1``.  Raises
        :class:`StoreWriteConflict` when that version already exists —
        exactly one of any set of racing committers wins."""
        new_v = base_version + 1
        body = json.dumps({"version": new_v, "committed_at": time.time(),
                           "tables": tables}, indent=1).encode()
        self.fs.mkdirs(self.log_dir)
        tmp = f"{self._commit_path(new_v)}.tmp-{uuid.uuid4().hex[:8]}"
        self.fs.write_bytes(tmp, body, overwrite=True)
        if not self.fs.rename_no_replace(tmp, self._commit_path(new_v)):
            self.fs.delete(tmp, recursive=False)
            raise StoreWriteConflict(
                f"version {new_v} was committed concurrently under "
                f"{self.log_dir}; retry the mutation on the new snapshot")
        return new_v

    # -- advisory writer lease -----------------------------------------

    def acquire_lease(self, timeout: float = 600.0,
                      lease_timeout: float = 3600.0) -> None:
        """Best-effort writer serialization (avoids wasted staged work;
        the commit rename stays the correctness arbiter).  The lease is
        a put-if-absent file; a holder older than ``lease_timeout`` is
        presumed dead and broken.  The break (delete + re-create) is
        NOT atomic on every FS — a double-acquire after a break is
        resolved by the commit race, never by data corruption."""
        lock = f"{self.log_dir}/{LOCK_NAME}"
        self.fs.mkdirs(self.log_dir)
        deadline = time.time() + timeout
        me = json.dumps({"owner": uuid.uuid4().hex,
                         "at": time.time()}).encode()
        while True:
            tmp = f"{lock}.tmp-{uuid.uuid4().hex[:8]}"
            self.fs.write_bytes(tmp, me, overwrite=True)
            if self.fs.rename_no_replace(tmp, lock):
                return
            self.fs.delete(tmp, recursive=False)
            try:
                age = time.time() - self.fs.mtime(lock)
            except Exception:  # noqa: BLE001 — released between checks
                continue
            if age > lease_timeout:
                self.fs.delete(lock, recursive=False)
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"another writer holds the store lease {lock} "
                    f"(held {age:.0f}s; waited {timeout:.0f}s)")
            time.sleep(0.2)

    def release_lease(self) -> None:
        self.fs.delete(f"{self.log_dir}/{LOCK_NAME}", recursive=False)

    # -- garbage collection ----------------------------------------------

    def vacuum(self, tables_root: dict[str, str],
               retain_last: int = 2, min_age_s: float = 3600.0) -> int:
        """Delete data directories referenced by NO retained commit and
        older than ``min_age_s`` (uncommitted garbage from crashed or
        conflicted writers, and dirs superseded past the retention
        window), plus superseded commit files and orphaned tmp files.
        ``tables_root`` maps table name → its data area.  Retention
        mirrors the local protocol's ``.old`` snapshot: a reader still
        draining an older version must keep resolving its files."""
        retain_last = max(retain_last, 1)   # the latest commit is never
        #                                     collectable — it IS the table
        vs = self.versions()
        keep_vs = vs[-retain_last:] if vs else []
        live: set[str] = set()
        for v in keep_vs:
            for dirs in self.snapshot(v).values():
                live.update(d.rstrip("/").rsplit("/", 1)[-1] for d in dirs)
        removed = 0
        now = time.time()
        for table, area in tables_root.items():
            for name in self.fs.list_names(area):
                if not name.startswith("c-"):
                    continue          # not a log-managed data dir
                path = f"{area}/{name}"
                if name in live:
                    continue
                try:
                    if now - self.fs.mtime(path) < min_age_s:
                        continue
                except Exception:  # noqa: BLE001 — vanished under us
                    continue
                if self.fs.delete(path):
                    removed += 1
        for v in vs[:-retain_last]:
            self.fs.delete(self._commit_path(v), recursive=False)
        for name in self.fs.list_names(self.log_dir):
            if ".tmp-" in name:
                path = f"{self.log_dir}/{name}"
                try:
                    if now - self.fs.mtime(path) >= min_age_s:
                        self.fs.delete(path, recursive=False)
                except Exception:  # noqa: BLE001
                    continue
        return removed
