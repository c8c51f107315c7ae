"""Log-structured commit protocol — ALL store mutations, on every
filesystem scheme.

The reference inherits mutation atomicity from SQLite's single-file
transaction (/root/reference/lib/sonardb.py:1316-1356).  This module is
the parquet store's replacement: a Delta/Iceberg-style versioned
metadata log that needs only

  * immutable blob writes (every data directory is written once under a
    fresh uuid name and never modified), and
  * ONE atomicity primitive: rename-without-replace of the commit file
    (Hadoop ``FileSystem.rename`` refuses an existing destination on
    HDFS/viewfs/local; posix gets the same put-if-absent from
    ``os.link``; S3A users enable conditional-put semantics or front
    the log with an HDFS/DynamoDB-style coordinator, the same
    deployment requirement Delta-on-S3 has).

Until round 6 this protocol ran only on remote-scheme roots while local
posix roots kept a rename-pair swap with ``.old`` crash repair.  Round
7 unified on the log everywhere: one mutation protocol to reason about,
and local stores get the same MVCC history / time travel / atomic
multi-table commits object-store roots have.  Local roots use
:class:`LocalFS` (pure Python — no py4j round-trips on the hot read
path); everything else uses :class:`HadoopFS`.

Protocol:

  * ``root/_log/v<20-digit>.json`` — commit N: a FULL snapshot mapping
    each table to its ordered list of live data directories, plus a
    unique commit ``id`` (uuid).  Snapshots are tiny (tens of entries);
    a production evolution would checkpoint + delta like Delta, same
    read semantics.
  * writers stage new uuid-named directories under ``root/_data/``,
    then publish ONE commit covering every staged table — multi-table
    ingest is atomic, which a per-table swap protocol never had.
  * commit = write ``v<N+1>.json.tmp-<uuid>`` fully, then rename to the
    final name.  Exactly one concurrent committer wins the rename; the
    loser raises :class:`StoreWriteConflict` (its staged dirs become
    garbage for :meth:`vacuum`).  Readers only ever open fully-renamed
    commit files, so a torn commit is unobservable.
  * readers resolve the newest commit in O(1) object reads through the
    ``_log/_last`` hint (re-written after every commit; stale hints are
    healed by probing forward, a missing/torn hint falls back to
    listing) — resolving a 10k-commit log costs two reads, not a 10k
    listing.
  * the commit ``id`` is what derived data (the file-skipping
    manifests) pins itself to: a manifest built inside a mutation that
    LOST the commit race carries an id no published commit ever has, so
    the zero-listing pruned read can never resolve a loser's file set
    (pinning to the version NUMBER had exactly that hole — the winner
    publishes the same number).
  * an ADVISORY lease file (``_log/LOCK``) serializes writers to avoid
    wasted work; correctness never depends on it — the rename race is
    the real arbiter.  Stale leases are broken by a rename to a fixed
    rendezvous name (put-if-absent: one concurrent breaker wins) with
    an owner-identity check so a fresh lock that replaced the stale one
    mid-break is put back, and holders heartbeat the lock mtime so a
    live multi-hour mutation is never "stale".

Crash windows: before the commit rename, nothing is published (staged
dirs are invisible garbage); after it, the mutation is complete.  There
is no half state.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from urllib.parse import urlparse

from pyspark.sql import SparkSession

LOG_DIR = "_log"
LOCK_NAME = "LOCK"
HINT_NAME = "_last"


def is_remote(path: str) -> bool:
    """True when ``path`` lives on a non-local filesystem scheme
    (hdfs://, s3a://, viewfs://, …) — i.e. os.* primitives don't
    apply.  Single-letter schemes are Windows drive letters."""
    scheme = urlparse(path).scheme
    return len(scheme) > 1 and scheme != "file"


class StoreWriteConflict(RuntimeError):
    """Another writer committed first; the mutation must be retried
    against the new snapshot (optimistic concurrency, Delta-style)."""


class LocalFS:
    """Pure-Python posix implementation of the filesystem surface the
    commit log needs.  Local roots resolve the newest commit on EVERY
    table() call — that must cost microseconds of os.* work, not py4j
    round-trips into the JVM."""

    def __init__(self):
        # per-directory hardlink-support probe cache (exFAT / some
        # SMB / FUSE mounts have no os.link) — one probe per store
        self._link_ok: dict[str, bool] = {}

    @staticmethod
    def _p(path: str) -> str:
        if path.startswith("file://"):
            path = path[len("file:"):]
        return path

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def mkdirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def delete(self, path: str, recursive: bool = True) -> bool:
        p = self._p(path)
        try:
            if os.path.isdir(p) and not os.path.islink(p):
                if recursive:
                    shutil.rmtree(p)
                else:
                    os.rmdir(p)
            else:
                os.remove(p)
            return True
        except OSError:
            return False

    def mtime(self, path: str) -> float:
        return os.path.getmtime(self._p(path))

    def touch(self, path: str) -> None:
        os.utime(self._p(path))

    def write_bytes(self, path: str, data: bytes,
                    overwrite: bool = True) -> None:
        p = self._p(path)
        if not overwrite and os.path.exists(p):
            raise FileExistsError(p)
        # atomic content publish: a concurrent reader of the _last hint
        # must never see a torn write
        tmp = f"{p}.wr-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, p)

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as fh:
            return fh.read()

    def rename_no_replace(self, src: str, dst: str) -> bool:
        """put-if-absent for FILES: hardlink (atomic, fails on an
        existing destination) then unlink the source — posix has no
        rename-without-replace syscall exposed to Python.  Filesystems
        without hardlinks (exFAT, some SMB/FUSE mounts — where the
        pre-unification swap protocol used to work) fall back to a
        mkdir-mutex emulation, probed once per directory."""
        src, dst = self._p(src), self._p(dst)
        if not self._supports_link(os.path.dirname(dst)):
            return self._rename_no_replace_gated(src, dst)
        try:
            os.link(src, dst)
        except FileExistsError:
            return False
        except FileNotFoundError:
            return False          # another renamer took src first
        try:
            os.unlink(src)
        except OSError:
            pass   # dst IS published; the stray src hardlink is tmp
            #        garbage vacuum reaps — failing the commit here
            #        would delete staged dirs a live commit references
        return True

    def _supports_link(self, d: str) -> bool:
        got = self._link_ok.get(d)
        if got is not None:
            return got
        probe = os.path.join(d, f".lnkprobe-{uuid.uuid4().hex[:8]}")
        ok = True     # probe inconclusive → let os.link surface errors
        conclusive = False
        try:
            with open(probe, "wb"):
                pass
            conclusive = True
            try:
                os.link(probe, probe + ".l")
            except OSError:
                ok = False    # conclusive: this mount has no hardlinks
            else:
                try:
                    os.unlink(probe + ".l")
                except OSError:
                    pass      # links WORK (os.link succeeded); the
                    #           leaked .lnkprobe-*.l is vacuum fodder —
                    #           a failed cleanup must not misclassify a
                    #           healthy mount as hardlink-less
        except OSError:
            pass
        finally:
            try:
                os.unlink(probe)
            except OSError:
                pass
        if conclusive:
            # an INCONCLUSIVE probe (couldn't even create the probe
            # file — transient EIO) is never cached: caching True there
            # would permanently disable the fallback on a mount that
            # needs it
            self._link_ok[d] = ok
        return ok

    @staticmethod
    def _gate_owner(gate: str) -> str | None:
        """The holder token stamped inside a gate dir, or None when
        the gate is unstamped (holder died between mkdir and stamp, or
        the stamp write failed)."""
        try:
            with open(os.path.join(gate, "owner")) as fh:
                return fh.read() or None
        except OSError:
            return None

    def _rename_no_replace_gated(self, src: str, dst: str) -> bool:
        """Hardlink-less fallback: ``os.mkdir`` is atomic put-if-absent
        on every filesystem Python runs on, so a mutex dir gates an
        exists-check + ``os.replace``.  A holder that died inside the
        (milliseconds-long) critical section is broken once the gate is
        60 s old, and the 120 s wait deadline EXCEEDS the break
        threshold so a freshly-crashed holder's gate always self-heals
        within one wait instead of timing out every caller.

        Breaking is ATOMIC: the breaker renames the gate to a unique
        ``.broken-<uuid>`` name, so of any set of concurrent breakers
        exactly one succeeds (the rmdir+retry break this replaced let a
        losing breaker delete the winner's freshly re-created LIVE
        gate, putting two writers inside the critical section where the
        second ``os.replace`` silently clobbers the first's published
        commit).  Holders stamp their identity inside the gate; the
        breaker re-reads it after the rename and RESTORES a gate whose
        owner changed between diagnosis and break (a fresh holder
        replaced the stale one mid-break) — the same rename-rendezvous
        + owner-check protocol :meth:`CommitLog.acquire_lease` uses.

        The break threshold is deliberately generous: only a holder
        stalled 4+ orders of magnitude past its expected critical-
        section time (or a >60 s client/server mtime skew) is ever
        presumed dead.  Weaker than the hardlink path only in that
        window; these mounts previously had NO working commit path."""
        gate = dst + ".gate"
        deadline = time.time() + 120.0
        my = uuid.uuid4().hex
        stamped = False
        while True:
            try:
                os.mkdir(gate)
            except FileExistsError:
                try:
                    stale_owner = self._gate_owner(gate)
                    age = time.time() - os.path.getmtime(gate)
                except OSError:
                    continue      # gate released/broken under us: retry
                if age > 60.0:
                    broken = f"{gate}.broken-{uuid.uuid4().hex[:8]}"
                    try:
                        os.rename(gate, broken)
                    except OSError:
                        continue  # lost the break race, or released
                    if self._gate_owner(broken) != stale_owner:
                        # we displaced a FRESH gate that replaced the
                        # stale one between diagnosis and rename: put
                        # it back (failure means yet another holder
                        # mkdir'd meanwhile — drop the displaced copy,
                        # the same residual window acquire_lease has)
                        try:
                            os.rename(broken, gate)
                        except OSError:
                            shutil.rmtree(broken, ignore_errors=True)
                    else:
                        shutil.rmtree(broken, ignore_errors=True)
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"rename gate stuck (holder died?): {gate}")
                time.sleep(0.05)
            except FileNotFoundError:
                return False      # parent vanished: nothing to publish
            else:
                try:
                    with open(os.path.join(gate, "owner"), "w") as fh:
                        fh.write(my)
                    stamped = True
                except OSError:
                    pass   # unstamped gate still mutually excludes; it
                    #        just can't be told apart mid-break
                break
        try:
            if os.path.exists(dst):
                return False
            try:
                os.replace(src, dst)
            except FileNotFoundError:
                return False      # another renamer took src first
            return True
        finally:
            try:
                # release only OUR gate: after a (wrongful) break +
                # re-mkdir the gate at this path belongs to someone
                # else, and removing it would unprotect THEIR critical
                # section
                cur = self._gate_owner(gate)
                if cur == my or (not stamped and cur is None):
                    shutil.rmtree(gate, ignore_errors=True)
            except OSError:
                pass

    def list_names(self, path: str) -> list[str]:
        p = self._p(path)
        try:
            return os.listdir(p)
        except FileNotFoundError:
            return []


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

    def touch(self, path: str) -> None:
        self.fs.setTimes(self._Path(path), int(time.time() * 1000), -1)

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
        self.fs = LocalFS() if not is_remote(root) \
            else HadoopFS(spark, root)

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

    def latest(self) -> tuple[int, dict, str | None] | None:
        """(version, {table: [data dir, …]}, commit id) of the newest
        commit, or None when the log holds no commit (fresh / legacy
        store).  The ``_last`` hint makes this O(1) object reads on the
        hot path (every table() resolution); a missing, torn, or
        vacuumed-past hint falls back to a listing, and the listing
        path retries once on a commit deleted between list and read (an
        aggressive vacuum of superseded versions)."""
        got = self._latest_hinted()
        if got is not None:
            return got
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
            return vs[-1], snap.get("tables", {}), snap.get("id")
        raise RuntimeError(f"commit log unreadable at {self.log_dir}")

    def _latest_hinted(self) -> tuple[int, dict, str | None] | None:
        """Resolve the newest commit through the ``_last`` hint: read
        the hint (1), probe FORWARD past any staleness (exists() calls
        — a hint can only lag, never lead, because it is written after
        the commit rename), read the commit (2).  Any anomaly — no
        hint, torn json, the hinted version vacuumed away — returns
        None and the caller lists instead."""
        try:
            hinted = int(json.loads(self.fs.read_bytes(
                f"{self.log_dir}/{HINT_NAME}").decode())["version"])
        except Exception:  # noqa: BLE001 — absent/torn hint: list
            return None
        if hinted < 1:
            return None
        v = hinted
        while self.fs.exists(self._commit_path(v + 1)):
            v += 1
        try:
            snap = json.loads(self.fs.read_bytes(
                self._commit_path(v)).decode())
        except Exception:  # noqa: BLE001 — vacuumed under us: list
            return None
        return v, snap.get("tables", {}), snap.get("id")

    def snapshot(self, version: int) -> dict:
        return self.read_commit(version).get("tables", {})

    def read_commit(self, version: int) -> dict:
        """The full commit json of ``version``; raises when that
        version was never committed or its commit file was vacuumed."""
        try:
            raw = self.fs.read_bytes(self._commit_path(version))
        except Exception as exc:  # noqa: BLE001
            raise ValueError(
                f"commit version {version} not found under "
                f"{self.log_dir} (never committed, or vacuumed past "
                f"retention)") from exc
        return json.loads(raw.decode())

    # -- write side -----------------------------------------------------

    def _commit_path(self, version: int) -> str:
        return f"{self.log_dir}/v{version:020d}.json"

    def commit(self, base_version: int, tables: dict,
               commit_id: str | None = None) -> int:
        """Publish ``tables`` as version ``base_version + 1``.  Raises
        :class:`StoreWriteConflict` when that version already exists —
        exactly one of any set of racing committers wins.  ``commit_id``
        (pre-generated by the mutation session so derived data written
        BEFORE the commit can pin itself to it) defaults to a fresh
        uuid; it must never be reused across commits."""
        new_v = base_version + 1
        cid = commit_id or uuid.uuid4().hex
        body = json.dumps({"version": new_v, "id": cid,
                           "committed_at": time.time(),
                           "tables": tables}, indent=1).encode()
        self.fs.mkdirs(self.log_dir)
        tmp = f"{self._commit_path(new_v)}.tmp-{uuid.uuid4().hex[:8]}"
        self.fs.write_bytes(tmp, body, overwrite=True)
        if not self.fs.rename_no_replace(tmp, self._commit_path(new_v)):
            self.fs.delete(tmp, recursive=False)
            raise StoreWriteConflict(
                f"version {new_v} was committed concurrently under "
                f"{self.log_dir}; retry the mutation on the new snapshot")
        try:
            # best-effort hint refresh: readers heal a stale hint by
            # probing forward, so a crash here (or two winners writing
            # out of order) costs exists() probes, never correctness
            self.fs.write_bytes(
                f"{self.log_dir}/{HINT_NAME}",
                json.dumps({"version": new_v}).encode(), overwrite=True)
        except Exception:  # noqa: BLE001
            pass
        return new_v

    # -- advisory writer lease -----------------------------------------

    def acquire_lease(self, timeout: float = 600.0,
                      lease_timeout: float = 3600.0) -> str:
        """Best-effort writer serialization (avoids wasted staged work;
        the commit rename stays the correctness arbiter).  Returns the
        owner token the holder heartbeats/releases with.

        The lease is a put-if-absent file.  A holder whose lock mtime
        is older than ``lease_timeout`` is presumed dead (live holders
        heartbeat, see :meth:`heartbeat`) and broken by RENAMING the
        lock to a fixed rendezvous name — put-if-absent again, so of
        any set of concurrent breakers exactly one proceeds (the
        delete-then-recreate break this replaced let two waiters both
        "acquire").  The winner re-reads the renamed lock: if its owner
        is no longer the one diagnosed stale (a fresh lock replaced it
        mid-break), the rename is undone.  The residual window — a
        third writer acquiring between a wrongful break and its undo —
        degrades to duplicate staged work resolved by the commit race,
        never corruption."""
        lock = f"{self.log_dir}/{LOCK_NAME}"
        breaking = f"{lock}.breaking"
        self.fs.mkdirs(self.log_dir)
        deadline = time.time() + timeout
        owner = uuid.uuid4().hex
        me = json.dumps({"owner": owner, "at": time.time()}).encode()
        while True:
            tmp = f"{lock}.tmp-{uuid.uuid4().hex[:8]}"
            self.fs.write_bytes(tmp, me, overwrite=True)
            if self.fs.rename_no_replace(tmp, lock):
                return owner
            self.fs.delete(tmp, recursive=False)
            try:
                # GC a rendezvous file orphaned by a breaker that died
                # between its rename win and delete — else no lease
                # could ever be broken again
                if (time.time() - self.fs.mtime(breaking)) > lease_timeout:
                    self.fs.delete(breaking, recursive=False)
            except Exception:  # noqa: BLE001 — no orphan
                pass
            try:
                age = time.time() - self.fs.mtime(lock)
                stale_owner = json.loads(
                    self.fs.read_bytes(lock).decode()).get("owner")
            except Exception:  # noqa: BLE001 — released between checks
                continue
            if age > lease_timeout:
                if self.fs.rename_no_replace(lock, breaking):
                    try:
                        cur = json.loads(self.fs.read_bytes(
                            breaking).decode()).get("owner")
                    except Exception:  # noqa: BLE001
                        cur = stale_owner
                    if cur != stale_owner:
                        # we displaced a FRESH lock that replaced the
                        # stale one between check and rename: restore it
                        if not self.fs.rename_no_replace(breaking, lock):
                            self.fs.delete(breaking, recursive=False)
                    else:
                        self.fs.delete(breaking, recursive=False)
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"another writer holds the store lease {lock} "
                    f"(held {age:.0f}s; waited {timeout:.0f}s)")
            time.sleep(0.2)

    def heartbeat(self, owner: str) -> bool:
        """Refresh the lock mtime so a live long mutation is never
        diagnosed stale.  Verifies ownership first: after a (wrongful)
        break + re-acquire the lock belongs to someone else and
        touching it would keep THEIR lease alive while confusing the
        staleness clock.  Returns False when the lease is no longer
        ours (caller keeps working — the lease is advisory)."""
        lock = f"{self.log_dir}/{LOCK_NAME}"
        try:
            if json.loads(self.fs.read_bytes(
                    lock).decode()).get("owner") != owner:
                return False
            self.fs.touch(lock)
            return True
        except Exception:  # noqa: BLE001 — lock gone / FS hiccup
            return False

    def release_lease(self, owner: str | None = None) -> None:
        lock = f"{self.log_dir}/{LOCK_NAME}"
        if owner is not None:
            try:
                if json.loads(self.fs.read_bytes(
                        lock).decode()).get("owner") != owner:
                    return       # broken + re-acquired: not ours to drop
            except Exception:  # noqa: BLE001 — already gone
                return
        self.fs.delete(lock, recursive=False)

    # -- garbage collection ----------------------------------------------

    def vacuum(self, tables_root: dict[str, str],
               retain_last: int = 2, min_age_s: float = 3600.0,
               legacy_paths: dict[str, str] | None = None) -> int:
        """Delete data directories referenced by NO retained commit and
        older than ``min_age_s`` (uncommitted garbage from crashed or
        conflicted writers, and dirs superseded past the retention
        window), plus superseded commit files and orphaned tmp files.
        ``tables_root`` maps table name → its log-managed data area.
        ``legacy_paths`` maps table name → the pre-log plain directory;
        a legacy dir that no retained snapshot references anymore (its
        table was replaced through the log) is reaped like any other
        superseded dir — without this, adopting a 100 TB legacy store
        into the log would strand a full stale copy forever.

        Retention keeps time travel working for the retained window: a
        reader pinned to any kept version must keep resolving both its
        data dirs AND its commit file, so superseded commit files honor
        the same ``min_age_s`` floor the data dirs do (metadata must
        outlive the data it references)."""
        retain_last = max(retain_last, 1)   # the latest commit is never
        #                                     collectable — it IS the table
        vs = self.versions()
        keep_vs = vs[-retain_last:] if vs else []
        live: set[str] = set()          # uuid dir basenames
        live_full: set[str] = set()     # full dir paths (legacy adoptions)
        for v in keep_vs:
            for dirs in self.snapshot(v).values():
                for d in dirs:
                    d = d.rstrip("/")
                    live.add(d.rsplit("/", 1)[-1])
                    live_full.add(d)
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
        for table, path in (legacy_paths or {}).items():
            path = path.rstrip("/")
            if not keep_vs or path in live_full:
                continue              # still referenced (or no log yet)
            if not self.fs.exists(path):
                continue
            try:
                if now - self.fs.mtime(path) < min_age_s:
                    continue
            except Exception:  # noqa: BLE001
                continue
            if self.fs.delete(path):
                removed += 1
        for v in vs[:-retain_last]:
            p = self._commit_path(v)
            try:
                if now - self.fs.mtime(p) < min_age_s:
                    continue          # a pinned reader may still open it
            except Exception:  # noqa: BLE001
                continue
            self.fs.delete(p, recursive=False)
        for name in self.fs.list_names(self.log_dir):
            # .tmp-/.wr- : torn staged writes; .gate : mkdir-mutex dirs
            # leaked by a holder that died mid-critical-section on a
            # hardlink-less mount; .lnkprobe- : probe files leaked
            # between create and unlink.  All honor the min-age floor
            # so a LIVE gate/probe is never deleted.
            if (".tmp-" in name or ".wr-" in name
                    or name.endswith(".gate")
                    or ".gate.broken-" in name
                    or name.startswith(".lnkprobe-")):
                # gates (and broken-away gates) are DIRS holding an
                # owner stamp — recursive delete
                recursive = ".gate" in name
                path = f"{self.log_dir}/{name}"
                try:
                    if now - self.fs.mtime(path) >= min_age_s:
                        self.fs.delete(path, recursive=recursive)
                except Exception:  # noqa: BLE001
                    continue
        return removed
