"""Conditional-put LogStore backend: a compare-and-set COORDINATOR in
front of a dumb object store — the production shape for running the
commit log on raw object storage (Delta's S3DynamoDBLogStore analogue;
the reference needs none of this because its store is one local SQLite
file, /root/reference/lib/db.sqlite).

Why it exists: the commit protocol's single correctness primitive is
``rename_no_replace`` = put-if-absent (CommitLog docstring).  Posix
gives it via hardlink/mkdir; HDFS via rename-no-overwrite; raw S3-style
object storage gives NO such primitive (blind PUTs last-writer-win), so
an external CAS arbiter must own the decision of who publishes each
log slot.  This module provides

  * :class:`SQLiteCoordinator` — a local stand-in for that arbiter
    with TRUE compare-and-set semantics (the INSERT-if-absent races
    through SQLite's own cross-process locking, exactly the
    DynamoDB ``attribute_not_exists(path)`` conditional put);
  * :class:`CasObjectFS` — the LogStore built from (coordinator +
    payload store): every plain operation delegates to the payload
    store; ``rename_no_replace`` claims the destination slot in the
    coordinator first and only the claim winner copies bytes;
  * :class:`CondPutObjectFS` — the CLAIM-FREE second production shape
    (S3 ``If-None-Match: *``): the payload store's own atomic
    put-if-absent arbitrates, the payload IS the claim, and the
    reconciliation machinery disappears.

A root's writers must ALL use the same backend: CasObjectFS decides
winners in the coordinator while the stock/condput shapes decide on the
payload store itself, so a mixed pair can both "win" one slot.  The
first coordinator-backed open records a ``_log/.backend`` marker and
CommitLog refuses mutations whose selected backend disagrees with it
(reads stay backend-agnostic — the log format is identical).

Crash anatomy (the part blind PUTs get wrong): a writer can die AFTER
winning the claim but BEFORE its payload lands.  The claim row records
the source payload path, so ANY later reader/writer that touches the
slot completes the copy itself (``_reconcile``) — the exact
"fix-the-log-on-read" rule S3DynamoDBLogStore documents.  Until a
claim is complete the source payload must stay alive; the session
layer already guarantees that (StoreCommitIndeterminate: staged work
is never deleted while an outcome is unknown).

What a production DynamoDB/S3-conditional-write backend must provide
(tests/test_logstore_contract.py is the executable contract, run
parametrized over this class):

  1. a conditional put that atomically claims one key for one caller
     (DynamoDB ``PutItem`` with ``attribute_not_exists``, or S3
     ``If-None-Match: *`` conditional PUT — the latter is the
     claim-free shape :class:`CondPutObjectFS` models);
  2. claim rows carrying (dst, src, complete) so crashed publishes
     are completable by any observer;
  3. read/list paths that reconcile incomplete claims before
     answering (or readers may miss a committed version);
  4. failures with unknown outcome surfaced as exceptions — commit()
     resolves them by reading the slot back (lost-ack self-heal).
"""

from __future__ import annotations

import os
import secrets
import sqlite3
import threading


def _identity_stamp() -> float:
    """A fresh claim's ``at`` identity: a PURE random 52-bit token
    (exact in float64, so SQLite REAL round-trips it bit-for-bit).
    The stamp is compared only for EQUALITY (the identity-CAS
    conditions on claim transitions), never for age or ordering, so it
    carries no time component at all — a wall-time-based stamp repeats
    within clock resolution or across an NTP step-back, and adding a
    random fraction to epoch seconds silently truncates it to ~22
    effective mantissa bits; a plain random integer keeps the full
    2^-52 pairwise collision odds it advertises."""
    return float(secrets.randbits(52))


class SQLiteCoordinator:
    """Cross-process CAS arbiter: one row per published log path.

    ``claim`` is the conditional put: INSERT with path as PRIMARY KEY —
    SQLite serializes writers across processes, so of any set of
    concurrent claimers exactly one inserts.  A row is (path, src,
    complete, at); ``complete=0`` means the payload copy may not have
    landed and ``src`` is where to copy it from; ``at`` is the claim's
    random identity token (:func:`_identity_stamp`), compared only for
    equality by the identity-CAS transitions."""

    def __init__(self, db_path: str):
        self.db_path = db_path
        self._local = threading.local()
        with self._conn() as c:
            c.execute(
                "CREATE TABLE IF NOT EXISTS slots ("
                " path TEXT PRIMARY KEY,"
                " src TEXT NOT NULL,"
                " complete INTEGER NOT NULL DEFAULT 0,"
                " at REAL NOT NULL)")

    def _conn(self) -> sqlite3.Connection:
        # one connection per thread: sqlite3 objects are not shareable
        # across threads, and the store's helper threads (heartbeat,
        # parallel committers in tests) all reach the coordinator
        c = getattr(self._local, "conn", None)
        if c is None:
            c = sqlite3.connect(self.db_path, timeout=60.0,
                                isolation_level=None)  # autocommit
            c.execute("PRAGMA journal_mode=WAL")
            c.execute("PRAGMA busy_timeout=60000")
            self._local.conn = c
        return c

    def claim(self, dst: str, src: str) -> float | None:
        """The fresh claim's ``at`` identity stamp iff THIS call
        claimed ``dst`` (the CAS); None when the slot was taken.
        Truthy-on-win, and the winner needs the stamp to condition its
        own completion on (ABA guard in CasObjectFS._complete)."""
        at = _identity_stamp()
        cur = self._conn().execute(
            "INSERT OR IGNORE INTO slots(path, src, complete, at)"
            " VALUES (?, ?, 0, ?)", (dst, src, at))
        return at if cur.rowcount == 1 else None

    def mark_complete(self, dst: str, at: float) -> None:
        """Mark ONE claim (identified by its ``at`` stamp) complete —
        an unconditioned by-path update could stamp a SUCCESSOR's fresh
        incomplete claim complete before its payload landed."""
        self._conn().execute(
            "UPDATE slots SET complete = 1 WHERE path = ? AND at = ?",
            (dst, at))

    def get(self, dst: str):
        """(src, complete, at) for a claimed path, or None."""
        row = self._conn().execute(
            "SELECT src, complete, at FROM slots WHERE path = ?",
            (dst,)).fetchone()
        return None if row is None else (row[0], bool(row[1]), row[2])

    def reclaim(self, dst: str, src: str, old_at: float) -> float | None:
        """Atomically replace an ORPHANED claim (identified by its
        ``at`` stamp) with a fresh incomplete claim for this caller,
        returning the fresh claim's ``at`` (None on loss).  One
        transaction: delete-if-still-that-claim + insert — of any
        set of concurrent reclaimers of the same orphan, exactly one
        succeeds (a plain forget-then-claim would let a second
        reclaimer forget the first one's FRESH claim: two winners)."""
        c = self._conn()
        c.execute("BEGIN IMMEDIATE")
        try:
            cur = c.execute(
                "DELETE FROM slots WHERE path = ? AND at = ?"
                " AND complete = 1", (dst, old_at))
            if cur.rowcount != 1:
                c.execute("ROLLBACK")
                return None
            at = _identity_stamp()
            c.execute(
                "INSERT INTO slots(path, src, complete, at)"
                " VALUES (?, ?, 0, ?)", (dst, src, at))
            c.execute("COMMIT")
            return at
        except BaseException:
            c.execute("ROLLBACK")
            raise

    @staticmethod
    def _like_prefix(prefix: str) -> str:
        """LIKE pattern matching strict descendants of ``prefix``,
        with the LIKE metacharacters escaped — every store path
        contains ``_log``, so an unescaped ``_`` wildcard silently
        over-matches sibling trees (``Xlog`` for ``_log``) and a
        recursive forget would release claims guarding unrelated
        published objects."""
        esc = (prefix.rstrip("/").replace("\\", "\\\\")
               .replace("%", "\\%").replace("_", "\\_"))
        return esc + "/%"

    def incomplete_under(self, prefix: str):
        """[(dst, src, at)] of incomplete claims at or under
        ``prefix`` — ``at`` is the claim identity a completer must
        re-check before its blind PUT (see CasObjectFS._complete)."""
        pre = prefix.rstrip("/")
        return self._conn().execute(
            "SELECT path, src, at FROM slots WHERE complete = 0"
            " AND (path = ? OR path LIKE ? ESCAPE '\\')",
            (pre, self._like_prefix(pre))).fetchall()

    def claims_under(self, path: str, recursive: bool):
        """[(path, at)] of ALL claims at (or under, when recursive)
        ``path`` — the identity snapshot a delete conditions its
        releases on (see CasObjectFS.delete)."""
        pre = path.rstrip("/")
        if recursive:
            return self._conn().execute(
                "SELECT path, at FROM slots WHERE path = ?"
                " OR path LIKE ? ESCAPE '\\'",
                (pre, self._like_prefix(pre))).fetchall()
        return self._conn().execute(
            "SELECT path, at FROM slots WHERE path = ?", (pre,)).fetchall()

    def forget_if(self, path: str, at: float) -> None:
        """Release ONE claim only if it is still the identity observed
        when the release was planned — an unconditioned forget races a
        concurrent reclaim and erases the reclaimer's FRESH claim,
        re-opening the slot for a third winner."""
        self._conn().execute(
            "DELETE FROM slots WHERE path = ? AND at = ?", (path, at))

    def incomplete_claiming_src(self, src: str, recursive: bool):
        """[(dst, src, at)] of incomplete claims whose SOURCE is
        ``src`` (or lives under it, when recursive)."""
        pre = src.rstrip("/")
        if recursive:
            return self._conn().execute(
                "SELECT path, src, at FROM slots WHERE complete = 0"
                " AND (src = ? OR src LIKE ? ESCAPE '\\')",
                (pre, self._like_prefix(pre))).fetchall()
        return self._conn().execute(
            "SELECT path, src, at FROM slots WHERE complete = 0 AND src = ?",
            (pre,)).fetchall()


class CasObjectFS:
    """LogStore over (CAS coordinator + payload object store).

    ``base`` is any object with the LogStore surface whose plain
    write/read/list/delete work like an object store (blind PUTs are
    fine — LocalFS, or the adversarial in-memory fake in tests);
    ``coord`` arbitrates every ``rename_no_replace``.  ``fail`` mirrors
    the contract fake's injection hooks (consumed one rename at a
    time): "lost_call" raises before anything happens, "lost_ack"
    raises after the publish fully landed, "crash_after_claim" raises
    between the claim and the payload copy — the crash window unique
    to the coordinator shape, healed by reconciliation-on-read."""

    BACKEND = "cas"   # backend marker value (CommitLog mixed-writer guard)
    # the publish is a byte COPY: the destination's mtime is the copy
    # time, not the source's — mtime-freshness heuristics across a
    # rename (the lease-break restore check) must not trust it
    RENAME_PRESERVES_MTIME = False

    def __init__(self, base, coord: SQLiteCoordinator):
        self.base = base
        self.coord = coord
        self.fail: list[str] = []

    # -- reconciliation ------------------------------------------------

    def _complete(self, dst: str, src: str, at: float) -> bool:
        """Finish a crashed publish: copy src -> dst in the payload
        store, then mark the claim complete.  Idempotent — concurrent
        completers blind-PUT identical bytes (the claim fixed WHOSE
        payload wins when it was made, so every completer copies the
        same source).  Returns True iff a payload is PUBLISHED at dst
        afterwards (copied now, or already landed); False means the
        source vanished with nothing at dst — the claim stays
        incomplete (fail closed: inventing an empty winner would fork
        history).

        ``at`` is the identity stamp of the claim being completed, and
        it is re-checked immediately before AND immediately after the
        blind PUT: a completer can stall between read_bytes(src) and
        write_bytes(dst) — or inside the upload itself — while the
        slot is deleted (vacuum reaping it releases the claim via
        delete -> forget_if) or taken over.  The pre-check skips a
        detectably stale copy; the post-check repairs one that landed
        anyway: with no claim, our PUT resurrected a reaped object, so
        delete it; with a replaced claim, re-complete from THAT claim's
        source so the rightful payload wins.  Every observer applies
        the same rule, so the object converges to the current claim's
        recorded source WHILE that source exists.  Residual (inherent
        to blind PUTs — only a conditional-PUT payload store closes it,
        and a store that has one is the claim-free CondPutObjectFS
        shape): a stale PUT that lands after the successor completed
        AND consumed its source leaves stale bytes until the slot's
        next writer.  That needs vacuum to reap a contended slot
        mid-race; commit heads are never reaped, and the recycling
        names (lease lock, rendezvous) are overwritten by their next
        acquirer anyway."""
        def _ours() -> bool:
            got = self.coord.get(dst)
            return got is not None and got[0] == src and got[2] == at

        for _ in range(4):   # follow replaced claims; bounded paranoia
            try:
                data = self.base.read_bytes(src)
            except FileNotFoundError:
                # source vanished: if the payload already landed this
                # is just a lost mark_complete — repair it (only while
                # the claim is still the one we were completing)
                if self.base.exists(dst):
                    if _ours():
                        self.coord.mark_complete(dst, at)
                    return True
                return False
            # the claim check sits immediately before the PUT — the
            # read above can stall arbitrarily long
            if not _ours():
                return self.base.exists(dst)
            self.base.write_bytes(dst, data, overwrite=True)
            got = self.coord.get(dst)
            if got is not None and got[0] == src and got[2] == at:
                self.coord.mark_complete(dst, at)
                return True
            if got is None:
                # slot deleted while we uploaded: our PUT resurrected
                # a reaped object with no claim row.  Remove it ONLY
                # while the bytes are still ours and the slot is still
                # unclaimed — a successor can legitimately claim and
                # publish in this very window (lock names recycle),
                # and an unconditioned delete would destroy its live
                # object, orphaning its completed claim.  The residual
                # check-to-delete window degrades to exactly that
                # orphan state, which the reclaim path already heals
                # (advisory-lease churn at worst; commit heads are
                # never vacuumed mid-race, so no history fork).
                try:
                    if (self.coord.get(dst) is None
                            and self.base.read_bytes(dst) == data):
                        self.base.delete(dst, recursive=False)
                except (FileNotFoundError, OSError):
                    pass
                return False
            # claim replaced mid-upload: complete the successor's
            # publish so ITS payload ends up on dst, not our stale one
            src, at = got[0], got[2]
        return self.base.exists(dst)

    def _reconcile(self, prefix: str) -> None:
        for dst, src, at in self.coord.incomplete_under(prefix):
            self._complete(dst, src, at)

    # -- plain surface (object-store semantics, reconciling reads) -----

    def exists(self, path: str) -> bool:
        if self.base.exists(path):
            return True
        self._reconcile(path)
        return self.base.exists(path)

    def mkdirs(self, path: str) -> None:
        self.base.mkdirs(path)

    def delete(self, path: str, recursive: bool = True) -> bool:
        # deleting the SOURCE of an incomplete claim (vacuum GC'ing an
        # aged .tmp- file from a writer that died between claim and
        # copy) must not brick the claimed slot: the source is that
        # slot's only payload, and with it gone the version would be
        # forever unreadable AND unclaimable.  Complete the publish
        # first — garbage collection doubles as the healer.
        for dst, src, at in self.coord.incomplete_claiming_src(path,
                                                               recursive):
            self._complete(dst, src, at)
        # snapshot the claim identities BEFORE deleting the objects:
        # the release below must be conditioned on them.  In the window
        # between base.delete and the release, a concurrent renamer can
        # legitimately take the slot over (orphan reclaim — its
        # precondition, object-missing, only holds post-base.delete);
        # an UNCONDITIONED forget would then erase that reclaimer's
        # fresh claim and let a third caller win too.  forget_if skips
        # rows whose `at` stamp changed, so the reclaimer survives —
        # the same identity-CAS discipline reclaim itself uses.
        snap = self.coord.claims_under(path, recursive)
        got = self.base.delete(path, recursive=recursive)
        for p, at in snap:
            self.coord.forget_if(p, at)
        return got

    def mtime(self, path: str) -> float:
        try:
            return self.base.mtime(path)
        except FileNotFoundError:
            self._reconcile(path)
            return self.base.mtime(path)

    def touch(self, path: str) -> None:
        self.base.touch(path)

    def write_bytes(self, path: str, data: bytes,
                    overwrite: bool = True) -> None:
        self.base.write_bytes(path, data, overwrite=overwrite)

    def read_bytes(self, path: str) -> bytes:
        try:
            return self.base.read_bytes(path)
        except FileNotFoundError:
            self._reconcile(path)
            return self.base.read_bytes(path)

    def list_names(self, path: str):
        self._reconcile(path)
        return self.base.list_names(path)

    # -- the conditional put -------------------------------------------

    def rename_no_replace(self, src: str, dst: str) -> bool:
        mode = self.fail.pop(0) if self.fail else None
        if mode == "lost_call":
            raise TimeoutError("injected: call lost before the claim")
        if not self.base.exists(src):
            return False          # another renamer consumed src first
        at = self.coord.claim(dst, src)
        if at is None:
            got = self.coord.get(dst)
            if got is not None and got[1] and not self.base.exists(dst):
                # ORPHANED claim: completed long ago but its object was
                # deleted out-of-band (an operator rm of the lease
                # lock).  LocalFS semantics for that state are "slot
                # free" (the file is simply gone) — match them: take
                # the slot over with an atomic reclaim conditioned on
                # the orphan's identity.  An INCOMPLETE claim is never
                # treated as orphaned (its copy may still be
                # completable from src — fail closed).
                re_at = self.coord.reclaim(dst, src, got[2])
                if re_at is not None:
                    if not self._publish_won(dst, src, re_at):
                        return False
                    return True
                got = self.coord.get(dst)
            # slot claimed: complete a crashed winner's copy before
            # reporting the loss, so the loser's read-back sees the
            # winner's payload, not a hole
            if got is not None and not got[1]:
                self._complete(dst, got[0], got[2])
            return False
        if mode == "crash_after_claim":
            raise TimeoutError("injected: died between claim and copy")
        if not self._publish_won(dst, src, at):
            return False
        if mode == "lost_ack":
            raise TimeoutError("injected: publish landed, ack lost")
        return True

    def _publish_won(self, dst: str, src: str, at: float) -> bool:
        """Winner-path tail after a successful claim (identity ``at``):
        land the payload and consume the source.  If the source
        vanished before the copy (an external GC of the caller's own
        staged file — LocalFS's os.link raises FileNotFoundError and
        reports a clean loss there), release OUR fresh claim and report
        False: returning True with no payload published would be a
        data-losing false win, and leaving the empty claim would block
        the slot."""
        if self._complete(dst, src, at):
            # a True from _complete means A payload is published; a WIN
            # means OUR payload is.  If the slot was deleted mid-publish
            # (released our claim) and a successor took it over, the
            # published payload is the successor's — report a loss
            # rather than double-winning the slot.
            got = self.coord.get(dst)
            if got is None or got[0] != src or got[2] != at:
                return False
            self.base.delete(src, recursive=False)
            return True
        got = self.coord.get(dst)
        # release only OUR claim (matched by source — staged tmp names
        # are uuid-unique), never a successor's fresh row
        if got is not None and not got[1] and got[0] == src:
            self.coord.forget_if(dst, got[2])
        return False


class CondPutObjectFS:
    """The CLAIM-FREE conditional-put LogStore: the payload store
    itself provides an atomic put-if-absent (S3 ``If-None-Match: *``
    conditional PUT, GCS ``ifGenerationMatch=0``, ABS ``If-None-Match``)
    so the payload IS the claim — no coordinator, no claim rows, and
    reconciliation disappears entirely (there is no state in which a
    slot is claimed but unreadable).

    ``base`` must expose ``put_if_absent(path, data) -> bool`` with
    full-object atomicity — of any set of concurrent putters for one
    key, exactly one True, and the key then holds exactly that caller's
    complete payload — plus the plain object surface.  Everything but
    ``rename_no_replace`` delegates.

    Crash anatomy: the only crash window is *after* the conditional PUT
    landed and *before* the staged source is deleted — the source
    merely leaks (vacuum reaps aged .tmp- files) and the outcome is
    decided, because the PUT was the commit point.  A call lost in
    flight surfaces as an exception with the outcome unknown; commit()
    resolves it by reading the slot back, same as every backend.

    ``fail`` mirrors the contract suite's injection hooks ("lost_call"
    raises before anything happens, "lost_ack" raises after the publish
    fully landed); there is no "crash_after_claim" — that window does
    not exist in this shape."""

    BACKEND = "condput"
    RENAME_PRESERVES_MTIME = False   # the conditional PUT stamps now

    def __init__(self, base):
        self.base = base
        self.fail: list[str] = []

    def exists(self, path: str) -> bool:
        return self.base.exists(path)

    def mkdirs(self, path: str) -> None:
        self.base.mkdirs(path)

    def delete(self, path: str, recursive: bool = True) -> bool:
        return self.base.delete(path, recursive=recursive)

    def mtime(self, path: str) -> float:
        return self.base.mtime(path)

    def touch(self, path: str) -> None:
        self.base.touch(path)

    def write_bytes(self, path: str, data: bytes,
                    overwrite: bool = True) -> None:
        self.base.write_bytes(path, data, overwrite=overwrite)

    def read_bytes(self, path: str) -> bytes:
        return self.base.read_bytes(path)

    def list_names(self, path: str):
        return self.base.list_names(path)

    def rename_no_replace(self, src: str, dst: str) -> bool:
        mode = self.fail.pop(0) if self.fail else None
        if mode == "lost_call":
            raise TimeoutError("injected: PUT lost before landing")
        try:
            data = self.base.read_bytes(src)
        except FileNotFoundError:
            return False          # another renamer consumed src first
        if not self.base.put_if_absent(dst, data):
            return False
        # the PUT was the commit point; the source is now just staging
        # garbage — best-effort delete, vacuum reaps a leak
        self.base.delete(src, recursive=False)
        if mode == "lost_ack":
            raise TimeoutError("injected: publish landed, ack lost")
        return True


class LocalCondPutStore:
    """Posix payload store exposing the atomic ``put_if_absent``
    primitive CondPutObjectFS needs: full-content tmp write published
    through LocalFS's rename_no_replace (creation-atomic AND
    content-atomic — a reader can never observe a torn object, exactly
    the S3 conditional-PUT guarantee — including the hardlink-less
    mount fallback).  Plain operations delegate to
    :class:`commitlog.LocalFS`."""

    def __init__(self):
        from covsonar_spark.commitlog import LocalFS

        self._fs = LocalFS()

    def __getattr__(self, name):
        return getattr(self._fs, name)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        import uuid

        # full-content tmp write, then LocalFS's own rename_no_replace
        # publishes it: that primitive already probes for hardlink
        # support per directory and falls back to the mkdir-mutex
        # emulation on hardlink-less mounts (exFAT / SMB / FUSE) — a
        # raw os.link here would crash every condput publish exactly
        # where the stock backend keeps working
        tmp = f"{path}.cp-{uuid.uuid4().hex[:8]}"
        self._fs.write_bytes(tmp, data, overwrite=True)
        if self._fs.rename_no_replace(tmp, path):
            return True
        self._fs.delete(tmp, recursive=False)
        return False


def local_cas_logstore(root: str):
    """The deployable local composition: payload bytes on the local
    filesystem, claims in ``<root>/_log/.cas.sqlite`` — a single-box
    stand-in wired exactly like the S3+DynamoDB deployment (swap the
    two constructor arguments for the real adapters)."""
    from covsonar_spark.commitlog import LOG_DIR, LocalFS

    base = LocalFS()
    base.mkdirs(f"{root}/{LOG_DIR}")
    return CasObjectFS(base, SQLiteCoordinator(
        os.path.join(root, LOG_DIR, ".cas.sqlite")))


KNOWN_BACKENDS = ("cas", "condput")


def env_logstore(root: str):
    """The LogStore selected by ``SONAR_LOGSTORE`` for a LOCAL root
    (None = stock).  Tools that build a CommitLog directly (stress
    harnesses, admin scripts) must go through this — constructing with
    the default backend on a coordinator-arbitrated root trips the
    mixed-writer guard by design.  An unknown value RAISES: silently
    falling back to stock on a typo (``SONAR_LOGSTORE=CAS``) would
    leave the operator believing a coordinator is arbitrating — and on
    a fresh root no marker would ever be recorded to catch it."""
    backend = os.environ.get("SONAR_LOGSTORE")
    if backend == "cas":
        return local_cas_logstore(root)
    if backend == "condput":
        return local_condput_logstore(root)
    if backend not in (None, "", "fs", "stock"):
        raise ValueError(
            f"unknown SONAR_LOGSTORE={backend!r}: expected one of "
            f"{KNOWN_BACKENDS} (or unset/'fs'/'stock' for the default "
            "backend)")
    return None


def local_condput_logstore(root: str):
    """The deployable local composition of the claim-free shape:
    payload bytes on the local filesystem whose put-if-absent is a
    tmp-write + hardlink — swap :class:`LocalCondPutStore` for an S3
    adapter whose ``put_if_absent`` issues ``PUT`` with
    ``If-None-Match: *`` and the same store runs on raw S3 with no
    coordinator at all."""
    from covsonar_spark.commitlog import LOG_DIR

    base = LocalCondPutStore()
    base.mkdirs(f"{root}/{LOG_DIR}")
    return CondPutObjectFS(base)
