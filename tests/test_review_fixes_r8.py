"""Round-8 review fixes — regression tests.

1. Gate-break TOCTOU (ADVICE r7 medium, commitlog.py): breaking a
   stale mkdir-gate is now an ATOMIC rename to a unique name, so of
   any set of concurrent breakers exactly one succeeds, and the
   breaker restores a gate whose owner changed between diagnosis and
   break.  The old rmdir+retry break let a losing breaker delete the
   winner's freshly re-created LIVE gate → two writers in the
   critical section → silently clobbered commit.
2. Vacuum lease wait (ADVICE r7 low, store.py): standalone vacuum
   acquires the writer lease with a wait that OUTLASTS the lease
   staleness threshold, so post-crash GC succeeds on first invocation
   instead of TimeoutError-ing for up to ~50 minutes.
3. Session-mutex timeout (ADVICE r7 low, store.py): a second writer
   thread on the same handle now gets the same TimeoutError a second
   writer process gets, instead of blocking forever.
"""
import os
import threading
import time

import pytest

from covsonar_spark.commitlog import CommitLog, LocalFS


def _stale_gate(d: str, dst_name: str, owner: str | None = "dead"):
    gate = os.path.join(d, dst_name + ".gate")
    os.mkdir(gate)
    old = time.time() - 3600
    if owner is not None:
        stamp = os.path.join(gate, "owner")
        with open(stamp, "w") as fh:
            fh.write(owner)
        os.utime(stamp, (old, old))   # staleness reads the stamp mtime
    os.utime(gate, (old, old))
    return gate


# -- 1. atomic gate break --------------------------------------------------

def test_gate_break_storm_one_winner(tmp_path):
    """Many threads hit a STALE gate simultaneously (every one of them
    qualifies as a breaker): exactly one publishes, the payload is
    complete, no gate or broken-gate debris survives."""
    fs = LocalFS()
    d = str(tmp_path)
    fs._link_ok[d] = False
    for rnd in range(4):
        dst = os.path.join(d, f"commit-{rnd}")
        _stale_gate(d, f"commit-{rnd}")
        wins: list[str] = []
        barrier = threading.Barrier(8)

        def racer(i, dst=dst, wins=wins, barrier=barrier):
            src = f"{dst}.src-{i}"
            with open(src, "w") as fh:
                fh.write(f"payload-{i}")
            barrier.wait()
            if fs.rename_no_replace(src, dst):
                wins.append(f"payload-{i}")
        ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1, wins
        assert open(dst).read() == wins[0]
        leftovers = [n for n in os.listdir(d) if ".gate" in n]
        assert leftovers == [], leftovers


def test_gate_break_unstamped_stale_gate(tmp_path):
    """A stale gate with NO owner stamp (holder died between mkdir and
    stamp, or a pre-r8 gate) is still breakable."""
    fs = LocalFS()
    d = str(tmp_path)
    fs._link_ok[d] = False
    _stale_gate(d, "c1", owner=None)
    src = os.path.join(d, "s1")
    with open(src, "w") as fh:
        fh.write("x")
    assert fs.rename_no_replace(src, os.path.join(d, "c1")) is True
    assert not os.path.exists(os.path.join(d, "c1.gate"))


def test_gate_break_wrongful_claim_is_revoked(tmp_path, monkeypatch):
    """When the generation re-verify under the claim disagrees with
    the diagnosis (the gate the breaker observed stale was replaced
    between diagnosis and claim), the claim is REVOKED without
    touching the gate at the path; the breaker then re-diagnoses the
    real generation.  Simulated by making the first state read return
    a previous generation's owner."""
    import shutil as _sh

    fs = LocalFS()
    d = str(tmp_path)
    fs._link_ok[d] = False
    gate = _stale_gate(d, "c2", owner="dead-2")
    # back-date the owner stamp too: staleness reads the stamp's mtime
    old = time.time() - 3600
    os.utime(os.path.join(gate, "owner"), (old, old))
    src = os.path.join(d, "s2")
    with open(src, "w") as fh:
        fh.write("x")

    real_state = LocalFS._gate_state
    reads = {"n": 0}

    def fake_state(self, path):
        reads["n"] += 1
        if reads["n"] == 1:
            return "previous-generation", True    # stale diagnosis
        return real_state(self, path)

    rmtrees: list[str] = []
    real_rmtree = _sh.rmtree

    def spy_rmtree(path, *a, **kw):
        rmtrees.append(path)
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(LocalFS, "_gate_state", fake_state)
    monkeypatch.setattr(_sh, "rmtree", spy_rmtree)
    assert fs.rename_no_replace(src, os.path.join(d, "c2")) is True
    # first claim verified against a mismatched generation → revoked
    # with NO removal; the second claim (real diagnosis) TOOK OVER the
    # gate by rewriting its owner stamp — the only rmtree of the gate
    # is the new owner's release at the end of its critical section
    assert reads["n"] >= 3
    assert [p for p in rmtrees if p.endswith(".gate")] == [gate]
    assert not os.path.exists(gate)
    assert not os.path.exists(gate + ".claim")


def test_gate_release_spares_foreign_gate(tmp_path):
    """The critical-section release only removes OUR gate: if the gate
    at that path now belongs to another holder (our gate was broken
    and a fresh one created), it is left alone."""
    fs = LocalFS()
    d = str(tmp_path)
    fs._link_ok[d] = False
    dst = os.path.join(d, "c3")
    src = os.path.join(d, "s3")
    with open(src, "w") as fh:
        fh.write("x")

    # enter the critical section, then swap the gate under the holder
    # before its finally runs
    orig_replace = os.replace
    gate = dst + ".gate"

    def swap_then_replace(a, b):
        orig_replace(a, b)
        # simulate: our gate broken away + a foreign holder's fresh gate
        for n in os.listdir(gate):
            os.unlink(os.path.join(gate, n))
        with open(os.path.join(gate, "owner"), "w") as fh:
            fh.write("foreign-holder")

    os.replace = swap_then_replace
    try:
        assert fs.rename_no_replace(src, dst) is True
    finally:
        os.replace = orig_replace
    assert os.path.isdir(gate)                       # spared
    assert LocalFS._gate_owner(gate) == "foreign-holder"


def test_vacuum_reaps_stamped_gates_and_claim_debris(tmp_path, spark):
    """Gates now hold an owner file (a DIR, not empty) and a breaker
    that dies between claim and removal leaves a ``.gate.claim`` dir;
    vacuum reaps both once past the min-age floor, and spares a LIVE
    (young) gate."""
    root = str(tmp_path / "store")
    log = CommitLog(spark, root)
    log.fs.mkdirs(log.log_dir)
    log.commit(0, {"genomes": []})
    old = time.time() - 7200
    stale = os.path.join(log.log_dir, "v1.json.gate")
    os.mkdir(stale)
    with open(os.path.join(stale, "owner"), "w") as fh:
        fh.write("dead")
    os.utime(stale, (old, old))
    claim = os.path.join(log.log_dir, "v1.json.gate.claim")
    os.mkdir(claim)
    os.utime(claim, (old, old))
    live = os.path.join(log.log_dir, "v2.json.gate")
    os.mkdir(live)
    log.vacuum({}, retain_last=2, min_age_s=3600.0)
    assert not os.path.exists(stale)
    assert not os.path.exists(claim)
    assert os.path.exists(live)                      # under min-age
    os.rmdir(live)


# -- 2./3. store lease + mutex waits --------------------------------------

def test_vacuum_lease_wait_outlasts_staleness(tmp_path, spark):
    """Standalone vacuum asks for the lease with a wait >= the 3600s
    staleness threshold, so a crashed writer's fresh-looking lease
    cannot TimeoutError it (it waits out the staleness clock instead);
    an explicit lease_wait is passed through verbatim."""
    from covsonar_spark.store import SonarStore

    st = SonarStore.open(spark, str(tmp_path / "s"))
    seen: list[float] = []
    real = st._log.acquire_lease

    def spy(timeout=600.0, lease_timeout=3600.0):
        seen.append(timeout)
        return real(timeout=timeout, lease_timeout=lease_timeout)

    st._log.acquire_lease = spy
    st.vacuum()
    assert seen and seen[-1] >= 3600.0
    st.vacuum(lease_wait=5.0)
    assert seen[-1] == 5.0
    st._log.acquire_lease = real


def test_second_writer_thread_times_out_not_blocks(tmp_path, spark):
    """A second writer THREAD on the same handle fails with the same
    TimeoutError diagnostic a second writer process gets, instead of
    blocking forever on the session mutex."""
    from covsonar_spark.store import SonarStore

    st = SonarStore.open(spark, str(tmp_path / "s"))
    entered = threading.Event()
    release = threading.Event()
    errs: list[Exception] = []

    def holder():
        with st._mutation_session():
            entered.set()
            release.wait(30.0)

    t = threading.Thread(target=holder, daemon=True)
    t.start()
    assert entered.wait(30.0)
    try:
        with pytest.raises(TimeoutError, match="mutation session"):
            with st._mutation_session(lease_wait=0.3):
                pass
    finally:
        release.set()
        t.join(30.0)
