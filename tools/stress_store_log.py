"""Cross-PROCESS stress of the COMMIT-LOG store protocol (round-6
counterpart of stress_store_procs.py, which covers the posix rename
protocol): real OS processes on a ``viewfs://`` mount — the remote-
scheme path where mutations go through commitlog.py instead of rename
pairs — including a genuine ``kill -9`` inside the mutation window.

Phases:

1. reader-under-writer — a reader process hammers ``table("genomes")``
   while the parent runs back-to-back update_metadata commits.
   Contract: every read resolves ONE committed snapshot — exactly N
   rows, never 0, never a mix of two versions.
2. competing writers — two writer processes each apply K sequential
   updates to DISJOINT columns; the advisory lease serializes them and
   the put-if-absent commit is the correctness backstop (a writer
   retries on StoreWriteConflict).  Contract: no lost update AND a
   strictly linear version history (one commit per applied update).
3. kill -9 mid-mutation — a writer child hangs after STAGING its data
   dirs but before the commit rename; the parent SIGKILLs it there.
   Contract: nothing was published (readers still see the pre-crash
   snapshot), the stale advisory lease breaks on timeout, the next
   writer proceeds, and vacuum reaps the orphaned staged dirs.

Usage:
    python tools/stress_store_log.py              # orchestrate all
    python tools/stress_store_log.py <phase> ...  # internal (children)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GENOMES = 24
READ_SECONDS = 25.0
K_UPDATES = 5
MOUNT = "stresslog"


def _spark(name: str, backing: str):
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]").appName(name)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.showConsoleProgress", "false")
         .getOrCreate())
    s.sparkContext._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{MOUNT}.link./db", "file://" + backing)
    return s


def _uri() -> str:
    return f"viewfs://{MOUNT}/db"


def _open(spark):
    from covsonar_spark.store import SonarStore
    return SonarStore.open(spark, _uri(),
                           ref_path="/root/reference/lib/ref.fna",
                           gff_path="/root/reference/lib/ref.gff3")


def seed(backing: str) -> None:
    import random

    spark = _spark("log-stress-seed", backing)
    st = _open(spark)
    rng = random.Random(7)
    ref = st.ref_seq
    rows = []
    for i in range(N_GENOMES):
        s = list(ref)
        for _ in range(10):
            p = rng.randrange(300, len(s) - 300)
            s[p] = rng.choice("ACGT")
        rows.append((f"ACC{i:04d}", "stress genome", "".join(s)))
    recs = spark.createDataFrame(
        rows, "accession string, description string, sequence string")
    rep = st.add_fasta_df(recs)
    assert rep["paranoid_mismatches"] == [], rep
    assert st.table("genomes").count() == N_GENOMES
    assert len(st._log.versions()) == 1      # one atomic ingest commit


# ---------------------------------------------------------------- children

def child_reader(backing: str, seconds: float) -> None:
    spark = _spark("log-stress-reader", backing)
    st = _open(spark)
    deadline = time.time() + seconds
    reads = transients = 0
    while time.time() < deadline:
        try:
            df = st.table("genomes")
            n = df.count()
            n_acc = df.select("accession").distinct().count()
        except Exception:  # noqa: BLE001 — a vacuum could unlink a
            # superseded dir under a long-running plan; visible and
            # retryable is within contract (this stress never vacuums
            # concurrently, so transients here would be unexpected)
            transients += 1
            continue
        if n != N_GENOMES or n_acc != N_GENOMES:
            print(json.dumps({"ok": False, "read": reads,
                              "n": n, "n_acc": n_acc}))
            sys.exit(1)
        reads += 1
    print(json.dumps({"ok": True, "reads": reads,
                      "transient_errors": transients}))


def child_writer(backing: str, col: str, k: int) -> None:
    """k sequential updates; StoreWriteConflict (losing the commit race
    after a broken lease) is retried — the documented caller contract."""
    from covsonar_spark.commitlog import StoreWriteConflict

    spark = _spark(f"log-stress-writer-{col}", backing)
    st = _open(spark)
    accs = [f"ACC{i:04d}" for i in range(N_GENOMES)]
    conflicts = 0
    for i in range(k):
        upd = spark.createDataFrame(
            [(a, f"{col}-v{i}-{a}") for a in accs],
            f"accession string, {col} string")
        while True:
            try:
                st.update_metadata(upd)
                break
            except StoreWriteConflict:
                conflicts += 1
    print(json.dumps({"ok": True, "col": col, "last": k - 1,
                      "conflicts": conflicts}))


def child_killstage(backing: str, marker: str) -> None:
    """Run one mutation but hang (to be SIGKILLed) after staging the
    data dirs, BEFORE the commit — the protocol's only crash window."""
    import covsonar_spark.store as store_mod
    from pyspark.sql import functions as F

    spark = _spark("log-stress-killstage", backing)
    st = _open(spark)
    real_commit = store_mod.SonarStore._mutation_session

    orig_stage = store_mod.SonarStore._stage_write

    def stage_hook(self, name, df, replace, shape=True):
        orig_stage(self, name, df, replace, shape=shape)
        with open(marker, "w") as fh:
            fh.write("staged\n")
        time.sleep(600)              # parent kills us here
    store_mod.SonarStore._stage_write = stage_hook
    del real_commit
    upd = st.table("genomes").select(
        "accession", F.lit("doomed").alias("zip"))
    st.update_metadata(upd)          # never returns


def child_postcrash_read(backing: str) -> None:
    spark = _spark("log-stress-postread", backing)
    st = _open(spark)
    df = st.table("genomes")
    rows = df.select("accession", "technology").orderBy("accession").collect()
    print(json.dumps({"ok": True, "n": len(rows),
                      "sample_acc": rows[0]["accession"],
                      "sample": rows[0]["technology"]}))


# ------------------------------------------------------------ orchestration

def _run_child(phase: str, *args: str, wait: bool = True):
    cmd = [sys.executable, os.path.abspath(__file__), phase, *args]
    suffix = "".join(c if c.isalnum() else "_"
                     for c in (args[-1] if args else ""))[-8:]
    errlog = open(os.path.join(tempfile.gettempdir(),
                               f"log-stress-{phase}-{suffix}.err"), "w")
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=errlog,
                         text=True, cwd=REPO)
    if not wait:
        return p
    out, _ = p.communicate(timeout=600)
    line = out.strip().splitlines()[-1] if out.strip() else "{}"
    return p.returncode, json.loads(line)


def orchestrate(backing: str) -> None:
    from pyspark.sql import functions as F

    print("== seed (ingest through the commit log)", flush=True)
    seed(backing)
    spark = _spark("log-stress-parent", backing)
    st = _open(spark)

    print("== phase 1: reader process under writer commits", flush=True)
    reader = _run_child("reader", backing, str(READ_SECONDS), wait=False)
    t_end = time.time() + READ_SECONDS - 3
    i = 0
    while time.time() < t_end:
        upd = spark.createDataFrame(
            [(f"ACC{j:04d}", f"wave-{i}") for j in range(N_GENOMES)],
            "accession string, technology string")
        st.update_metadata(upd)
        i += 1
    out, _ = reader.communicate(timeout=120)
    res = json.loads(out.strip().splitlines()[-1])
    assert reader.returncode == 0 and res["ok"], f"reader violation: {res}"
    assert res["reads"] >= 5, f"reader starved: {res}"
    print(f"   reader: {res['reads']} clean reads across {i} commits "
          f"({res['transient_errors']} transients)")

    print("== phase 2: two competing writer processes", flush=True)
    v_before = len(st._log.versions())
    w1 = _run_child("writer", backing, "zip", str(K_UPDATES), wait=False)
    w2 = _run_child("writer", backing, "lab", str(K_UPDATES), wait=False)
    for w, col in ((w1, "zip"), (w2, "lab")):
        out, _ = w.communicate(timeout=600)
        assert w.returncode == 0, f"writer {col} failed: {out}"
    final = st.table("genomes")
    last = f"v{K_UPDATES - 1}-"
    n_zip = final.where(F.col("zip").startswith(f"zip-{last}")).count()
    n_lab = final.where(F.col("lab").startswith(f"lab-{last}")).count()
    assert n_zip == N_GENOMES, f"lost zip updates: {n_zip}/{N_GENOMES}"
    assert n_lab == N_GENOMES, f"lost lab updates: {n_lab}/{N_GENOMES}"
    vs = st._log.versions()
    assert vs == list(range(vs[0], vs[0] + len(vs))), f"gapped log: {vs}"
    assert len(vs) == v_before + 2 * K_UPDATES, \
        f"commit count {len(vs)} != {v_before} + {2 * K_UPDATES}"
    print(f"   no lost updates; linear history of {len(vs)} versions")

    print("== phase 3: kill -9 after staging, before commit", flush=True)
    pre = {r["accession"]: r["technology"]
           for r in final.select("accession", "technology").collect()}
    marker = os.path.join(backing, "MIDSTAGE_MARKER")
    v_pre_kill = st._log.latest()[0]
    killer = _run_child("killstage", backing, marker, wait=False)
    for _ in range(1200):
        if os.path.exists(marker):
            break
        time.sleep(0.1)
    else:
        killer.kill()
        raise AssertionError("killstage child never reached staging")
    os.kill(killer.pid, signal.SIGKILL)
    killer.wait(timeout=60)

    # nothing was published: version unchanged, reads see pre-crash data
    assert st._log.latest()[0] == v_pre_kill, "phantom commit after kill"
    rc, res = _run_child("postcrash_read", backing)
    assert rc == 0 and res["ok"] and res["n"] == N_GENOMES, res
    assert res["sample"] == pre[res["sample_acc"]], \
        f"post-kill read not the pre-crash snapshot: {res}"
    print("   post-kill reader served the committed snapshot")

    # recovery: the dead writer's advisory lease blocks politely until
    # the lease timeout; an operator (or the timeout) clears it and the
    # next mutation proceeds; vacuum reaps the orphaned staged dirs
    st._log.release_lease()            # operator action / lease expiry
    upd = spark.createDataFrame(
        [(f"ACC{j:04d}", "recovered") for j in range(N_GENOMES)],
        "accession string, technology string")
    st.update_metadata(upd)
    assert st.table("genomes").where(
        F.col("technology") == "recovered").count() == N_GENOMES
    reaped = st._log.vacuum(
        {t: st._data_area(t) for t in
         ("genomes", "sequences", "profiles", "dna_variants",
          "prot_variants")}, retain_last=2, min_age_s=0.0)
    assert reaped >= 1, "orphaned staged dirs not reaped"
    assert st.table("genomes").count() == N_GENOMES
    print(f"   store mutable again; vacuum reaped {reaped} orphan dir(s)")
    print("ALL PHASES PASS")


def main() -> None:
    if len(sys.argv) == 1:
        backing = tempfile.mkdtemp(prefix="log-stress-")
        try:
            orchestrate(backing)
        finally:
            import shutil
            shutil.rmtree(backing, ignore_errors=True)
        return
    phase, args = sys.argv[1], sys.argv[2:]
    {"reader": lambda: child_reader(args[0], float(args[1])),
     "writer": lambda: child_writer(args[0], args[1], int(args[2])),
     "killstage": lambda: child_killstage(args[0], args[1]),
     "postcrash_read": lambda: child_postcrash_read(args[0]),
     }[phase]()


if __name__ == "__main__":
    main()
