"""Cross-PROCESS store stress (VERDICT r3 #5): the single-writer lease
and old-or-new swap contract (store.py mutation_lock/_overwrite/_heal)
exercised by real OS processes, not threads — including a genuine
``kill -9`` between ``_overwrite``'s two renames.

Three phases, each with its own child process(es), each child a full
Python+Spark process (``local[4]``, its own JVM):

1. reader-under-writer — a reader process hammers ``table("genomes")``
   (count + a full-scan aggregate) while the parent runs back-to-back
   overwrite mutations (update_metadata). Contract: every read sees a
   complete table generation — exactly N rows, never 0, never partial.
2. competing writers — two writer processes each apply K sequential
   metadata updates to DISJOINT columns under the lease. Contract: no
   lost update — the final table holds BOTH writers' last values.
3. kill -9 mid-swap — a writer child patches the store module's
   ``os.rename`` to drop a marker and hang AFTER ``rename(final, old)``
   (the worst crash window: the table path does not exist); the parent
   SIGKILLs it there, verifies a reader process still serves the
   ``.old`` snapshot (old-or-new, never empty), breaks the dead
   writer's stale lease the way a recovering deployment would, and
   verifies ``_heal`` restores the table for the next writer.

Usage:
    python tools/stress_store_procs.py              # orchestrate all
    python tools/stress_store_procs.py <phase> ...  # internal (children)
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GENOMES = 24
READ_SECONDS = 25.0
K_UPDATES = 6


def _spark(name: str):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master("local[4]").appName(name)
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.showConsoleProgress", "false")
            .getOrCreate())


def _open(spark, root):
    from covsonar_spark.store import SonarStore
    return SonarStore.open(spark, root,
                           ref_path="/root/reference/lib/ref.fna",
                           gff_path="/root/reference/lib/ref.gff3")


def seed(root: str) -> None:
    """Parent: ingest N_GENOMES mutated genomes."""
    import random

    spark = _spark("store-stress-seed")
    st = _open(spark, root)
    rng = random.Random(7)
    ref = st.ref_seq
    rows = []
    for i in range(N_GENOMES):
        s = list(ref)
        for _ in range(10):
            p = rng.randrange(300, len(s) - 300)
            s[p] = rng.choice("ACGT")
        rows.append((f"ACC{i:04d}", "stress genome", "".join(s)))
    recs = spark.createDataFrame(rows, "accession string, description string, sequence string")
    rep = st.add_fasta_df(recs)
    assert rep["paranoid_mismatches"] == [], rep
    assert st.table("genomes").count() == N_GENOMES


# ---------------------------------------------------------------- children

def child_reader(root: str, seconds: float) -> None:
    """Hammer reads; any 0-row / partial / failed read is a contract
    violation. Prints one JSON line with the observed generations."""
    spark = _spark("store-stress-reader")
    st = _open(spark, root)
    deadline = time.time() + seconds
    reads = transients = 0
    while time.time() < deadline:
        try:
            df = st.table("genomes")
            n = df.count()
            # full-scan aggregate: real file reads, not footer counts
            n_acc = df.select("accession").distinct().count()
        except Exception:  # noqa: BLE001
            # a swap landed between this plan's file listing and its
            # scan: a VISIBLE, retryable error is within contract
            # (old-or-new or an error — never a silently wrong result)
            transients += 1
            continue
        if n != N_GENOMES or n_acc != N_GENOMES:
            print(json.dumps({"ok": False, "read": reads,
                              "n": n, "n_acc": n_acc}))
            sys.exit(1)
        reads += 1
    print(json.dumps({"ok": True, "reads": reads,
                      "transient_errors": transients}))


def child_writer(root: str, col: str, k: int) -> None:
    """k sequential single-column metadata updates under the lease."""
    spark = _spark(f"store-stress-writer-{col}")
    st = _open(spark, root)
    accs = [f"ACC{i:04d}" for i in range(N_GENOMES)]
    for i in range(k):
        # updates are LITERAL rows (the caller's own data), not a read
        # of the live table: deriving an update from an un-leased read
        # races the competing writer's swap by construction — that is a
        # caller bug, not a store one
        upd = spark.createDataFrame(
            [(a, f"{col}-v{i}-{a}") for a in accs],
            f"accession string, {col} string")
        st.update_metadata(upd)
    print(json.dumps({"ok": True, "col": col, "last": k - 1}))


def child_killswap(root: str, marker: str) -> None:
    """Run one overwrite mutation but hang (to be SIGKILLed) right
    after ``os.rename(final, old)`` — the window where the table path
    is gone and only ``.old`` + ``.tmp`` exist."""
    import covsonar_spark.store as store_mod
    from pyspark.sql import functions as F

    real_rename = os.rename

    def rename_hook(src, dst):
        real_rename(src, dst)
        if dst.endswith("genomes.old"):
            with open(marker, "w") as fh:
                fh.write("mid-swap\n")
            time.sleep(600)          # parent kills us here

    spark = _spark("store-stress-killswap")
    st = _open(spark, root)
    store_mod.os.rename = rename_hook
    upd = st.table("genomes").select(
        "accession", F.lit("doomed").alias("zip"))
    st.update_metadata(upd)          # never returns


# ------------------------------------------------------------ orchestration

def _run_child(phase: str, *args: str, wait: bool = True):
    cmd = [sys.executable, os.path.abspath(__file__), phase, *args]
    suffix = "".join(c if c.isalnum() else "_" for c in (args[-1] if args else ""))[-8:]
    errlog = open(os.path.join(tempfile.gettempdir(),
                               f"store-stress-{phase}-{suffix}.err"), "w")
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=errlog,
                         text=True, cwd=REPO)
    if not wait:
        return p
    out, _ = p.communicate(timeout=600)
    line = out.strip().splitlines()[-1] if out.strip() else "{}"
    return p.returncode, json.loads(line)


def orchestrate(root: str) -> None:
    from pyspark.sql import functions as F

    print("== seed", flush=True)
    seed(root)
    spark = _spark("store-stress-parent")
    st = _open(spark, root)

    print("== phase 1: reader process under writer mutations", flush=True)
    reader = _run_child("reader", root, str(READ_SECONDS), wait=False)
    t_end = time.time() + READ_SECONDS - 3
    i = 0
    while time.time() < t_end:
        upd = st.table("genomes").select(
            "accession", F.lit(f"wave-{i}").alias("technology"))
        st.update_metadata(upd)
        i += 1
    out, _ = reader.communicate(timeout=120)
    res = json.loads(out.strip().splitlines()[-1])
    assert reader.returncode == 0 and res["ok"], f"reader violation: {res}"
    assert res["reads"] >= 5, f"reader starved: {res}"
    print(f"   reader: {res['reads']} clean reads across {i} overwrites")

    print("== phase 2: two competing writer processes", flush=True)
    w1 = _run_child("writer", root, "zip", str(K_UPDATES), wait=False)
    w2 = _run_child("writer", root, "lab", str(K_UPDATES), wait=False)
    for w, col in ((w1, "zip"), (w2, "lab")):
        out, _ = w.communicate(timeout=600)
        assert w.returncode == 0, f"writer {col} failed: {out}"
    final = st.table("genomes")
    last = f"v{K_UPDATES - 1}-"
    n_zip = final.where(F.col("zip").startswith(f"zip-{last}")).count()
    n_lab = final.where(F.col("lab").startswith(f"lab-{last}")).count()
    assert n_zip == N_GENOMES, f"lost zip updates: {n_zip}/{N_GENOMES}"
    assert n_lab == N_GENOMES, f"lost lab updates: {n_lab}/{N_GENOMES}"
    print(f"   both writers' final values present on all {N_GENOMES} rows")

    print("== phase 3: kill -9 between the swap renames", flush=True)
    pre = {r["accession"]: r["technology"]
           for r in final.select("accession", "technology").collect()}
    marker = os.path.join(root, "MIDSWAP_MARKER")
    killer = _run_child("killswap", root, marker, wait=False)
    for _ in range(1200):
        if os.path.exists(marker):
            break
        time.sleep(0.1)
    else:
        killer.kill()
        raise AssertionError("killswap child never reached mid-swap")
    os.kill(killer.pid, signal.SIGKILL)
    killer.wait(timeout=60)
    gpath = os.path.join(root, "genomes")
    assert not os.path.exists(gpath), "child died before the crash window?"
    assert os.path.isdir(gpath + ".old"), "no .old snapshot at crash"

    # a fresh READER process must still see the pre-crash table (the
    # dead writer's lease is young, so heal defers and .old serves)
    rc, res = _run_child("postcrash_read", root)
    assert rc == 0 and res["ok"] and res["n"] == N_GENOMES, res
    assert res["sample"] == pre[res["sample_acc"]], \
        f"mid-swap read not the pre-crash snapshot: {res}"
    print("   post-kill reader served the .old snapshot")

    # recovery: break the dead writer's stale lease (what an operator/
    # lease timeout does), then the next open heals the table
    shutil.rmtree(os.path.join(root, ".lock"), ignore_errors=True)
    rc, res = _run_child("postcrash_heal", root)
    assert rc == 0 and res["ok"] and res["n"] == N_GENOMES, res
    assert os.path.isdir(gpath), "table not restored by heal"
    print("   heal restored the table; store mutable again")
    print("ALL PHASES PASS")


def child_postcrash_read(root: str) -> None:
    spark = _spark("store-stress-postread")
    st = _open(spark, root)
    df = st.table("genomes")
    rows = df.select("accession", "technology").orderBy("accession").collect()
    print(json.dumps({"ok": True, "n": len(rows),
                      "sample_acc": rows[0]["accession"],
                      "sample": rows[0]["technology"]}))


def child_postcrash_heal(root: str) -> None:
    from pyspark.sql import functions as F

    spark = _spark("store-stress-heal")
    st = _open(spark, root)
    n = st.table("genomes").count()        # triggers _heal under the lease
    # crash artifacts resolved BEFORE any new mutation (.old is
    # legitimately re-created by the next overwrite's retention)
    healed_clean = not os.path.isdir(os.path.join(root, "genomes.old"))
    upd = st.table("genomes").select(
        "accession", F.lit("healed").alias("zip"))
    st.update_metadata(upd)                # proves the lease is free again
    n2 = st.table("genomes").where(F.col("zip") == "healed").count()
    print(json.dumps({"ok": n == n2 and healed_clean, "n": n,
                      "healed_clean": healed_clean}))


def main() -> None:
    if len(sys.argv) == 1:
        with tempfile.TemporaryDirectory(prefix="sonar-stress-") as td:
            orchestrate(os.path.join(td, "store"))
        return
    phase = sys.argv[1]
    if phase == "reader":
        child_reader(sys.argv[2], float(sys.argv[3]))
    elif phase == "writer":
        child_writer(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    elif phase == "killswap":
        child_killswap(sys.argv[2], sys.argv[3])
    elif phase == "postcrash_read":
        child_postcrash_read(sys.argv[2])
    elif phase == "postcrash_heal":
        child_postcrash_heal(sys.argv[2])
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
