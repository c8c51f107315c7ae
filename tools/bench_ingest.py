"""Ingest throughput benchmark: the reference's heavy path (per-genome
EMBOSS alignment, sonar.py:643-663) as the engine runs it — mutated
-corpus FASTA → align/diff/profile pandas UDF → five-table write →
paranoid restore-and-compare on every genome.

Corpus: N copies of NC_045512.2 each mutated with ~25 SNPs, 3 indels
and an N run (seeded per genome — the hard multi-indel case for the
aligner's anchored divide-and-conquer).

Usage: python tools/bench_ingest.py [n_genomes]   (default 1024)
Reference points (local[32], otherwise idle, cold session, file-based
corpus; host speeds drift 1.3-2x between sessions — see
metrics.hostmark — so compare A/B on one host, not across days):
round-4 host: ~57 genomes/s e2e at 1024, ~105 at 2048, ~135 at 4096;
aligner UDF alone ~900-1050 genomes/s warm at 2048-4096 after the
round-4 numpy vectorization of variant derivation (same-host A/B vs
the round-3 code: 532 -> 1051 g/s at 4096, 1.98x; single-thread
align+derive 4.9x).  With the UDF at ~1000 g/s the e2e bottleneck is
back to the store write/paranoid envelope (~10 s fixed floor,
ARCHITECTURE.md).  The reference's own pipeline runs one EMBOSS
Stretcher subprocess per genome (~1-2 genomes/s/core).
"""

from __future__ import annotations

import random
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from covsonar_spark.functions.genetics import (harmonize, parse_gff3,  # noqa: E402
                                               read_fasta_one)
from covsonar_spark.session import get_spark  # noqa: E402
from covsonar_spark.store import SonarStore  # noqa: E402

REF_DIR = "/root/reference"


def mutate(ref: str, rng: random.Random) -> str:
    s = list(ref)
    for _ in range(25):                      # SNPs
        i = rng.randrange(100, len(s) - 100)
        s[i] = rng.choice("ACGT".replace(s[i], "A" if s[i] != "A" else "C"))
    seq = "".join(s)
    for _ in range(3):                       # indels
        i = rng.randrange(200, len(seq) - 200)
        if rng.random() < 0.5:
            seq = seq[:i] + seq[i + rng.randint(1, 9):]
        else:
            seq = seq[:i] + "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 9))) + seq[i:]
    i = rng.randrange(300, len(seq) - 300)   # an N run (ambiguity)
    seq = seq[:i] + "N" * rng.randint(5, 30) + seq[i + rng.randint(5, 30):]
    return seq


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    spark = get_spark("bench-ingest")
    _, _, ref = read_fasta_one(f"{REF_DIR}/lib/ref.fna")
    ref = harmonize(ref)
    cds = parse_gff3(f"{REF_DIR}/lib/ref.gff3", ref)

    # the corpus enters through a FASTA FILE and the distributed scan —
    # the real cold path (a driver-side createDataFrame of 30 MB of
    # Python strings measures py4j serialization, not the engine)
    import os

    from covsonar_spark.sources.fasta import read_fasta

    corpus_dir = tempfile.mkdtemp(prefix="bench_corpus_")
    fasta_path = os.path.join(corpus_dir, "corpus.fasta")
    with open(fasta_path, "w") as fh:
        for i in range(n):
            rng = random.Random(1_000_003 * i + 7)
            fh.write(f">bench{i:05d} bench genome {i}\n{mutate(ref, rng)}\n")
    # a 30 MB corpus is one HDFS split — fan it out so harmonize/SEGUID
    # and the dedup shuffle use every core (at real scale the file count
    # already provides the parallelism)
    records = read_fasta(spark, fasta_path, partitions=32)

    st = SonarStore(spark, tempfile.mkdtemp(prefix="bench_ingest_"), ref, cds)
    t0 = time.perf_counter()
    report = st.add_fasta_df(records)
    dt = time.perf_counter() - t0
    assert report["errors"] == {}, report["errors"]
    assert report["paranoid_mismatches"] == [], report["paranoid_mismatches"]
    assert report["added_accessions"] == n
    print(f"{n} genomes in {dt:.1f}s -> {n / dt:.1f} genomes/s "
          f"(file scan+align+diff+profile+write+paranoid)")

    # the aligner-UDF ceiling: just the fused align/diff/profile stage
    # over the same distinct sequences (workers warm from the ingest
    # above) — the upper bound any store-side optimization can reach
    from pyspark.sql import functions as F

    from covsonar_spark.operators.ingest import derive_profiles, harmonized

    seqs = (records.select(harmonized(F.col("sequence")).alias("sequence"))
            .select(F.sha1(F.col("sequence")).alias("seqhash"), "sequence")
            .dropDuplicates(["seqhash"]))
    for run in ("warm1", "warm2"):
        t0 = time.perf_counter()
        n_ok = derive_profiles(seqs, ref, cds).where(
            F.col("error").isNull()).count()
        dt_u = time.perf_counter() - t0
        assert n_ok == n, n_ok
        print(f"aligner UDF only ({run}): {n} genomes in {dt_u:.1f}s "
              f"-> {n / dt_u:.1f} genomes/s")


if __name__ == "__main__":
    main()
