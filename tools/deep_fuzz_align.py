"""One-off deep fuzz: many random mutated genomes through the full
process_sequence -> apply_variants round-trip, including the round-2
stressor classes (homopolymer indels, midpoint-anchor defeats, tandem
repeats, truncations, N runs)."""
import random
import sys
sys.path.insert(0, "/root/repo")
from covsonar_spark.functions.genetics import harmonize, parse_gff3, read_fasta_one
from covsonar_spark.operators.restore import apply_variants, apply_variants_aligned
from covsonar_spark.operators.variants import process_sequence

_, _, ref = read_fasta_one("/root/reference/lib/ref.fna")
ref = harmonize(ref)
cds = parse_gff3("/root/reference/lib/ref.gff3", ref)
BASES = "ACGT"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
fails = 0
for i in range(N):
    rng = random.Random(777_000_001 * i + 13)
    s = list(ref)
    # SNPs
    for _ in range(rng.randint(0, 40)):
        p = rng.randrange(300, len(s) - 300)
        if s[p] in BASES:
            s[p] = rng.choice(BASES.replace(s[p], ""))
    seq = "".join(s)
    # indels (incl. long)
    for _ in range(rng.randint(0, 6)):
        p = rng.randrange(400, len(seq) - 400)
        if rng.random() < 0.5:
            seq = seq[:p] + seq[p + rng.randint(1, 40):]
        else:
            seq = seq[:p] + "".join(rng.choice(BASES) for _ in range(rng.randint(1, 40))) + seq[p:]
    # homopolymer with embedded indel
    if rng.random() < 0.5:
        p = rng.randrange(1000, len(seq) - 1000)
        run = "A" * rng.randint(15, 120)
        seq = seq[:p] + run + seq[p + rng.randint(0, len(run)):]
    # tandem repeat expansion
    if rng.random() < 0.4:
        p = rng.randrange(1000, len(seq) - 1000)
        unit = "".join(rng.choice(BASES) for _ in range(rng.randint(2, 6)))
        seq = seq[:p] + unit * rng.randint(5, 40) + seq[p:]
    # N runs
    for _ in range(rng.randint(0, 3)):
        p = rng.randrange(500, len(seq) - 500)
        seq = seq[:p] + "N" * rng.randint(3, 60) + seq[p + rng.randint(0, 30):]
    # truncation
    lo, hi = rng.randint(0, 400), rng.randint(0, 400)
    seq = seq[lo:len(seq) - hi if hi else len(seq)]
    try:
        res = process_sequence(seq, ref, cds)
        variants = [{"ref": v[0], "alt": v[1], "start": v[2]} for v in res["dna_vars"]]
        restored = apply_variants(ref, variants)
        aq, at = apply_variants_aligned(ref, variants)
        assert restored == seq, "restore mismatch"
        assert aq.replace("-", "") == seq and at.replace("-", "") == ref
        assert len(aq) == len(at)
    except Exception as e:  # noqa: BLE001
        fails += 1
        print(f"FAIL seed {i}: {type(e).__name__}: {e}")
    if (i + 1) % 50 == 0:
        print(f"{i + 1}/{N} done, {fails} failures", flush=True)
print(f"deep fuzz: {N} genomes, {fails} failures")
sys.exit(1 if fails else 0)
