"""Property-based round-trip: for arbitrary mutated genomes,
align → derive variants → apply variants to the reference ==
original sequence, and the restored alignment degaps back to the
inputs (reference be_paranoid, lib/sonardb.py:3684-3819, generalized
to random genomes as SURVEY §5 suggests)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from covsonar_spark.functions.genetics import harmonize, parse_gff3, read_fasta_one
from covsonar_spark.operators.restore import (apply_variants,
                                              apply_variants_aligned)
from covsonar_spark.operators.variants import process_sequence

REF_DIR = "/root/reference"
BASES = "ACGT"


@pytest.fixture(scope="module")
def refdata():
    _, _, ref = read_fasta_one(f"{REF_DIR}/lib/ref.fna")
    ref = harmonize(ref)
    return ref, parse_gff3(f"{REF_DIR}/lib/ref.gff3", ref)


def mutate(ref: str, ops: list[tuple[int, int, str, int]]) -> str:
    """Apply (pos_frac, kind, payload, length) mutation ops to a copy of
    the reference; ops far enough apart that edits don't collide."""
    seq = list(ref)
    used: set[range] = set()
    spans = []
    for pos_seed, kind, payload, length in ops:
        pos = 500 + (pos_seed % (len(ref) - 1500))
        if any(abs(pos - s) < 120 for s in spans):
            continue
        spans.append(pos)
        if kind == 0:  # SNP
            alt = BASES[(BASES.index(seq[pos]) + 1 + length) % 4]
            seq[pos] = alt
        elif kind == 1:  # deletion
            for i in range(pos, min(pos + 1 + length, len(seq) - 500)):
                seq[i] = ""
        else:  # insertion after pos
            seq[pos] = seq[pos] + payload
    return "".join(seq)


mutation_ops = st.lists(
    st.tuples(st.integers(0, 2**31), st.integers(0, 2),
              st.text(alphabet=BASES, min_size=1, max_size=8),
              st.integers(0, 20)),
    min_size=0, max_size=12)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=mutation_ops, trunc_lo=st.integers(0, 250), trunc_hi=st.integers(0, 250))
def test_roundtrip_random_genomes(refdata, ops, trunc_lo, trunc_hi):
    """Includes truncated ends — real consensus genomes routinely miss
    the first/last few hundred bases (terminal deletions)."""
    ref, cds = refdata
    seq = mutate(ref, ops)
    seq = seq[trunc_lo:len(seq) - trunc_hi if trunc_hi else len(seq)]
    res = process_sequence(seq, ref, cds)
    variants = [{"ref": v[0], "alt": v[1], "start": v[2]}
                for v in res["dna_vars"]]
    assert apply_variants(ref, variants) == seq
    qry, aligned_ref = apply_variants_aligned(ref, variants)
    assert qry.replace("-", "") == seq
    assert aligned_ref.replace("-", "") == ref
    assert len(qry) == len(aligned_ref)
