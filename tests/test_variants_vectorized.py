"""The vectorized gapped-codon walk in aa_vars must be semantics-
identical to the regex walk it replaced ([^-]-*[^-]-*[^-]-* with the
query[s:e]==group and e-s==3 skip).  The old walk is kept HERE as the
differential oracle and fuzzed against the shipped implementation on
random alignments with insertions/deletions inside CDS."""

from __future__ import annotations

import random
import re

import pytest

from covsonar_spark.functions.genetics import CDS, translate
from covsonar_spark.operators.variants import aa_vars, build_profile

_CODON_RE = re.compile(r"[^-]-*[^-]-*[^-]-*")


def _aa_vars_regex_oracle(aligned_query, aligned_target, cds_list):
    """Byte-for-byte re-statement of the pre-vectorization regex path
    (no fast paths: every CDS slice goes through the codon walk)."""
    import numpy as np

    t8f = np.frombuffer(aligned_target.encode("latin-1"), dtype=np.uint8)
    apos = np.nonzero(t8f != ord("-"))[0]
    n_aln = len(aligned_target)

    def align_pos(x):
        return int(apos[x]) if x < len(apos) else n_aln

    for cds in cds_list:
        spans = [(align_pos(s), align_pos(e)) for s, e in cds.coords]
        query = "".join(aligned_query[sa:ea] for sa, ea in spans)
        target = "".join(aligned_target[sa:ea] for sa, ea in spans)
        gaps_before = [0]
        for ch in target:
            gaps_before.append(gaps_before[-1] + (ch == "-"))
        for m in _CODON_RE.finditer(target):
            s, e = m.start(), m.end()
            if query[s:e] == m.group() and e - s == 3:
                continue
            start = (s - gaps_before[s]) // 3
            taa = translate(m.group().replace("-", ""), cds.translation_table)
            qaa = translate(query[s:e].replace("-", ""), cds.translation_table)
            if qaa == "":
                yield taa, "", start, start + 1, cds.symbol, cds.locus
            elif qaa != taa:
                end = None if len(qaa) == 1 else start + len(qaa)
                yield taa, qaa, start, end, cds.symbol, cds.locus


def _random_alignment(rng, n=600):
    """A plausible aligned pair: SNPs, N runs, query insertions (target
    gaps) and query deletions (query gaps), never a gap in both."""
    alpha = "ACGT"
    t, q = [], []
    i = 0
    while i < n:
        r = rng.random()
        base = alpha[rng.randrange(4)]
        if r < 0.02:                       # insertion in query
            t.append(base), q.append(base)
            for _ in range(rng.randrange(1, 7)):
                t.append("-"), q.append(alpha[rng.randrange(4)])
        elif r < 0.05:                     # deletion in query
            for _ in range(rng.randrange(1, 7)):
                b = alpha[rng.randrange(4)]
                t.append(b), q.append("-")
                i += 1
            continue
        elif r < 0.10:
            t.append(base), q.append(alpha[rng.randrange(4)])
        elif r < 0.13:
            t.append(base), q.append("N")
        else:
            t.append(base), q.append(base)
        i += 1
    return "".join(q), "".join(t)


@pytest.mark.parametrize("seed", range(60))
def test_vectorized_codon_walk_matches_regex_oracle(seed):
    rng = random.Random(seed)
    q, t = _random_alignment(rng)
    n_ref = sum(1 for c in t if c != "-")
    # two CDS over the reference coords, one multi-exon
    ref = "".join(c for c in t if c != "-")

    def mk(sym, coords):
        return CDS(symbol=sym, locus="l" + sym, coords=coords,
                   seqs=[ref[s:e] for s, e in coords],
                   translation_table=1, strand="+")

    cds_list = [
        mk("a", [(9, 9 + 3 * ((n_ref // 2 - 9) // 3))]),
        mk("b", [(n_ref // 2, n_ref // 2 + 60),
                 (n_ref // 2 + 90, n_ref - 10)]),
    ]
    got = list(aa_vars(q, t, cds_list))
    exp = list(_aa_vars_regex_oracle(q, t, cds_list))
    assert got == exp
    assert build_profile(got) == build_profile(exp)


def test_vectorized_walk_handles_cds_tail_and_empty():
    # incomplete trailing codon + an all-gap-adjacent tail: the last
    # complete codon's span must absorb trailing gaps exactly like the
    # regex's trailing -* did
    t = "ATGGC-CA"      # 7 ref bases -> 2 complete codons
    q = "ATGGCTCA"
    cds = [CDS(symbol="s", locus="l", coords=[(0, 7)],
               seqs=["ATGGCCA"], translation_table=1, strand="+")]
    assert list(aa_vars(q, t, cds)) == list(_aa_vars_regex_oracle(q, t, cds))
