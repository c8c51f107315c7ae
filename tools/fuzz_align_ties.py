"""Adversarial tie-break fuzz (VERDICT r3 #4): score-TIED alignment
cases — repeat-adjacent indels, homopolymer length changes, mutated
anchor windows, and indel+SNP mixtures inside tandem arrays — where
multiple gap placements reach the SAME optimal score and EMBOSS
Stretcher (/root/reference/lib/sonardb.py:861-946) would pick one by
its internal traceback order.

The check here is stronger than replaying Stretcher: an INDEPENDENT
full-matrix affine-gap DP (no banding, no anchoring, no shared code
with operators/align.py) computes the optimal score, and every engine
alignment must ACHIEVE that optimum.  On a score tie any optimal path
is correct by the scoring model; the engine then canonicalizes gap
placement with left_align_gaps, so ties converge to one deterministic
profile regardless of which optimal path the DP walked.  Per case:

  1. optimality    — engine alignment score == full-DP optimum
  2. determinism   — align() twice and align_many() agree byte-for-byte
  3. canonical form— left_align_gaps is idempotent on the output
  4. round-trip    — gaps strip back to the original sequences

Sequences are 400-900 bp so the O(n*m) independent DP stays cheap;
the tie structures (repeats, homopolymers) are what matter, not
genome length — the anchored decomposition reduces a 30 kb genome to
exactly these windows.

Usage: python tools/fuzz_align_ties.py [n_cases]   (default 200)
"""

from __future__ import annotations

import random
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from covsonar_spark.functions.genetics import ednafull_byte_matrix  # noqa: E402
from covsonar_spark.operators.align import BandedGotoh, left_align_gaps  # noqa: E402

MATRIX = ednafull_byte_matrix().astype(np.int64)
OPEN, EXT = 16, 4
BASES = "ACGT"


def optimal_score(query: str, target: str) -> int:
    """Full-matrix affine Gotoh optimum — independent implementation
    (row numpy, no band, no anchors) of the engine's scoring model:
    global, end gaps charged open + ext*len like internal gaps."""
    n, m = len(target), len(query)
    if m == 0 or n == 0:
        return -(OPEN + EXT * max(n, m)) if (n or m) else 0
    qb = np.frombuffer(query.encode("ascii"), dtype=np.uint8)
    tb = np.frombuffer(target.encode("ascii"), dtype=np.uint8)
    NEG = -(10 ** 12)
    j = np.arange(1, m + 1, dtype=np.int64)
    Hp = np.concatenate(([0], -(OPEN + EXT * j)))   # H row i=0
    Fp = np.full(m + 1, NEG, dtype=np.int64)        # F (gap in query)
    for i in range(1, n + 1):
        Md = Hp[:-1] + MATRIX[tb[i - 1], qb]        # diagonal, j=1..m
        Frow = np.maximum(Fp, Hp - OPEN) - EXT      # vertical, all j
        H = np.empty(m + 1, dtype=np.int64)
        H[0] = -(OPEN + EXT * i)
        # E (gap in target, consumes query) is a sequential intra-row
        # recurrence: E[j] = max(E[j-1], H[j-1] - OPEN) - EXT — kept as
        # a plain scalar loop, deliberately NOT the engine's prefix-max
        # vectorization (independence of implementation)
        e = NEG
        hprev = H[0]
        for col in range(1, m + 1):
            e = max(e, hprev - OPEN) - EXT
            hprev = max(Md[col - 1], Frow[col], e)
            H[col] = hprev
        Hp, Fp = H, Frow
    return int(Hp[m])


def alignment_score(aq: str, at: str) -> int:
    """Score an aligned pair under the engine's model."""
    total = 0
    gap_q = gap_t = 0
    for a, b in zip(aq, at):
        if a == "-":
            if gap_q == 0:
                total -= OPEN
            gap_q += 1
            total -= EXT
            gap_t = 0
        elif b == "-":
            if gap_t == 0:
                total -= OPEN
            gap_t += 1
            total -= EXT
            gap_q = 0
        else:
            total += int(MATRIX[ord(b), ord(a)])
            gap_q = gap_t = 0
    return total


def make_case(i: int) -> tuple[str, str]:
    """Build (query, target) with planted score-tie structure: every
    indel edit lands INSIDE a tandem array or homopolymer, where any
    of the r unit positions is an equally-scoring gap placement."""
    rng = random.Random(424_000_001 * i + 3)
    n = rng.randint(400, 900)
    t = [rng.choice(BASES) for _ in range(n)]

    # plant tandem arrays / homopolymers in the TARGET; remember them
    sites: list[tuple[int, int, int]] = []      # (start, unit_len, reps)
    for _ in range(rng.randint(2, 4)):
        p = rng.randrange(50, n - 140)
        ulen = rng.randint(1, 5)                # 1 == homopolymer
        unit = "".join(rng.choice(BASES) for _ in range(ulen))
        reps = rng.randint(4, 12)
        arr = unit * reps
        t[p:p + len(arr)] = list(arr)
        sites.append((p, ulen, reps))
    target = "".join(t[:n])

    q = target
    drift = 0                                   # cumulative q-vs-t shift
    # tie-generating edits on the QUERY, oriented at the planted sites
    for p, ulen, reps in sites:
        kind = rng.randrange(4)
        # edit somewhere inside the array (not its first unit, so both
        # left- and right-shifted placements exist)
        off = p + drift + ulen * rng.randint(1, reps - 2)
        if kind == 0:                           # delete one repeat unit
            q = q[:off] + q[off + ulen:]
            drift -= ulen
        elif kind == 1:                         # duplicate one unit
            q = q[:off] + q[off:off + ulen] + q[off:]
            drift += ulen
        elif kind == 2:                         # unit indel + SNP inside
            q = q[:off] + q[off + ulen:]
            drift -= ulen
            sp = p + drift + rng.randrange(max(ulen * (reps - 2), 1))
            if 0 <= sp < len(q):
                q = q[:sp] + rng.choice(BASES) + q[sp + 1:]
        else:                                   # expand by several units
            k = rng.randint(2, 3)
            q = q[:off] + q[off:off + ulen] * k + q[off:]
            drift += ulen * k
    # defeat the midpoint anchor with scattered SNPs
    if rng.random() < 0.5:
        mid = len(q) // 2
        for d in range(-2, 3):
            sp = mid + d * 13
            if 0 <= sp < len(q):
                q = q[:sp] + rng.choice(BASES) + q[sp + 1:]
    return q, target


def has_score_tie(aq: str, at: str, opt: int) -> bool:
    """True if some gap run shifted one column left or right scores the
    same optimum — direct evidence the case has >=2 optimal paths."""
    cols = list(zip(aq, at))
    runs = []
    start = None
    for idx, (a, b) in enumerate(cols):
        gap = a == "-" or b == "-"
        if gap and start is None:
            start = idx
        elif not gap and start is not None:
            runs.append((start, idx))
            start = None
    if start is not None:
        runs.append((start, len(cols)))
    # Shifting a gap run one column left/right only permutes the
    # gapped string (the run trades places with the adjacent real
    # char); the other aligned string is untouched, so the underlying
    # sequences are preserved by construction.
    def shifted(g: str, s: int, e: int, left: bool) -> str | None:
        gl = e - s
        if left:
            if s == 0 or g[s - 1] == "-":
                return None
            return g[:s - 1] + "-" * gl + g[s - 1] + g[e:]
        if e >= len(g) or g[e] == "-":
            return None
        return g[:s] + g[e] + "-" * gl + g[e + 1:]

    for s, e in runs:
        qgap = aq[s] == "-"
        g = aq if qgap else at
        for left in (True, False):
            cand = shifted(g, s, e, left)
            if cand is None:
                continue
            pair = (cand, at) if qgap else (aq, cand)
            if alignment_score(*pair) == opt:
                return True
    return False


def main() -> None:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    al = BandedGotoh()
    fails = ties = 0
    pairs = [make_case(i) for i in range(n_cases)]
    batched = BandedGotoh().align_many(pairs)
    for i, (q, t) in enumerate(pairs):
        try:
            aq, at = al.align(q, t)
            aq2, at2 = al.align(q, t)
            assert (aq, at) == (aq2, at2), "align() nondeterministic"
            assert not isinstance(batched[i], Exception), batched[i]
            assert (aq, at) == batched[i], "align_many diverges from align"
            got = alignment_score(aq, at)
            opt = optimal_score(q, t)
            assert got == opt, f"engine {got} != optimal {opt}"
            la = left_align_gaps(aq, at)
            assert left_align_gaps(*la) == la, "left_align_gaps not idempotent"
            assert la[0].replace("-", "") == q
            assert la[1].replace("-", "") == t
            la_score = alignment_score(*la)
            assert la_score == opt, \
                f"left_align_gaps changed score {got} -> {la_score}"
            # a real tie: an alternative gap placement reaches the same
            # optimum, or canonicalization moved a gap
            if la != (aq, at) or has_score_tie(aq, at, opt):
                ties += 1
        except AssertionError as e:
            fails += 1
            print(f"FAIL case {i}: {e}")
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{n_cases} done, {fails} failures, "
                  f"{ties} tied-placement cases", flush=True)
    print(f"tie fuzz: {n_cases} cases, {fails} failures, "
          f"{ties} with ambiguous gap placement canonicalized")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
