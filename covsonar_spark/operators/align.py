"""Banded affine-gap global alignment (Gotoh) — the engine's replacement
for the reference's per-sequence EMBOSS Stretcher subprocess
(/root/reference/lib/sonardb.py:861-946): same scoring model (EDNAFULL,
gapopen 16, gapextend 4) and the same left-gap normalization, but
in-process numpy so it runs inside an Arrow-batched pandas UDF instead
of forking a binary per genome.

Band rationale: stored genomes are near-identical to the reference
(SNPs + short indels), so the optimal path stays within a narrow
diagonal band.  The band half-width adapts to the length difference and
doubles on failure (path touching the band edge) until unbanded.
Complexity O(n·w) instead of O(n·m) — ~30k×400 cells for a SARS-CoV-2
genome versus 900M unbanded.
"""

from __future__ import annotations

import re

import numpy as np

from covsonar_spark.functions.genetics import ednafull_byte_matrix

NEG = -(10 ** 9)

_H_M, _H_E, _H_F = 0, 1, 2


class BandedGotoh:
    """Global pairwise DNA alignment, maximizing
    Σ EDNAFULL(tᵢ,qⱼ) − Σ_gaps (open + extend·len)."""

    def __init__(self, gapopen: int = 16, gapextend: int = 4):
        self.open = gapopen
        self.ext = gapextend
        self.matrix = ednafull_byte_matrix().astype(np.int32)

    def align(self, query: str, target: str, band_extra: int = 200) -> tuple[str, str]:
        """Return (aligned_query, aligned_target) with '-' gaps."""
        n, m = len(target), len(query)
        extra = band_extra
        while True:
            res = self._align_banded(query, target, extra)
            if res is not None:
                return res
            if extra > n + m:
                raise RuntimeError("alignment failed even unbanded")
            extra *= 4

    def _align_banded(self, query: str, target: str, extra: int):
        op, ext = self.open, self.ext
        n, m = len(target), len(query)
        d = m - n
        lo = min(0, d) - extra          # j - i lower bound
        hi = max(0, d) + extra
        W = hi - lo + 1

        tb = np.frombuffer(target.encode("ascii"), dtype=np.uint8)
        qb = np.frombuffer(query.encode("ascii"), dtype=np.uint8)

        ks = np.arange(W)
        ext_ks = ext * ks

        # per-row score/state arrays (band-indexed: j = i + lo + k)
        Hprev = np.full(W, NEG, dtype=np.int64)
        Fprev = np.full(W, NEG, dtype=np.int64)
        # row 0: H[0][j] = -(op + ext*j) for j>0, 0 for j==0
        j0row = lo + ks  # j values at i=0
        valid0 = (j0row >= 0) & (j0row <= m)
        Hprev[valid0] = -(op + ext * j0row[valid0])
        if 0 >= lo and 0 <= hi:
            Hprev[-lo] = 0

        # traceback stores
        Hc = np.zeros((n + 1, W), dtype=np.uint8)       # H choice
        Gc = np.zeros((n + 1, W), dtype=np.uint8)       # gap-open origin state (0=M,1=F)
        Fo = np.zeros((n + 1, W), dtype=np.uint8)       # F opened this row
        Eo = np.zeros((n + 1, W), dtype=np.int32)       # E origin k'

        Hc[0, :] = _H_E  # row 0 is all leading query insertion

        M = np.empty(W, dtype=np.int64)
        for i in range(1, n + 1):
            jrow = i + lo + ks
            valid = (jrow >= 1) & (jrow <= m)

            # M: diagonal from (i-1, j-1) = prev row, same k
            qidx = np.clip(jrow - 1, 0, m - 1)
            s = self.matrix[tb[i - 1], qb[qidx]].astype(np.int64)
            M[:] = Hprev + s
            M[~valid] = NEG

            # F: vertical from (i-1, j) = prev row, k+1
            Hup = np.empty(W, dtype=np.int64); Hup[:-1] = Hprev[1:]; Hup[-1] = NEG
            Fup = np.empty(W, dtype=np.int64); Fup[:-1] = Fprev[1:]; Fup[-1] = NEG
            open_f = Hup - op
            Frow = np.maximum(Fup, open_f) - ext
            Fo[i] = (open_f >= Fup).astype(np.uint8)
            jvalid_f = (jrow >= 0) & (jrow <= m)
            Frow[~jvalid_f] = NEG

            # j == 0 boundary: only vertical gaps
            at_j0 = jrow == 0
            if at_j0.any():
                k0 = int(np.nonzero(at_j0)[0][0])
                Frow[k0] = -(op + ext * i)
                M[k0] = NEG

            # E: horizontal via cummax over G = max(M, F)
            G = np.maximum(M, Frow)
            Gc[i] = (Frow > M).astype(np.uint8)
            A = G + ext_ks
            A_safe = np.where(G <= NEG // 2, NEG, A)
            cm = np.maximum.accumulate(A_safe)
            cm_idx = np.maximum.accumulate(
                np.where(A_safe >= cm, ks, 0)
            )
            Erow = np.full(W, NEG, dtype=np.int64)
            Erow[1:] = cm[:-1] - op - ext_ks[1:]
            Eo[i, 1:] = cm_idx[:-1]
            Erow[~valid] = NEG

            # H = max(M, E, F); tie rule: prefer M, then E, then F (any
            # consistent rule works — left_align_gaps normalizes after)
            Hrow = np.maximum(np.maximum(M, Erow), Frow)
            choice = np.where(Hrow == M, _H_M, np.where(Hrow == Erow, _H_E, _H_F)).astype(np.uint8)
            Hc[i] = choice
            if at_j0.any():
                Hc[i, k0] = _H_F

            Hprev = Hrow
            Fprev = Frow

        # end cell (n, m): k_end = m - n - lo
        k_end = m - n - lo
        if not (0 <= k_end < W):
            return None
        if Hprev[k_end] <= NEG // 2:
            return None

        aq, at = self._traceback(query, target, lo, Hc, Gc, Fo, Eo)
        if aq is None:
            return None
        return aq, at

    def _traceback(self, query, target, lo, Hc, Gc, Fo, Eo):
        n, m = len(target), len(query)
        W = Hc.shape[1]
        i, j = n, m
        k = j - i - lo
        out_q: list[str] = []
        out_t: list[str] = []
        state = "H"
        edge_touch = False
        while i > 0 or j > 0:
            if j == 0:
                out_q.append("-"); out_t.append(target[i - 1])
                i -= 1; k += 1
                continue
            if i == 0:
                out_q.append(query[j - 1]); out_t.append("-")
                j -= 1; k -= 1
                continue
            if k <= 0 or k >= W - 1:
                edge_touch = True
                break
            if state == "H":
                c = Hc[i, k]
                if c == _H_M:
                    out_q.append(query[j - 1]); out_t.append(target[i - 1])
                    i -= 1; j -= 1
                elif c == _H_E:
                    state = "E"
                else:
                    state = "F"
            elif state == "E":
                k0 = int(Eo[i, k])
                j0 = i + lo + k0
                run = j - j0
                out_q.extend(query[j - 1 - r] for r in range(run))
                out_t.extend("-" * run)
                j = j0; k = k0
                state = "F" if Gc[i, k0] else "M1"
            elif state == "M1":
                out_q.append(query[j - 1]); out_t.append(target[i - 1])
                i -= 1; j -= 1
                state = "H"
            else:  # F
                out_q.append("-"); out_t.append(target[i - 1])
                opened = Fo[i, k]
                i -= 1; k += 1
                state = "H" if opened else "F"
        if edge_touch:
            return None, None
        return "".join(reversed(out_q)), "".join(reversed(out_t))


def left_align_gaps(query: str, target: str) -> tuple[str, str]:
    """Shift every gap run leftward while the base preceding the gap
    equals the base the gap's right edge aligns to — the reference's
    normalization (lib/sonardb.py:912-946) so indels in repeats report
    their leftmost position.  List-based implementation, same result."""
    q = list(query)
    t = list(target)
    last = len(q) - 1

    def normalize(a: list[str], b: list[str]):
        # gaps live in `a`; their left-shift compares a's left base to b's
        # base at the gap's right edge
        for match in re.finditer("-+", "".join(a)):
            s = match.start() - 1
            e = match.end() - 1
            while s >= 0 and e < last and a[s] == b[e]:
                a[e] = a[s]
                a[s] = "-"
                s -= 1
                e -= 1

    normalize(q, t)
    normalize(t, q)
    return "".join(q), "".join(t)
