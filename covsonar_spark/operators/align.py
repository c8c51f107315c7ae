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


class AlignmentBudgetError(RuntimeError):
    """Raised when one alignment exceeds its DP cell budget.

    Parity with the reference's per-sequence SIGALRM timeout
    (/root/reference/lib/sonardb.py:36-81, sonar.py:87-94, 648-663):
    the reference skips and reports sequences whose Stretcher run
    exceeds 600 s; here the budget is deterministic DP cells instead of
    wall time, so the same input is accepted/rejected identically on
    every executor and every run.  The ingest UDF catches this and
    emits the per-row ``error`` channel (ingest.py derive_profiles),
    exactly like the non-IUPAC path — one pathological record can
    never stall an executor task.
    """


class BandedGotoh:
    """Global pairwise DNA alignment, maximizing
    Σ EDNAFULL(tᵢ,qⱼ) − Σ_gaps (open + extend·len)."""

    # Default per-alignment DP budget: ~2 full unbanded passes of a
    # 30 kb coronavirus genome (30k × 30k ≈ 9·10⁸ cells) — legitimate
    # hard inputs that escalate to a wide band finish far below this,
    # while adversarial low-complexity input that keeps quadrupling the
    # band is cut off in bounded time (~minutes, vs the reference's
    # 600 s wall cap).
    CELL_BUDGET = 2_000_000_000

    def __init__(self, gapopen: int = 16, gapextend: int = 4,
                 cell_budget: int | None = None):
        self.open = gapopen
        self.ext = gapextend
        self.matrix = ednafull_byte_matrix().astype(np.int32)
        self.cell_budget = self.CELL_BUDGET if cell_budget is None else cell_budget
        self._cells_used = 0

    # anchored divide-and-conquer tuning
    MARGIN = 32          # matched bases kept around each DP window
    DP_MAX = 160         # window size below which we run the banded DP
    # (row-loop numpy dispatch costs ~0.5 ms per DP row regardless of
    # band width, so smaller windows are a straight win; anchors still
    # fit: a 161-base window leaves [48..112] for the midpoint 64-mer)
    ANCHOR_HALF = 32     # anchor = the 64-mer around the target midpoint
    ANCHOR_STEP = 96     # probe-slide stride when the midpoint 64-mer fails

    def align(self, query: str, target: str, band_extra: int = 200) -> tuple[str, str]:
        """Return (aligned_query, aligned_target) with '-' gaps.

        Three tiers, fastest first:
        1. gap-free check — SNP/N-only genomes (the common case) are the
           identity alignment, O(n);
        2. anchored divide-and-conquer — trim the shared prefix/suffix
           (margin kept so the DP owns indel placement at the seams),
           then split recursively on unique exact 64-mers until each
           divergent window is ≤ DP_MAX, O(n) scans + tiny DPs;
        3. banded Gotoh DP on whatever windows remain (band retries
           wider on failure).
        Gap runs are normalized afterwards by ``left_align_gaps`` on the
        full stitched pair, so seam placement is canonical.
        """
        self._cells_used = 0      # budget is per align() call
        fast = self._align_gapfree(query, target)
        if fast is not None:
            return fast
        return self._align_rec(query, target, band_extra, 0)

    def _dp(self, query: str, target: str, extra: int) -> tuple[str, str]:
        n, m = len(target), len(query)
        if m == 0:
            return "-" * n, target
        if n == 0:
            return query, "-" * m
        while True:
            # charge the band's cell count BEFORE running it, so the
            # budget check precedes the allocation/compute it bounds
            w = abs(m - n) + 2 * extra + 1       # == W in _align_banded
            self._cells_used += (n + 1) * w
            if self._cells_used > self.cell_budget:
                raise AlignmentBudgetError(
                    f"DP cell budget exceeded ({self._cells_used:,} > "
                    f"{self.cell_budget:,} cells; window {n}x{m}, band {w})")
            res = self._align_banded(query, target, extra)
            if res is not None:
                return res
            if extra > n + m:
                raise RuntimeError("alignment failed even unbanded")
            extra *= 4

    def _align_rec(self, q: str, t: str, band_extra: int, depth: int) -> tuple[str, str]:
        # 1. trim shared prefix/suffix, keeping MARGIN matched bases
        L = min(len(q), len(t))
        if L:
            qb = np.frombuffer(q.encode("ascii"), dtype=np.uint8)
            tb = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
            neq = np.nonzero(qb[:L] != tb[:L])[0]
            p = int(neq[0]) if neq.size else L
            neq2 = np.nonzero(qb[len(q) - L:][::-1] != tb[len(t) - L:][::-1])[0]
            s = int(neq2[0]) if neq2.size else L
        else:
            p = s = 0
        p = max(p - self.MARGIN, 0)
        s = max(s - self.MARGIN, 0)
        s = min(s, len(q) - p, len(t) - p)
        qc, tc = q[p:len(q) - s], t[p:len(t) - s]

        # 2a. SNP-only window: the anchored splits isolate each indel,
        # so MOST windows between indels are substitution-only — the
        # gap-free identity check resolves them in O(n) and the DP only
        # ever sees windows that truly contain an indel
        fast = self._align_gapfree(qc, tc)
        if fast is not None:
            aq, at = fast
            return q[:p] + aq + q[len(q) - s:], t[:p] + at + t[len(t) - s:]

        # 2b. small window (or deep recursion): hand to the DP
        if max(len(qc), len(tc)) <= self.DP_MAX or depth >= 40:
            aq, at = self._dp(qc, tc, band_extra)
        else:
            # 3. split on a unique exact anchor near the target midpoint.
            # A mutation inside the midpoint 64-mer would defeat a single
            # probe (and one failed probe here costs a half-window O(n·w)
            # DP), so slide the probe outward in ANCHOR_STEP hops until a
            # unique hit — a handful of O(n) scans buys off a ~10⁷-cell DP.
            split = None
            drift = len(qc) - len(tc)
            slack = abs(drift) + 800
            mid0 = len(tc) // 2
            quarter = len(tc) // 4
            offsets = [0]
            step = self.ANCHOR_STEP
            while step <= quarter:
                offsets += [step, -step]
                step += self.ANCHOR_STEP
            for off in offsets:
                mid = mid0 + off
                if not (self.ANCHOR_HALF <= mid <= len(tc) - self.ANCHOR_HALF):
                    continue
                a = tc[mid - self.ANCHOR_HALF: mid + self.ANCHOR_HALF]
                lo_s = max(mid - self.ANCHOR_HALF - slack, 0)
                hi_s = min(mid + self.ANCHOR_HALF + slack, len(qc))
                pos = qc.find(a, lo_s, hi_s)
                if pos != -1 and qc.find(a, pos + 1, hi_s) == -1:
                    split = (pos + self.ANCHOR_HALF, mid)
                    break
            if split is None:
                aq, at = self._dp(qc, tc, band_extra)
            else:
                qs, ts = split
                lq, lt = self._align_rec(qc[:qs], tc[:ts], band_extra, depth + 1)
                rq, rt = self._align_rec(qc[qs:], tc[ts:], band_extra, depth + 1)
                aq, at = lq + rq, lt + rt
        return q[:p] + aq + q[len(q) - s:], t[:p] + at + t[len(t) - s:]

    # conservative fast-path bounds: scattered substitutions can't be
    # rescued by gaps (a gap pair costs ≥ 2·open+2·ext = 40 vs ≥ −4 per
    # mismatch), and a shift signature (long mismatch run) forces DP.
    FAST_MAX_MISMATCH = 100
    FAST_MAX_RUN = 5

    def _align_gapfree(self, query: str, target: str):
        """SNP-only genomes (the overwhelming majority of a real corpus)
        align as the identity — O(n) check instead of the O(n·w) DP.
        Applies only when lengths match, mismatches are few and no long
        mismatch run (a shifted block) exists; otherwise returns None
        and the banded DP decides."""
        if len(query) != len(target):
            return None
        qb = np.frombuffer(query.encode("ascii"), dtype=np.uint8)
        tb = np.frombuffer(target.encode("ascii"), dtype=np.uint8)
        # N-vs-base mismatches score a flat −2 wherever they sit, so N
        # runs (ubiquitous in real genomes) never gain from gaps and are
        # exempt from the shift-signature checks below
        mism = (qb != tb) & (qb != ord("N"))
        n_mism = int(mism.sum())
        if n_mism == 0:
            return query, target
        if n_mism > self.FAST_MAX_MISMATCH:
            return None
        idx = np.nonzero(mism)[0]
        run, best = 1, 1
        for a, b in zip(idx[:-1], idx[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        if best > self.FAST_MAX_RUN:
            return None
        return query, target

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

        # hoisted out of the row loop: the full (n, W) substitution-score
        # gather, with out-of-band cells pinned to NEG so the per-row
        # masking disappears (row loop cost is numpy dispatch overhead —
        # fewer calls per row beats smaller arrays)
        all_i = np.arange(1, n + 1)[:, None]
        all_j = all_i + lo + ks[None, :]                 # j at (i, k)
        all_valid = (all_j >= 1) & (all_j <= m)
        qidx = np.clip(all_j - 1, 0, m - 1)
        S_all = self.matrix[tb[all_i - 1], qb[qidx]].astype(np.int64)
        S_all[~all_valid] = NEG
        INV = ~all_valid

        M = np.empty(W, dtype=np.int64)
        Hup = np.empty(W, dtype=np.int64)
        Fup = np.empty(W, dtype=np.int64)
        for i in range(1, n + 1):
            # M: diagonal from (i-1, j-1) = prev row, same k; invalid
            # cells carry NEG from the precomputed score matrix
            np.add(Hprev, S_all[i - 1], out=M)
            np.maximum(M, NEG, out=M)

            # F: vertical from (i-1, j) = prev row, k+1
            Hup[:-1] = Hprev[1:]; Hup[-1] = NEG
            Fup[:-1] = Fprev[1:]; Fup[-1] = NEG
            open_f = Hup - op
            Frow = np.maximum(Fup, open_f) - ext
            Fo[i] = open_f >= Fup

            # j == 0 boundary: only vertical gaps
            k0 = -i - lo
            has_j0 = 0 <= k0 < W
            if has_j0:
                Frow[k0] = -(op + ext * i)
                M[k0] = NEG

            # E: horizontal via cummax over G = max(M, F)
            G = np.maximum(M, Frow)
            Gc[i] = Frow > M
            A = G + ext_ks
            cm = np.maximum.accumulate(A)
            cm_idx = np.maximum.accumulate(np.where(A >= cm, ks, 0))
            Erow = np.empty(W, dtype=np.int64)
            Erow[0] = NEG
            Erow[1:] = cm[:-1] - op - ext_ks[1:]
            Eo[i, 1:] = cm_idx[:-1]
            Erow[INV[i - 1]] = NEG

            # H = max(M, E, F); tie rule: prefer M, then E, then F (any
            # consistent rule works — left_align_gaps normalizes after)
            Hrow = np.maximum(np.maximum(M, Erow), Frow)
            Hc[i] = np.where(Hrow == M, _H_M, np.where(Hrow == Erow, _H_E, _H_F))
            if has_j0:
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
