"""Variant derivation from a pairwise alignment: nucleotide and
amino-acid variant iteration, profile-token building with adjacent-
deletion merging, and frameshift classification.

Pure Python — runs inside the Arrow-batched alignment UDF.  Semantics
mirror the reference (/root/reference/lib/sonardb.py: iter_dna_vars
:1036-1125, iter_aa_vars :1127-1220, build_profile/format_var
:2806-2941, frameshift :2945-2990) with original code; golden-tested
against the B.1.1.7 fixture profile (lib/sonardb.py:2521-2531).

Variant tuple shape (shared nt/aa): (ref, alt, start, end, protein,
locus) — 0-based start; end None for SNPs; alt '' for deletions;
insertions carry the anchor base (VCF-style), a leading insertion
anchors at start=-1.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import numpy as np

from covsonar_spark.functions.genetics import CDS, translate

_LEADING_GAPS = re.compile(r"^-+")
_INSERT = re.compile(r"[^-]-+")          # anchor + gap run in the target
# (codon spans over a gapped target — formerly the regex
# [^-]-*[^-]-*[^-]-* — are computed vectorized inside aa_vars)

Var = tuple[str, str, int, int | None, str | None, str | None]


_GAP = ord("-")


def dna_vars(aligned_query: str, aligned_target: str) -> Iterator[Var]:
    """Nucleotide variants from an aligned pair (reference coords).

    The position scan is vectorized: the gap→reference coordinate map
    is a cumsum and the candidate sites a single nonzero over byte
    arrays, so Python-level work is proportional to the VARIANT count
    (tens) instead of the genome length (30k) — the per-char loop here
    was ~25% of the ingest-UDF profile."""
    target, query = aligned_target, aligned_query

    m = _LEADING_GAPS.match(target)
    if m:
        yield "", query[: m.end()], -1, None, None, None

    t8 = np.frombuffer(target.encode("latin-1"), dtype=np.uint8)
    q8 = np.frombuffer(query.encode("latin-1"), dtype=np.uint8)
    nongap = t8 != _GAP
    ref_pos = np.cumsum(nongap, dtype=np.int64)  # 1-based; use -1 below

    isites = set()
    for m in _INSERT.finditer(target):
        isites.add(m.start())
        yield (target[m.start()], query[m.start(): m.end()],
               int(ref_pos[m.start()]) - 1, None, None, None)

    for i in np.nonzero(nongap & (t8 != q8))[0].tolist():
        if i in isites:
            continue
        qc = query[i]
        yield (target[i], "" if qc == "-" else qc,
               int(ref_pos[i]) - 1, None, None, None)


def _align_pos_map(aligned_target: str) -> np.ndarray:
    """reference position → alignment position (indices of non-gaps)."""
    t8 = np.frombuffer(aligned_target.encode("latin-1"), dtype=np.uint8)
    return np.nonzero(t8 != _GAP)[0]


def aa_vars(aligned_query: str, aligned_target: str, cds_list: Iterable[CDS]) -> Iterator[Var]:
    """Amino-acid variants per CDS: slice aligned exons via the
    coordinate map, walk target codons, translate, diff.

    Two vectorized shortcuts (~50% of the ingest-UDF profile lived
    here), both exact: a CDS whose exon alignment spans contain no
    query/target byte difference can yield nothing and is skipped
    without slicing; a touched CDS whose target slice is GAPLESS has
    regular codon boundaries, so the differing codons come from one
    numpy compare instead of a regex walk.  CDS slices with target
    gaps (an insertion inside the CDS) take the general regex path."""
    apos = _align_pos_map(aligned_target)
    n_aln = len(aligned_target)
    t8_full = np.frombuffer(aligned_target.encode("latin-1"), dtype=np.uint8)
    q8_full = np.frombuffer(aligned_query.encode("latin-1"), dtype=np.uint8)
    mism_all = np.nonzero(t8_full != q8_full)[0]

    def align_pos(x: int) -> int:
        return int(apos[x]) if x < len(apos) else n_aln

    for cds in cds_list:
        if cds.strand == "-":
            # reverse-strand CDS do not occur in SARS-CoV-2; the
            # reference's own handling is broken (str.append on a str,
            # lib/sonardb.py:1209-1211) — explicit guard instead of
            # silently wrong answers
            raise NotImplementedError("reverse-strand CDS not supported")
        spans = [(align_pos(s), align_pos(e)) for s, e in cds.coords]
        if all(np.searchsorted(mism_all, sa) == np.searchsorted(mism_all, ea)
               for sa, ea in spans):
            continue  # no byte differs in any exon span -> no variants
        query = "".join(aligned_query[sa:ea] for sa, ea in spans)
        target = "".join(aligned_target[sa:ea] for sa, ea in spans)

        t8 = np.frombuffer(target.encode("latin-1"), dtype=np.uint8)
        if not (t8 == _GAP).any():
            # gapless target slice: codons are exact 3-mers at regular
            # offsets (a 1-2 base tail can never form a codon, matching
            # the regex's 3-non-gap requirement)
            q8 = np.frombuffer(query.encode("latin-1"), dtype=np.uint8)
            diff = np.nonzero(t8 != q8)[0]
            n3 = (len(t8) // 3) * 3
            for start in np.unique(diff[diff < n3] // 3).tolist():
                s = 3 * start
                tcodon = target[s: s + 3]
                qcodon = query[s: s + 3].replace("-", "")
                taa = translate(tcodon, cds.translation_table)
                qaa = translate(qcodon, cds.translation_table)
                if qaa == "":
                    yield taa, "", start, start + 1, cds.symbol, cds.locus
                elif qaa != taa:
                    end = None if len(qaa) == 1 else start + len(qaa)
                    yield taa, qaa, start, end, cds.symbol, cds.locus
            continue

        # Gapped target slice (an insertion inside the CDS).  The regex
        # walk (_CODON.finditer) this replaces built a match object per
        # codon — ~8k per genome once one insertion lands in orf1ab,
        # half the post-alignment profile.  The codon spans are
        # computable vectorized instead: the k-th codon starts at the
        # 3k-th non-gap position and (like the regex, whose trailing
        # ``-*`` absorbs gaps after the 3rd base) extends to the next
        # codon's first base; a codon needs Python-level work only when
        # its span holds a query/target byte difference or an embedded
        # gap (span length != 3) — identical to the regex path's
        # ``query[s:e] == m.group() and e - s == 3`` skip.
        q8 = np.frombuffer(query.encode("latin-1"), dtype=np.uint8)
        ng = np.nonzero(t8 != _GAP)[0]
        n_codons = len(ng) // 3
        if n_codons == 0:
            continue
        starts = ng[0: 3 * n_codons: 3]
        ends = np.empty(n_codons, dtype=np.int64)
        ends[:-1] = ng[3: 3 * n_codons: 3]
        ends[-1] = ng[3 * n_codons] if len(ng) > 3 * n_codons else len(target)
        dcum = np.concatenate(([0], np.cumsum(t8 != q8, dtype=np.int64)))
        touched = np.nonzero((ends - starts != 3)
                             | (dcum[ends] - dcum[starts] > 0))[0]
        for ci in touched.tolist():
            s, e = int(starts[ci]), int(ends[ci])
            tcodon = target[s:e].replace("-", "")
            qcodon = query[s:e].replace("-", "")
            taa = translate(tcodon, cds.translation_table)
            qaa = translate(qcodon, cds.translation_table)
            if qaa == "":
                yield taa, "", ci, ci + 1, cds.symbol, cds.locus
            elif qaa != taa:
                end = None if len(qaa) == 1 else ci + len(qaa)
                yield taa, qaa, ci, end, cds.symbol, cds.locus


def format_var(ref: str, alt: str, start: int, end: int | None,
               protein: str | None = None) -> str:
    """One variant tuple → profile token (1-based coordinates;
    lib/sonardb.py:2903-2941)."""
    if alt != "":
        coord = str(start + 1)
    else:
        ref = "del:"
        coord = f"{start + 1}:{end - start}"
    prefix = protein + ":" if protein else ""
    return prefix + ref + coord + alt


def build_profile(vars_: list[Var]) -> str:
    """Variant tuples → space-joined token profile, merging ADJACENT
    deletions into one ``del:start:len`` token (lib/sonardb.py:2806-2901).
    Sort key (locus, protein, start) fixes token order."""
    if not vars_:
        return ""
    if len(vars_) == 1:
        ref, alt, start, end, protein, locus = vars_[0]
        if alt == "" and end is None:
            end = start + len(ref)
        return format_var(ref, alt, start, end, protein)

    vars_ = sorted(vars_, key=lambda x: (x[5] or "", x[4] or "", x[2]))
    profile: list[str] = []
    merged = list(vars_)
    for idx in range(len(merged) - 1):
        ref, alt, start, end, protein, locus = merged[idx]
        n_ref, n_alt, n_start, n_end, n_protein, n_locus = merged[idx + 1]
        if alt != "":
            profile.append(format_var(ref, alt, start, end, protein))
        elif (alt == "" and n_alt == "" and start + len(ref) == n_start
              and protein == n_protein and locus == n_locus):
            merged[idx + 1] = (ref + n_ref, "", start, n_start + 1, protein, locus)
        else:
            if end is None:
                end = start + len(ref)
            profile.append(format_var(ref, alt, start, end, protein))
    ref, alt, start, end, protein, locus = merged[-1]
    if alt == "" and end is None:
        end = start + len(ref)
    tok = format_var(ref, alt, start, end, protein)
    if tok not in profile:
        profile.append(tok)
    return " ".join(profile)


_DNAVAR_GREP = re.compile(r"^([^0-9:]*)([0-9]+)([^0-9]*)$")


def is_frameshift(dna_token: str, cds_list: Iterable[CDS]) -> bool:
    """A deletion shifts the frame iff the remaining coding positions of a
    hit CDS aren't a codon multiple; an insertion iff its length isn't a
    codon multiple and the anchor is coding (lib/sonardb.py:2945-2970)."""
    if dna_token.startswith("del:"):
        _, x, ln = dna_token.split(":")
        x = int(x) - 1
        y = x + int(ln)
        return any(c.is_frameshift_del(x, y) for c in cds_list)
    m = _DNAVAR_GREP.search(dna_token)
    x = int(m.group(2)) - 1
    ins_len = len(m.group(3)) - 1
    if ins_len % 3 == 0:
        return False
    return any(c.is_frameshift_in(x, ins_len) for c in cds_list)


def filter_frameshifts(dna_profile: str, cds_list: list[CDS]) -> str:
    """fs_profile = the frameshift-causing subset of dna_profile."""
    if not cds_list or not dna_profile.strip():
        return ""
    return " ".join(t for t in dna_profile.split(" ") if t and is_frameshift(t, cds_list))


def process_sequence(seq: str, ref_seq: str, cds_list: list[CDS], aligner=None,
                     band_extra: int = 200, alignment=None) -> dict:
    """Fused per-sequence pipeline (the reference's process_fasta,
    lib/sonardb.py:2508-2580, minus file/cache plumbing): align → left-
    normalize gaps → nt+aa variants → profiles → frameshifts.

    ``alignment`` (pre-computed (aq, at), e.g. from the batched
    ``BandedGotoh.align_many``) skips the per-sequence align call —
    the ingest UDF aligns a whole Arrow batch at once and feeds each
    result through here.

    Returns dna/prot profile strings, variant tuple lists, and the fs
    profile — everything the ingest stage writes.
    """
    from covsonar_spark.operators.align import BandedGotoh, left_align_gaps

    if alignment is not None:
        aq, at = alignment
    else:
        if aligner is None:
            aligner = BandedGotoh()
        aq, at = aligner.align(seq, ref_seq, band_extra=band_extra)
    aq, at = left_align_gaps(aq, at)
    dnadiff = list(dna_vars(aq, at))
    aadiff = list(aa_vars(aq, at, cds_list))
    dna_profile = build_profile(dnadiff)
    prot_profile = build_profile(aadiff)
    fs_profile = filter_frameshifts(dna_profile, cds_list)
    return {
        "dna_profile": dna_profile,
        "prot_profile": prot_profile,
        "fs_profile": fs_profile,
        "dna_vars": dnadiff,
        "prot_vars": aadiff,
    }
