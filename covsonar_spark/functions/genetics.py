"""Pure-Python genetics primitives: genetic code, SEGUID hashing,
sequence harmonization, the EDNAFULL scoring matrix, and the CDS
coordinate model (exon lists, ribosomal-slippage-aware coding positions,
frameshift classification).

Framework-free — used inside the Arrow-batched alignment UDF and in
driver-side query rewrites.  Behavior mirrors the reference's sonarCDS /
sonarGFF layer (/root/reference/lib/sonardb.py:143-498, 669-749) with
original code.
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass, field
from functools import cached_property

# Standard genetic code, NCBI translation table 1 (public).
_BASES = "TCAG"
_AMINO = (
    "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
)
CODON_TABLE_1: dict[str, str] = {
    a + b + c: _AMINO[16 * i + 4 * j + k]
    for i, a in enumerate(_BASES)
    for j, b in enumerate(_BASES)
    for k, c in enumerate(_BASES)
}

_COMPLEMENT = str.maketrans("ACGTRYSWKMBDHVN", "TGCAYRSWMKVHDBN")


def revcomp(seq: str) -> str:
    return seq.translate(_COMPLEMENT)[::-1]


# IUPAC → explicit base resolutions (for ambiguity-aware translation)
_NT_RESOLVE = {
    "A": "A", "C": "C", "G": "G", "T": "T",
    "R": "AG", "Y": "CT", "S": "GC", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}


import functools


@functools.lru_cache(maxsize=32768)
def _translate_codon(codon: str) -> str:
    """Ambiguity-aware codon translation (Biopython-compatible, matching
    the reference's translate): if every resolution of the IUPAC codes
    yields the same amino acid, return it; otherwise ``X``.

    Cached: the codon domain is tiny (<=26³ uppercase triplets, in
    practice a few hundred distinct values per corpus — runs of N map
    to the same handful) and the set-expansion for ambiguous codons
    was a measurable slice of the ingest UDF profile."""
    aa = CODON_TABLE_1.get(codon)
    if aa is not None:
        return aa
    try:
        opts = [_NT_RESOLVE[c] for c in codon]
    except KeyError:
        return "X"
    aas = {CODON_TABLE_1[a + b + c] for a in opts[0] for b in opts[1] for c in opts[2]}
    return aas.pop() if len(aas) == 1 else "X"


def translate(seq: str, table: int = 1) -> str:
    """nt → aa; truncates to a codon multiple (reference behavior,
    lib/sonardb.py:1222-1257); ambiguous codons resolve when unambiguous
    at the aa level, else ``X``."""
    if table != 1:
        raise NotImplementedError("only translation table 1 is supported")
    n = len(seq) - (len(seq) % 3)
    return "".join(_translate_codon(seq[i : i + 3]) for i in range(0, n, 3))


def harmonize(seq: str) -> str:
    """Upper-case, strip, U→T (lib/sonardb.py:2425-2441)."""
    return str(seq).strip().upper().replace("U", "T")


def seguid(seq: str) -> str:
    """SEGUID: un-padded base64 of SHA-1 of the upper-cased sequence —
    the sequence identity key (lib/sonardb.py:2406-2423)."""
    digest = hashlib.sha1(seq.upper().encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii").rstrip("=")


IUPAC_NT_CHARS = frozenset("ACGTRYSWKMBDHVN")


def non_iupac_chars(seq: str) -> set[str]:
    """Characters outside the IUPAC nucleotide alphabet
    (lib/sonardb.py:2443-2458)."""
    return set(seq) - IUPAC_NT_CHARS


# EDNAFULL / NUC.4.4 nucleotide scoring matrix (public, Todd Lowe 1992,
# ftp://ftp.ncbi.nih.gov/blast/matrices/NUC.4.4) — the matrix EMBOSS
# Stretcher uses for DNA, embedded verbatim.
_EDNAFULL_ORDER = "ATGCSWRYKMBVHDN"
_EDNAFULL_ROWS = [
    [5, -4, -4, -4, -4, 1, 1, -4, -4, 1, -4, -1, -1, -1, -1],
    [-4, 5, -4, -4, -4, 1, -4, 1, 1, -4, -1, -4, -1, -1, -1],
    [-4, -4, 5, -4, 1, -4, 1, -4, 1, -4, -1, -1, -4, -1, -1],
    [-4, -4, -4, 5, 1, -4, -4, 1, -4, 1, -1, -1, -1, -4, -1],
    [-4, -4, 1, 1, -1, -4, -2, -2, -2, -2, -1, -1, -3, -3, 0],
    [1, 1, -4, -4, -4, -1, -2, -2, -2, -2, -3, -3, -1, -1, 0],
    [1, -4, 1, -4, -2, -2, -1, -4, -2, -2, -3, -1, -3, -1, 0],
    [-4, 1, -4, 1, -2, -2, -4, -1, -2, -2, -1, -3, -1, -3, 0],
    [-4, 1, 1, -4, -2, -2, -2, -2, -1, -4, -1, -3, -3, -1, 0],
    [1, -4, -4, 1, -2, -2, -2, -2, -4, -1, -3, -1, -1, -3, 0],
    [-4, -1, -1, -1, -1, -3, -3, -1, -1, -3, -1, -2, -2, -2, 0],
    [-1, -4, -1, -1, -1, -3, -1, -3, -3, -1, -2, -1, -2, -2, 0],
    [-1, -1, -4, -1, -3, -1, -3, -1, -3, -1, -2, -2, -1, -2, 0],
    [-1, -1, -1, -4, -3, -1, -1, -3, -1, -3, -2, -2, -2, -1, 0],
    [-2, -2, -2, -2, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, 0],
]

EDNAFULL: dict[tuple[str, str], int] = {
    (a, b): _EDNAFULL_ROWS[i][j]
    for i, a in enumerate(_EDNAFULL_ORDER)
    for j, b in enumerate(_EDNAFULL_ORDER)
}


def ednafull_byte_matrix():
    """256×256 int16 lookup keyed by (ord(a), ord(b)); unknown pairs score
    like N/N (0) mismatch floor -4 is NOT applied — unknown letters are
    rejected upstream by non_iupac_chars."""
    import numpy as np

    m = np.full((256, 256), -4, dtype=np.int16)
    for (a, b), v in EDNAFULL.items():
        m[ord(a), ord(b)] = v
    return m


@dataclass
class CDS:
    """One coding sequence: exon coordinate list (0-based, end-exclusive),
    forward-strand genomic sub-sequences, strand, symbol, locus.

    ``coding_positions`` enumerates genomic positions codon-wise and MAY
    CONTAIN DUPLICATES (ribosomal slippage: ORF1b's exons overlap at one
    base — the duplicated position is translated twice), matching the
    reference model (lib/sonardb.py:284-418)."""

    locus: str
    symbol: str
    coords: list[tuple[int, int]]
    seqs: list[str]
    strand: str = "+"
    translation_table: int = 1

    @property
    def start(self) -> int:
        return min(s for s, _ in self.coords)

    @property
    def end(self) -> int:
        return max(e for _, e in self.coords)

    @cached_property
    def coding_positions(self) -> list[int]:
        out: list[int] = []
        for s, e in self.coords:
            out.extend(range(s, e))
        return out

    @cached_property
    def coding_positions_set(self) -> frozenset[int]:
        return frozenset(self.coding_positions)

    @cached_property
    def coding_positions_sorted(self):
        """Sorted numpy copy of ``coding_positions`` for O(log n) range
        counts — sorting preserves the multiset, so slippage duplicates
        still count twice."""
        import numpy as np

        return np.sort(np.asarray(self.coding_positions, dtype=np.int64))

    @cached_property
    def nuc(self) -> str:
        seq = "".join(self.seqs)
        return revcomp(seq) if self.strand == "-" else seq

    @cached_property
    def aa(self) -> str:
        return translate(self.nuc, self.translation_table)

    def aa_to_nuc_pos(self, x: int) -> int:
        return self.coding_positions[3 * x]

    def is_exon(self, x: int, y: int | None = None) -> bool:
        # closed-interval test on end-exclusive coords — the reference's
        # exact overlap quirk (lib/sonardb.py:346-384: `y >= start and
        # end >= x`), kept bug-for-bug so boundary-adjacent variants
        # classify identically
        if y is None:
            y = x + 1
        return any(y >= s and e >= x for s, e in self.coords)

    def is_cds(self, x: int, y: int | None = None) -> bool:
        # same reference-parity closed-interval quirk as is_exon
        if y is None:
            y = x + 1
        return y >= self.start and self.end >= x

    def is_frameshift_del(self, x: int, y: int) -> bool:
        """Deletion [x,y) shifts the frame iff it hits the CDS and the
        count of remaining coding positions is not a codon multiple.
        Counted via searchsorted on the sorted position array — the
        linear scan here was ~11% of the whole ingest-UDF profile."""
        if not self.is_cds(x, y):
            return False
        import numpy as np

        a = self.coding_positions_sorted
        inside = int(np.searchsorted(a, y, "left")
                     - np.searchsorted(a, x, "left"))
        return (len(a) - inside) % 3 != 0

    def is_frameshift_in(self, x: int, length: int) -> bool:
        """Insertion of ``length`` bases (anchor excluded) at x shifts the
        frame iff length isn't a codon multiple and x is coding."""
        return length % 3 != 0 and x in self.coding_positions_set


def parse_gff3(gff_path: str, ref_seq: str, translation_table: int = 1) -> list[CDS]:
    """Parse CDS features from a GFF3 sidecar (driver-side; the result is
    a broadcast-sized list).  Multi-row features (ribosomal slippage)
    merge into one CDS with multiple exons (lib/sonardb.py:669-749)."""
    import re

    symbol_re = re.compile(r"gene=([^;]+)(?:;|$)")
    locus_re = re.compile(r"locus_tag=([^;]+)(?:;|$)")
    id_re = re.compile(r"ID=([^;]+)(?:;|$)")

    feats: dict[str, dict] = {}
    with open(gff_path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\r\n").split("\t")
            if len(fields) < 7 or fields[2] != "CDS":
                continue
            if len(fields) < 9:
                raise ValueError(
                    f"gff3 error: CDS row with {len(fields)} columns "
                    f"(9 required): {line.rstrip()[:120]!r}")
            attrs = fields[8]

            def _attr(rx, fallback=None):
                m = rx.search(attrs)
                if m:
                    return m.group(1)
                if fallback is not None:
                    return fallback
                raise ValueError(
                    f"gff3 error: CDS row missing ID=/gene=/locus_tag= "
                    f"attributes: {attrs[:120]!r}")

            fid = _attr(id_re)
            # real-world GFF3 rows often omit gene= or locus_tag=;
            # fall back through the identifiers that do exist
            symbol = _attr(symbol_re, fallback=_attr(locus_re, fallback=fid))
            locus = _attr(locus_re, fallback=fid)
            s, e = int(fields[3]) - 1, int(fields[4])
            entry = feats.setdefault(
                fid, {"locus": locus, "symbol": symbol, "strand": fields[6], "coords": []}
            )
            if entry["symbol"] != symbol or entry["strand"] != fields[6]:
                raise ValueError(f"gff3 error: inconsistent rows for feature {fid}")
            entry["coords"].append((s, e))

    out = []
    for data in feats.values():
        # FORWARD-strand slices always: CDS.nuc applies the single
        # reverse-complement for '-' strands — complementing here too
        # would cancel it out and join exons in the wrong order
        seqs = [ref_seq[s:e] for s, e in data["coords"]]
        out.append(CDS(data["locus"], data["symbol"], data["coords"], seqs,
                       data["strand"], translation_table))
    return sorted(out, key=lambda c: c.start)


def read_fasta_one(path: str) -> tuple[str, str, str]:
    """Read a single-record FASTA → (accession, description, sequence)."""
    import gzip
    import lzma

    opener = gzip.open if path.endswith(".gz") else lzma.open if path.endswith(".xz") else open
    with opener(path, "rt") as fh:
        header = None
        chunks: list[str] = []
        for line in fh:
            line = line.rstrip()
            if line.startswith(">"):
                if header is not None:
                    break
                header = line[1:]
            elif line:
                chunks.append(line)
    if header is None:
        raise ValueError(f"no FASTA record in {path}")
    acc = header.split(" ")[0]
    return acc, header, "".join(chunks)
