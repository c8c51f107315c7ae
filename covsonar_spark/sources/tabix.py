"""Tabix ``.tbi`` index writer — stdlib-only, paired with the BGZF
writer (sources/bgzf.py).

Reference parity: the reference's VCF pipeline delivers indexed
``.vcf.gz`` by shelling out to ``bgzip`` + ``tabix -p vcf``
(/root/reference/lib/sonartoVCF.py:129-144); this emits the same
``.tbi`` sidecar at write time with no external tools, so downstream
htslib/bcftools/IGV consumers can region-seek the engine's output
directly.

Format (public htslib tabix spec, TBI version 1): a BGZF-compressed
payload of

  magic "TBI\\1" | n_ref | format | col_seq col_beg col_end | meta |
  skip | l_nm | names\\0… | per ref: binning index (UCSC bins →
  chunk [virtual-offset beg, end) lists) + 16 kb linear index |
  n_no_coor

Virtual file offsets are ``(compressed_block_start << 16) |
uncompressed_offset_within_block`` — recoverable for a finished BGZF
file by re-walking its blocks (each block header carries its
compressed length), which is what :func:`build_tabix_index` does:
stream the written ``.vcf.gz`` once, track line-start offsets, bin
records, emit the index.  Indexing cost ≈ one decompression pass of
the file just written — the same order as the write itself.

The pseudo-bin 37450 (htslib metadata: file range of the ref's records
+ mapped/unmapped counts) is included for bit-level consumer parity.
"""

from __future__ import annotations

import struct
import zlib

from covsonar_spark.sources.bgzf import BgzfWriter

TBI_MAGIC = b"TBI\x01"
FMT_VCF = 2
PSEUDO_BIN = 37450
LINEAR_SHIFT = 14          # 16 kb linear-index windows


def reg2bin(beg: int, end: int) -> int:
    """UCSC binning: smallest bin fully containing [beg, end)
    (public htslib/tabix spec, also SAMv1 §5.3)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def reg2bins(beg: int, end: int) -> list[int]:
    """Every bin overlapping [beg, end) — the QUERY side of the binning
    scheme (used by :func:`fetch_region` and the index tests)."""
    out = [0]
    end -= 1
    for shift, off in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        out.extend(range(off + (beg >> shift), off + (end >> shift) + 1))
    return out


def _iter_lines_with_voffs(path: str):
    """Walk a BGZF file block-by-block, yielding
    ``(line_bytes, voff_start, voff_end)`` per newline-terminated line
    — virtual offsets derived from each block's compressed extent."""
    carry = b""
    carry_voff = 0
    coffset = 0
    with open(path, "rb") as fh:
        while True:
            header = fh.read(18)
            if not header:
                break
            if len(header) < 18 or header[:4] != b"\x1f\x8b\x08\x04":
                raise ValueError("not a BGZF member header")
            bsize = struct.unpack("<H", header[16:18])[0] + 1
            rest = fh.read(bsize - 18)
            if len(rest) != bsize - 18:
                raise ValueError("truncated BGZF block")
            payload = zlib.decompress(rest[:-8], -15)
            pos = 0
            while True:
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    tail = payload[pos:]
                    if tail:
                        if not carry:
                            carry_voff = (coffset << 16) | pos
                        carry += tail
                    break
                line = payload[pos:nl + 1]
                if carry:
                    line = carry + line
                    start = carry_voff
                    carry = b""
                else:
                    start = (coffset << 16) | pos
                pos = nl + 1
                # end voff: byte AFTER the newline; when the line ends
                # exactly at the block boundary, htslib records the
                # NEXT block's offset 0 — equivalent for chunk pruning
                end = (coffset << 16) | pos
                yield line, start, end
            coffset += bsize
    if carry:
        raise ValueError("BGZF payload does not end in a newline")


def build_tabix_index(path: str, out: str | None = None,
                      preset: str = "vcf") -> str:
    """Index a BGZF-compressed VCF written by this engine's sinks
    (operators/vcf.py) and write ``<path>.tbi``; returns the index
    path.  One streaming pass; driver memory is O(bins + 16 kb
    windows), not O(records)."""
    if preset != "vcf":
        raise ValueError("only the vcf preset is implemented")
    out = out or path + ".tbi"

    names: list[bytes] = []
    ref_ids: dict[bytes, int] = {}
    bins: list[dict[int, list[tuple[int, int]]]] = []
    linear: list[dict[int, int]] = []
    stats: list[list[int]] = []       # per ref: [off_beg, off_end, n_rec]

    for line, voff_s, voff_e in _iter_lines_with_voffs(path):
        if line.startswith(b"#"):
            continue
        f = line.split(b"\t", 4)
        chrom, pos_b, ref_allele = f[0], f[1], f[3]
        beg = int(pos_b) - 1
        end = beg + max(len(ref_allele), 1)
        rid = ref_ids.get(chrom)
        if rid is None:
            rid = ref_ids[chrom] = len(names)
            names.append(chrom)
            bins.append({})
            linear.append({})
            stats.append([voff_s, voff_e, 0])
        b = reg2bin(beg, end)
        chunks = bins[rid].setdefault(b, [])
        if chunks and chunks[-1][1] == voff_s:
            chunks[-1] = (chunks[-1][0], voff_e)   # coalesce adjacent
        else:
            chunks.append((voff_s, voff_e))
        for w in range(beg >> LINEAR_SHIFT,
                       max(beg, end - 1) >> LINEAR_SHIFT):
            linear[rid].setdefault(w, voff_s)
        linear[rid].setdefault(max(beg, end - 1) >> LINEAR_SHIFT, voff_s)
        stats[rid][1] = voff_e
        stats[rid][2] += 1

    payload = bytearray()
    payload += TBI_MAGIC
    payload += struct.pack("<i", len(names))
    payload += struct.pack("<6i", FMT_VCF, 1, 2, 0, ord("#"), 0)
    nm = b"\x00".join(names) + b"\x00" if names else b""
    payload += struct.pack("<i", len(nm)) + nm
    for rid in range(len(names)):
        ref_bins = bins[rid]
        payload += struct.pack("<i", len(ref_bins) + 1)   # + pseudo-bin
        for b in sorted(ref_bins):
            chunks = ref_bins[b]
            payload += struct.pack("<Ii", b, len(chunks))
            for s, e in chunks:
                payload += struct.pack("<QQ", s, e)
        payload += struct.pack("<Ii", PSEUDO_BIN, 2)
        payload += struct.pack("<QQ", stats[rid][0], stats[rid][1])
        payload += struct.pack("<QQ", stats[rid][2], 0)
        n_intv = (max(linear[rid]) + 1) if linear[rid] else 0
        payload += struct.pack("<i", n_intv)
        last = 0
        for w in range(n_intv):
            # htslib fills an empty window with the previous cell so a
            # query landing there still seeks to a safe lower bound
            last = linear[rid].get(w, last)
            payload += struct.pack("<Q", last)
    payload += struct.pack("<Q", 0)   # n_no_coor

    with open(out, "wb") as raw:
        w = BgzfWriter(raw)
        w.write(bytes(payload))
        w.close()
    return out


# ---------------------------------------------------------------------------
# Index consumers — a structural reader and a region fetch, used by the
# tests to prove the written offsets actually seek (stronger than
# byte-comparing against a fixture) and available as a library utility.
# ---------------------------------------------------------------------------

def read_tabix_index(path: str) -> dict:
    """Parse a ``.tbi`` file back into a dict (validation/debugging)."""
    import gzip

    with gzip.open(path, "rb") as fh:   # BGZF is valid multi-member gzip
        data = fh.read()
    if data[:4] != TBI_MAGIC:
        raise ValueError("not a TBI index")
    off = 4
    n_ref, fmt, c_seq, c_beg, c_end, meta, skip, l_nm = struct.unpack_from(
        "<8i", data, off)
    off += 32
    names = data[off:off + l_nm].split(b"\x00")[:-1]
    off += l_nm
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, off)
        off += 4
        ref_bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", data, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                s, e = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((s, e))
            ref_bins[b] = chunks
        (n_intv,) = struct.unpack_from("<i", data, off)
        off += 4
        intv = list(struct.unpack_from(f"<{n_intv}Q", data, off))
        off += 8 * n_intv
        refs.append({"bins": ref_bins, "linear": intv})
    return {"n_ref": n_ref, "format": fmt, "cols": (c_seq, c_beg, c_end),
            "meta": meta, "skip": skip,
            "names": [n.decode() for n in names], "refs": refs}


def _iter_lines_from_voff(path: str, voff: int):
    """Lazily yield ``(line_start_voff, line)`` pairs starting at a
    virtual offset — streams block-by-block, and reporting each line's
    own virtual offset lets the caller stop the moment it passes a
    chunk's END voff instead of scanning to EOF."""
    coffset, uoffset = voff >> 16, voff & 0xFFFF
    carry = b""
    carry_voff = None
    with open(path, "rb") as fh:
        fh.seek(coffset)
        first = True
        while True:
            block_coffset = fh.tell()
            header = fh.read(18)
            if len(header) < 18:
                break
            bsize = struct.unpack("<H", header[16:18])[0] + 1
            rest = fh.read(bsize - 18)
            payload = zlib.decompress(rest[:-8], -15)
            base = 0
            if first:
                payload = payload[uoffset:]
                base = uoffset
                first = False
            pos = 0
            while True:
                nl = payload.find(b"\n", pos)
                if nl < 0:
                    if payload[pos:] and carry_voff is None:
                        carry_voff = (block_coffset << 16) | (base + pos)
                    carry += payload[pos:]
                    break
                voff_line = carry_voff if carry_voff is not None \
                    else (block_coffset << 16) | (base + pos)
                yield voff_line, carry + payload[pos:nl]
                carry = b""
                carry_voff = None
                pos = nl + 1
    if carry:
        yield carry_voff, carry


def fetch_region(vcf_gz: str, tbi: str, chrom: str,
                 beg: int, end: int) -> list[bytes]:
    """Region query through the index — the tabix semantics consumers
    rely on: all data lines overlapping [beg, end) (0-based)."""
    idx = read_tabix_index(tbi)
    if chrom not in idx["names"]:
        return []
    ref = idx["refs"][idx["names"].index(chrom)]
    min_voff = 0
    w = beg >> LINEAR_SHIFT
    if ref["linear"] and w < len(ref["linear"]):
        min_voff = ref["linear"][w]
    chunks = []
    for b in reg2bins(beg, end):
        for s, e in ref["bins"].get(b, []):
            if e > min_voff:
                chunks.append((max(s, min_voff), e))
    out = []
    want = chrom.encode()
    for s, e in sorted(set(chunks)):
        seen_chrom = False
        for voff_line, line in _iter_lines_from_voff(vcf_gz, s):
            if voff_line >= e:
                break          # past this chunk's END voff: the index
                #                guarantees no overlapping record beyond
            if not line or line.startswith(b"#"):
                continue
            f = line.split(b"\t", 4)
            if len(f) < 4:
                continue
            if f[0] != want:
                if seen_chrom:
                    break      # sorted file: target chrom's records done
                continue
            seen_chrom = True
            rb = int(f[1]) - 1
            re_ = rb + max(len(f[3]), 1)
            if rb < end and re_ > beg:
                out.append(line)
            if rb >= end:
                break
    return sorted(set(out), key=lambda ln: int(ln.split(b"\t", 2)[1]))
