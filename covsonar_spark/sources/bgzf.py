"""Pure-Python BGZF (blocked gzip) writer — bgzip/tabix-compatible
compressed VCF output with stdlib ``zlib`` only.

Reference parity: the reference shells out to external ``bgzip`` to
compress its VCF deliverables (/root/reference/lib/sonartoVCF.py:129-144,
226-303).  BGZF is the htslib container format: a concatenation of
complete gzip members, each holding at most 64 KiB of uncompressed
payload and carrying its own compressed size in a ``BC`` gzip extra
subfield, terminated by a fixed 28-byte empty-member EOF marker.
Because every block is a well-formed gzip member, any multi-member
gzip reader (Python's ``gzip`` module, ``zcat``) decompresses BGZF
transparently; the per-block size index is what lets bgzip/tabix seek,
so downstream ``tabix -p vcf`` indexing works on files written here.

Format layout per block (little-endian):
  1f 8b 08 04 | MTIME=0 (4B) | XFL=0 OS=ff | XLEN=6 |
  'B' 'C' SLEN=2 BSIZE(2B, total block length - 1) |
  <raw deflate of payload> | CRC32(4B) | ISIZE(4B)
"""

from __future__ import annotations

import contextlib
import io
import struct
import zlib

# bgzip's payload per block: leaves room for worst-case deflate
# expansion (stored blocks) so total block length stays < 65536,
# whose -1 must fit the 16-bit BSIZE field
MAX_BLOCK_DATA = 65280

# the canonical 28-byte BGZF EOF marker (an empty payload block),
# byte-for-byte what bgzip emits and htslib checks for
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def _block(data: bytes) -> bytes:
    """One complete BGZF block for <=MAX_BLOCK_DATA payload bytes."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 26                        # 18 header + 8 trailer
    if bsize > 0xFFFF + 1:
        raise ValueError("BGZF block overflow (payload too large)")
    header = struct.pack("<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
    extra = struct.pack("<BBHH", 0x42, 0x43, 2, bsize - 1)
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                          len(data) & 0xFFFFFFFF)
    return header + extra + comp + trailer


class BgzfWriter(io.RawIOBase):
    """Binary file-like writer producing BGZF output on ``fileobj``.

    Buffers to MAX_BLOCK_DATA-byte blocks; ``close()`` flushes the tail
    block and appends the EOF marker.  Wrap in ``io.TextIOWrapper`` for
    text output (see :func:`bgzf_text_writer`)."""

    def __init__(self, fileobj) -> None:
        super().__init__()
        self._fh = fileobj
        self._buf = bytearray()

    def writable(self) -> bool:  # io.RawIOBase protocol
        return True

    def write(self, data) -> int:
        self._buf += data
        while len(self._buf) >= MAX_BLOCK_DATA:
            self._fh.write(_block(bytes(self._buf[:MAX_BLOCK_DATA])))
            del self._buf[:MAX_BLOCK_DATA]
        return len(data)

    def close(self) -> None:
        if self.closed:
            return
        try:
            if self._buf:
                self._fh.write(_block(bytes(self._buf)))
                self._buf.clear()
            self._fh.write(BGZF_EOF)
            self._fh.flush()
        finally:
            super().close()


@contextlib.contextmanager
def bgzf_text_writer(path: str, encoding: str = "utf-8"):
    """Context manager yielding a TEXT-mode writer whose output lands
    at ``path`` as BGZF — drop-in for ``open(path, 'w')`` in the VCF
    sinks."""
    with open(path, "wb") as raw:
        bgzf = BgzfWriter(raw)
        text = io.TextIOWrapper(io.BufferedWriter(bgzf), encoding=encoding,
                                newline="")
        try:
            yield text
        finally:
            text.close()     # cascades: flush text -> buffer -> bgzf EOF


def iter_blocks(path: str):
    """Parse a BGZF file block-by-block (validation helper): yields
    (block_length, uncompressed_length) per block, EOF marker included.
    Raises ValueError on any non-BGZF member."""
    with open(path, "rb") as fh:
        while True:
            header = fh.read(18)
            if not header:
                return
            if len(header) < 18 or header[:4] != b"\x1f\x8b\x08\x04":
                raise ValueError("not a BGZF member header")
            xlen = struct.unpack("<H", header[10:12])[0]
            extra = header[12:12 + 6]
            if xlen != 6 or extra[:2] != b"BC":
                raise ValueError("missing BC subfield")
            bsize = struct.unpack("<H", extra[4:6])[0] + 1
            rest = fh.read(bsize - 18)
            if len(rest) != bsize - 18:
                raise ValueError("truncated BGZF block")
            isize = struct.unpack("<I", rest[-4:])[0]
            yield bsize, isize
