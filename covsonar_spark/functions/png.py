"""Minimal, dependency-free PNG codec (stdlib zlib/struct only).

A REAL decoder for the multimodal image path: the container has no
PIL/imageio, but PNG's mandatory pieces — chunk framing, zlib-deflated
scanlines, the five scanline filters — need nothing beyond the stdlib.
Supports 8-bit grayscale (color type 0) and 8-bit RGB (color type 2),
non-interlaced: enough for thumbnails/fixtures and for exercising the
decode → feature pipeline end-to-end with genuine pixel data.

The encoder exists so tests can fabricate valid payloads; the decoder
is the production-shaped kernel used by
``covsonar_spark.operators.multimodal.image_features``.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

# decode ceiling for a single image's raw pixels: protects the Python
# worker from decompression bombs (a kilobyte IDAT can legally declare
# and inflate to gigabytes) — generous for the thumbnail/fixture
# profile this codec serves
MAX_PIXEL_BYTES = 64 << 20


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 1) -> bytes:
    """Write a non-interlaced 8-bit PNG (grayscale or RGB), filter 0."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode → (width, height, channels, raw pixel bytes, row-major).

    Handles all five scanline filters (None/Sub/Up/Average/Paeth);
    raises ValueError on anything outside the supported profile so the
    caller can fall back / surface a per-row error.
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or ctype not in (0, 2) or ilace != 0:
                raise ValueError(
                    f"unsupported PNG profile (depth={depth}, color={ctype}, "
                    f"interlace={ilace}); supported: 8-bit gray/RGB")
            channels = 1 if ctype == 0 else 3
            # decompression-bomb guard: the declared dimensions bound
            # every later allocation, so reject absurd ones up front —
            # a tiny adversarial IDAT can otherwise inflate to GBs and
            # OOM the Python worker before any size check runs.  Zero
            # dimensions are rejected too: width*height==0 would pass
            # the ceiling while making the inflate bound degenerate
            # (zlib treats max_length=0 as UNBOUNDED) or hugely over-
            # provisioned ((0*ch+1)*height bytes for width=0).
            if width == 0 or height == 0:
                raise ValueError("PNG declares a zero dimension")
            if (width * channels + 1) * height > MAX_PIXEL_BYTES:
                raise ValueError(
                    f"PNG dimensions {width}x{height}x{channels} exceed "
                    f"the {MAX_PIXEL_BYTES >> 20} MiB decode ceiling")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    stride = width * channels
    expect = (stride + 1) * height
    # bounded inflate: cap the output at the size IHDR promises so an
    # oversized stream raises instead of allocating unboundedly
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expect)
    if d.unconsumed_tail:
        raise ValueError("IDAT inflates past the declared image size")
    if not d.eof:
        # the plain zlib.decompress this replaced enforced stream
        # termination + the adler32 trailer; keep both properties so a
        # truncated or checksum-corrupt IDAT of exactly the right
        # length is still rejected
        raise ValueError("IDAT stream is truncated or unterminated")
    if len(raw) != expect:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:      # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a RIFF/WAVE payload via the stdlib ``wave`` module →
    (n_channels, sample_rate, sample_width, pcm_frames)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        return (w.getnchannels(), w.getframerate(), w.getsampwidth(),
                w.readframes(w.getnframes()))


def encode_wav(pcm: bytes, n_channels: int = 1, sample_rate: int = 8000,
               sample_width: int = 2) -> bytes:
    """Write a PCM WAV via the stdlib ``wave`` module (test fixture)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()
