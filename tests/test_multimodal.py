"""Multimodal plumbing: schema, determinism, fan-out shape, partition
behavior — the decode kernels are stubbed, the Spark contracts are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.multimodal import (MEDIA_SCHEMA, audio_features,
                                                 image_features, sample_frames)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    kinds = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                         (F.col("doc_id") % 3 + 1).cast("int"))
    df = docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            (F.col("doc_id") % 5000 + 500).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    out = spark.createDataFrame(df.collect(), MEDIA_SCHEMA).repartition(4).cache()
    out.count()
    return out


def test_media_schema_roundtrip(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.rdd.getNumPartitions() == 4


def test_image_features_schema_and_determinism(media):
    feats = image_features(media)
    assert feats.columns == ["media_id", "width", "height", "features"]
    rows1 = {r["media_id"]: r for r in feats.collect()}
    rows2 = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(rows1) == media.where("kind = 'image'").count()
    for mid, r in rows1.items():
        assert len(r["features"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["features"])
        assert r["features"] == rows2[mid]["features"]  # deterministic
        assert 1 <= r["width"] <= 640


def test_frame_sampling_fanout(media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    vids = {r["media_id"]: r for r in
            media.where("kind = 'video'").select("media_id", "meta").collect()}
    assert {r["media_id"] for r in rows} == set(vids)
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_id.items():
        dur = vids[mid]["meta"]["duration_ms"]
        want = len(range(0, max(dur, 1), 1000))
        assert len(rs) == want
        assert sorted(r["frame_idx"] for r in rs) == list(range(want))
        assert all(isinstance(r["frame"], (bytes, bytearray)) for r in rs)


def test_audio_windows(media):
    rows = audio_features(media, n_windows=4).collect()
    n_audio = media.where("kind = 'audio'").count()
    assert len(rows) == 4 * n_audio
    assert all(len(r["features"]) == 8 for r in rows)


def test_content_pruned_when_not_needed(media):
    """Column pruning: a metadata-only projection must not carry the
    payload column through the plan."""
    pruned = media.select("media_id", "kind")
    assert "content" not in pruned.columns
    assert "content" not in pruned._jdf.queryExecution().optimizedPlan().schema().treeString()


def test_media_from_documents_contract(spark):
    """The oracle-checked fixture builder: schema matches MEDIA_SCHEMA
    modulo nullability, payload is the exact utf-8 bytes, metadata is
    typed per kind."""
    from covsonar_spark.operators.multimodal import media_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields]
    rows = {r["media_id"]: r for r in media.collect()}
    docs_rows = {r["doc_id"]: r for r in docs.collect()}
    for mid, r in rows.items():
        assert bytes(r["content"]) == docs_rows[mid]["text"].encode()
        if r["kind"] == "image":
            assert r["meta"]["duration_ms"] is None
            assert r["meta"]["width"] is not None
        else:
            assert r["meta"]["duration_ms"] == ((mid % 7) + 1) * 1500
            assert r["meta"]["width"] is None


# ---------------------------------------------------------------------------
# REAL decode paths (stdlib PNG codec + wave) — no PIL in this container
# ---------------------------------------------------------------------------

def test_png_codec_roundtrip_gray_and_rgb():
    from covsonar_spark.functions.png import decode_png, encode_png

    gray = bytes((x * 7 + y * 13) % 256 for y in range(9) for x in range(5))
    data = encode_png(gray, 5, 9, channels=1)
    w, h, ch, raw = decode_png(data)
    assert (w, h, ch) == (5, 9, 1) and raw == gray

    rgb = bytes((x * i + y) % 256 for y in range(4) for x in range(6)
                for i in (1, 2, 3))
    data = encode_png(rgb, 6, 4, channels=3)
    w, h, ch, raw = decode_png(data)
    assert (w, h, ch) == (6, 4, 3) and raw == rgb


def test_png_decoder_handles_all_filters():
    """Hand-build IDAT scanlines using filters 1-4 (our encoder only
    emits 0) and check reconstruction against the known pixel plane."""
    import struct
    import zlib

    from covsonar_spark.functions.png import _chunk, _SIG, decode_png

    width, height = 4, 5
    pixels = bytes((x * 37 + y * 11) % 256 for y in range(height)
                   for x in range(width))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    rows = [pixels[y * width:(y + 1) * width] for y in range(height)]
    filtered = bytearray()
    prev = bytes(width)
    for y, (ftype, row) in enumerate(zip([0, 1, 2, 3, 4], rows)):
        filtered.append(ftype)
        for i, v in enumerate(row):
            left = row[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            if ftype == 0:
                f = v
            elif ftype == 1:
                f = (v - left) & 0xFF
            elif ftype == 2:
                f = (v - up) & 0xFF
            elif ftype == 3:
                f = (v - ((left + up) >> 1)) & 0xFF
            else:
                f = (v - paeth(left, up, ul)) & 0xFF
            filtered.append(f)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(filtered)))
            + _chunk(b"IEND", b""))
    w, h, ch, raw = decode_png(data)
    assert raw == pixels


def test_image_features_real_png_pixels(spark):
    """A genuine PNG payload produces genuine pixel statistics — a flat
    mid-gray image must report mean 0.5 ± quantization, std 0."""
    from covsonar_spark.functions.png import encode_png
    from covsonar_spark.operators.multimodal import image_features

    flat = encode_png(bytes([128] * (16 * 16)), 16, 16)
    df = spark.createDataFrame(
        [(1, "image", bytearray(flat), {"mime": "image/png", "width": 16,
                                        "height": 16, "duration_ms": None})],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>")
    (row,) = image_features(df).collect()
    feats = row["features"]
    assert abs(feats[0] - 128 / 255) < 1e-9      # mean
    assert feats[1] == 0.0                       # std of a flat image
    assert feats[2] == feats[3] == 128 / 255     # min == max


def test_audio_features_real_wav(spark):
    """A genuine WAV sine payload produces real RMS/ZCR — a pure tone's
    RMS is 1/sqrt(2) of its amplitude."""
    import math

    from covsonar_spark.functions.png import encode_wav
    from covsonar_spark.operators.multimodal import audio_features

    amp = 0.5
    pcm = b"".join(
        int(amp * 32767 * math.sin(2 * math.pi * 440 * t / 8000))
        .to_bytes(2, "little", signed=True) for t in range(8000))
    wav = encode_wav(pcm)
    df = spark.createDataFrame(
        [(2, "audio", bytearray(wav), {"mime": "audio/wav", "width": None,
                                       "height": None, "duration_ms": 1000})],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>")
    rows = audio_features(df, n_windows=4).collect()
    assert len(rows) == 4
    for r in rows:
        rms = r["features"][0]
        assert abs(rms - amp / math.sqrt(2)) < 0.01
        assert 0.05 < r["features"][1] < 0.25    # ZCR of 440 Hz @ 8 kHz


def test_audio_features_8bit_wav_unsigned(spark):
    """8-bit WAV PCM is unsigned per the RIFF spec: a silent 8-bit clip
    (all 0x80) must report RMS ~0, not 1.0."""
    from covsonar_spark.functions.png import encode_wav
    from covsonar_spark.operators.multimodal import _pcm_window_features

    wav = encode_wav(bytes([128] * 4000), sample_width=1)
    feats = _pcm_window_features(wav, 4)
    assert feats is not None
    for f in feats:
        assert abs(f[0]) < 1e-9           # rms
        assert abs(f[3]) < 1e-9           # mean


def test_corrupt_and_zero_area_payloads_fall_back(spark):
    """Corrupt PNG/WAV payloads and zero-area PNGs fall back to the
    deterministic stand-in instead of emitting NaN or crashing."""
    import struct
    import zlib

    from covsonar_spark.functions.png import _SIG, _chunk
    from covsonar_spark.operators.multimodal import (_pcm_window_features,
                                                     _pixel_features)

    truncated_png = _SIG + b"\x00\x00\x00\x0dIHDRgarbage"
    assert _pixel_features(truncated_png) is None
    zero_area = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 5, 8, 0, 0, 0, 0))
                 + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b""))
    assert _pixel_features(zero_area) is None
    bad_wav = b"RIFF" + b"\x00" * 4 + b"WAVEgarbage"
    assert _pcm_window_features(bad_wav, 4) is None


def test_png_decompression_bomb_rejected():
    """A kilobyte IDAT declaring gigabyte dimensions must raise before
    any inflate, and a stream inflating past the declared size must
    raise from the bounded decompressor — the worker never allocates
    beyond the IHDR-derived budget."""
    import struct
    import zlib

    from covsonar_spark.functions import png

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 50_000, 50_000, 8, 2, 0, 0, 0)
    bomb = (png._SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decode ceiling"):
        png.decode_png(bomb)

    ihdr2 = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    over = (png._SIG + chunk(b"IHDR", ihdr2)
            + chunk(b"IDAT", zlib.compress(b"\x00" * (10 * (3 * 3 + 1) * 2)))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates past"):
        png.decode_png(over)

    # zero-dimension bypass: width*height==0 must not slip past the
    # ceiling into an unbounded (max_length=0) or over-provisioned inflate
    for w, h in ((10, 0), (0, 500_000_000)):
        zb = (png._SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
              + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
              + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="zero dimension"):
            png.decode_png(zb)

    # unterminated stream of exactly the declared size: the bounded
    # decompressor must still enforce stream end + adler32
    c = zlib.compressobj()
    body = c.compress(b"\x00" * ((3 * 3 + 1) * 2)) + c.flush(zlib.Z_SYNC_FLUSH)
    unterm = (png._SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
              + chunk(b"IDAT", body) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated or unterminated"):
        png.decode_png(unterm)
