"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Decode status:
  * PNG images and RIFF/WAV audio decode FOR REAL via the stdlib-only
    codec in :mod:`covsonar_spark.functions.png` (zlib scanline
    inflate + filter reconstruction; ``wave`` for PCM) — genuine pixel
    / sample statistics flow into the feature vectors.
  * other formats (JPEG, MP4, …) have no stdlib decoder; those
    payloads fall back to a deterministic md5-derived stand-in, gated
    behind ``_HAVE_PIL`` for a real-library swap-in on a cluster that
    has PIL/librosa/ffmpeg.  The Spark-side contract (schema, batch
    iteration, fan-out shape) is identical on both paths.

Scale notes (100 TB of media):
  * binary payloads ride along in parquet; the feature stages are pure
    map operations (no shuffle) so they scale with input partitions —
    size ``spark.sql.files.maxPartitionBytes`` so one task holds a few
    hundred MB of payload.
  * frame sampling fans out rows (1 → n_frames); it stays mapInPandas
    (no explode-then-shuffle) and downstream aggregations shuffle the
    *small* feature rows, never the raw bytes.
  * column pruning matters most here: every query that doesn't need
    ``content`` must not read it — keep features in separate tables.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("content", T.BinaryType(), False),    # opaque payload
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

_FEAT_DIM = 8


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic media table from a text corpus: kind by id mod 3,
    payload = the utf-8 bytes of the text, typed metadata derived from
    the id. Pure column expressions (zero UDF) — this is the fixture
    generator that lets the multimodal plumbing be value-checked
    against a SQL oracle without real media files."""
    m3 = F.col(id_col) % 3
    kind = (F.when(m3 == 0, "image").when(m3 == 1, "audio")
            .otherwise("video"))
    mime = (F.when(m3 == 0, "image/png").when(m3 == 1, "audio/wav")
            .otherwise("video/mp4"))
    width = F.when(m3 == 0, (64 * (F.col(id_col) % 5 + 1)).cast("int"))
    height = F.when(m3 == 0, (48 * (F.col(id_col) % 4 + 1)).cast("int"))
    duration = F.when(m3 != 0, ((F.col(id_col) % 7 + 1) * 1500).cast("int"))
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(mime.alias("mime"), width.alias("width"),
                 height.alias("height"),
                 duration.alias("duration_ms")).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = _FEAT_DIM) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: ``dim``
    floats in [0,1) derived from md5(payload). Used only for formats
    with no stdlib decoder (see module docstring)."""
    out = []
    for i in range(dim):
        h = hashlib.md5(payload + i.to_bytes(4, "big")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def _pixel_features(payload: bytes, dim: int = _FEAT_DIM) -> list[float] | None:
    """REAL image features from a decoded PNG: [mean, std, min, max]
    of the luminance plane plus a (dim-4)-bin normalized histogram —
    all in [0,1].  Returns None for non-PNG payloads (caller falls
    back to the deterministic stand-in)."""
    import numpy as np

    from covsonar_spark.functions.png import decode_png, is_png

    if not is_png(payload):
        return None
    try:
        w, h, ch, raw = decode_png(payload)
    except Exception:  # noqa: BLE001 — corrupt PNG: fall back
        return None
    if not raw:                               # zero-area image: no pixels
        return None
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    if ch == 3:  # Rec.601 luma
        px = px.reshape(-1, 3) @ np.array([0.299, 0.587, 0.114])
    px /= 255.0
    hist, _ = np.histogram(px, bins=dim - 4, range=(0.0, 1.0))
    return ([float(px.mean()), float(px.std()), float(px.min()),
             float(px.max())] + (hist / max(len(px), 1)).tolist())


def image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """image bytes → feature vector. mapInPandas: one Arrow batch in,
    one feature row out per image; raw bytes never leave the stage.
    PNG payloads decode for real (stdlib zlib codec); other formats
    use the md5 stand-in until a real library is swapped in."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if _HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path: Image.open(BytesIO(b)) → resize → "
                    "normalize; enable when PIL is present")
            feats = []
            for b in pdf["content"]:
                payload = bytes(b)
                f = _pixel_features(payload)
                feats.append(f if f is not None else _fake_features(payload))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [m["width"] if m else None for m in pdf["meta"]],
                "height": [m["height"] if m else None for m in pdf["meta"]],
                "features": feats,
            })

    return df.where(F.col("kind") == "image").mapInPandas(
        run,
        schema="media_id long, width int, height int, features array<double>")


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video → one row per sampled frame (fan-out inside mapInPandas;
    frame payload is a deterministic slice stand-in for a real ffmpeg
    seek+decode)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                dur = (meta["duration_ms"] if meta else 0) or 0
                payload = bytes(content)
                for fi, t in enumerate(range(0, max(dur, 1), every_ms)):
                    ids.append(mid)
                    idxs.append(fi)
                    ts.append(t)
                    lo = (t * 31) % max(len(payload), 1)
                    frames.append(payload[lo:lo + 64])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "t_ms": ts, "frame": frames})

    return df.where(F.col("kind") == "video").mapInPandas(
        run, schema="media_id long, frame_idx int, t_ms int, frame binary")


def _pcm_window_features(payload: bytes, n_windows: int,
                         dim: int = _FEAT_DIM) -> list[list[float]] | None:
    """REAL audio features from a RIFF/WAV payload: per window,
    [rms, zero-crossing rate, peak, mean] plus (dim-4) coarse
    energy-band values from a rectangular DFT — stdlib ``wave`` +
    numpy, no external audio lib.  None for non-WAV payloads."""
    import numpy as np

    from covsonar_spark.functions.png import decode_wav

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    try:
        nch, rate, width, frames = decode_wav(payload)
    except Exception:  # noqa: BLE001 — corrupt RIFF: fall back
        return None
    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dt is None or not frames:
        return None
    x = np.frombuffer(frames, dtype=dt).astype(np.float64)
    if width == 1:
        x -= 128.0                            # 8-bit WAV PCM is UNSIGNED
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    x /= float(2 ** (8 * width - 1))          # normalize to [-1, 1]
    step = max(len(x) // n_windows, 1)
    out = []
    for w in range(n_windows):
        seg = x[w * step:(w + 1) * step]
        if not len(seg):
            out.append([0.0] * dim)
            continue
        rms = float(np.sqrt((seg * seg).mean()))
        zcr = float((np.diff(np.signbit(seg)) != 0).mean()) if len(seg) > 1 else 0.0
        spec = np.abs(np.fft.rfft(seg))
        bands = np.array_split(spec, dim - 4)
        denom = spec.sum() or 1.0
        out.append([rms, zcr, float(np.abs(seg).max()), float(seg.mean())]
                   + [float(b.sum() / denom) for b in bands])
    return out


def audio_features(df: DataFrame, n_windows: int = 4) -> DataFrame:
    """audio → fixed number of windowed feature vectors per clip.
    RIFF/WAV payloads decode for real (stdlib ``wave`` → RMS/ZCR/band
    energies); other formats use the md5 stand-in."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, widx, feats = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                real = _pcm_window_features(payload, n_windows)
                step = max(len(payload) // n_windows, 1)
                for w in range(n_windows):
                    ids.append(mid)
                    widx.append(w)
                    feats.append(real[w] if real is not None else
                                 _fake_features(payload[w * step:(w + 1) * step]))
            yield pd.DataFrame({"media_id": ids, "window_idx": widx,
                                "features": feats})

    return df.where(F.col("kind") == "audio").mapInPandas(
        run, schema="media_id long, window_idx int, features array<double>")
