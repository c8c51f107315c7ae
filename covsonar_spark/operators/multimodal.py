"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode kernels are STUBBED — this container has no image/audio
libraries — behind ``_HAVE_PIL``-style gates with a deterministic
md5-derived fake, so every Spark-side contract (schema, batch
iteration, partition preservation, fan-out shape) is real and tested
while the kernel body is swappable for PIL/librosa/ffmpeg on a real
cluster.

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
    floats in [0,1) derived from md5(payload). Replace with a real
    model/decoder on a cluster with the media libs installed."""
    out = []
    for i in range(dim):
        h = hashlib.md5(payload + i.to_bytes(4, "big")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """image bytes → feature vector. mapInPandas: one Arrow batch in,
    one feature row out per image; raw bytes never leave the stage."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if _HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path: Image.open(BytesIO(b)) → resize → "
                    "normalize; enable when PIL is present")
            feats = [_fake_features(bytes(b)) for b in pdf["content"]]
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


def audio_features(df: DataFrame, n_windows: int = 4) -> DataFrame:
    """audio → fixed number of windowed feature vectors per clip
    (mel-spectrogram stand-in; window boundaries from duration_ms)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, widx, feats = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                step = max(len(payload) // n_windows, 1)
                for w in range(n_windows):
                    ids.append(mid)
                    widx.append(w)
                    feats.append(_fake_features(payload[w * step:(w + 1) * step]))
            yield pd.DataFrame({"media_id": ids, "window_idx": widx,
                                "features": feats})

    return df.where(F.col("kind") == "audio").mapInPandas(
        run, schema="media_id long, window_idx int, features array<double>")
