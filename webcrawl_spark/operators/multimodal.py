"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via mapInPandas in bounded Arrow
batches.

The decode step is STUBBED (no image/audio libraries in this runtime):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, which substitutes a deterministic fake decoder so the
Spark-side plumbing — schema, batch shape, partitioning, UDF signatures —
is real and tested end-to-end. Swapping in PIL/torchaudio later only
replaces the inner ``_decode_*_real`` functions.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "IMAGE_META_SCHEMA",
    "decode_image_batch",
    "image_features",
    "frame_sample_plan",
]

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_image_real(payload: bytes):
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/opencv) not present "
        "in this runtime; run with fake=True for the plumbing path"
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, str, np.ndarray]:
    """Deterministic fake decode: dimensions/format derived from a CRC of
    the payload; 8-dim 'feature' from payload byte histogram."""
    crc = zlib.crc32(payload or b"")
    width = 64 + (crc & 0x3FF)
    height = 64 + ((crc >> 10) & 0x3FF)
    fmt = ("png", "jpeg", "webp", "gif")[crc & 3]
    arr = np.frombuffer((payload or b"\0")[:4096], dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    feature = (hist / max(1, len(arr))).astype("float32")
    return width, height, fmt, feature


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode + feature-extract over binary payloads. mapInPandas keeps the
    large binary column out of any shuffle: the plan is scan → project, with
    output batches bounded (binary payloads dominate memory)."""
    decode = _decode_image_fake if fake else _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                width, height, fmt, feature = decode(raw)
                out_rows.append((str(media_id), width, height, len(raw), fmt,
                                 feature.tolist()))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=[
                        f.name for f in IMAGE_META_SCHEMA])
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[
                    f.name for f in IMAGE_META_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample_plan(df: DataFrame, duration_col: str = "duration_s",
                      id_col: str = "media_id", fps: float = 0.5) -> DataFrame:
    """Video frame-sampling plan: explode (media_id, frame_ts) rows at the
    target sample rate — pure native expressions; the (stubbed) frame decode
    would consume this plan via image_features."""
    n_frames = F.greatest(
        F.floor(F.col(duration_col) * F.lit(fps)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        id_col, "frame_idx",
        (F.col("frame_idx") / F.lit(fps)).alias("frame_ts"),
    )
