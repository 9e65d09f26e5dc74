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
    "AUDIO_META_SCHEMA",
    "RESIZE_SCHEMA",
    "image_features",
    "audio_features",
    "resize_images",
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


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_audio_real(payload: bytes):
    raise NotImplementedError(
        "audio decode requires an audio library (soundfile/torchaudio) not "
        "present in this runtime; run with fake=True for the plumbing path"
    )


def _decode_audio_fake(payload: bytes) -> tuple[int, int, float, np.ndarray]:
    """Deterministic fake decode: sample rate picked by payload CRC,
    sample count from byte length (16-bit mono), 8-dim 'feature' from the
    byte histogram."""
    crc = zlib.crc32(payload or b"")
    rate = (8000, 16000, 22050, 44100)[crc & 3]
    n_samples = max(1, len(payload or b"") // 2)
    arr = np.frombuffer((payload or b"\0")[:4096], dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    feature = (hist / max(1, len(arr))).astype("float32")
    return rate, n_samples, n_samples / rate, feature


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Audio decode + feature-extract twin of image_features: mapInPandas,
    binary column never shuffles, bounded output batches."""
    decode = _decode_audio_fake if fake else _decode_audio_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_META_SCHEMA]
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                rate, n, dur, feature = decode(raw)
                out_rows.append((str(media_id), rate, n, dur, len(raw),
                                 feature.tolist()))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=cols)
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_META_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("scale", T.DoubleType()),
    T.StructField("resized", T.BinaryType()),
])


def _resize_image_real(payload: bytes, max_w: int, max_h: int):
    raise NotImplementedError(
        "image resize requires an imaging library (PIL/opencv) not present "
        "in this runtime; run with fake=True for the plumbing path"
    )


def _resize_image_fake(payload: bytes, max_w: int,
                       max_h: int) -> tuple[int, int, float, bytes]:
    """Deterministic fake resize: source dims from the fake decode,
    aspect-preserving fit into (max_w, max_h) — never upscale — and a
    'resized' payload whose size shrinks with the area ratio (the byte
    budget a real re-encode would roughly follow)."""
    w, h, _, _ = _decode_image_fake(payload)
    scale = min(1.0, max_w / w, max_h / h)
    out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
    body = payload or b"\0"
    resized = body[:max(1, int(len(body) * scale * scale))]
    return out_w, out_h, scale, resized


def resize_images(
    df: DataFrame,
    max_w: int = 512,
    max_h: int = 512,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Aspect-preserving bounded-box resize over binary payloads —
    mapInPandas with bounded output batches (resized binaries dominate
    memory); the inner per-payload function is the only piece a real
    imaging library replaces."""
    resize = _resize_image_fake if fake else _resize_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZE_SCHEMA]
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                w, h, scale, resized = resize(raw, max_w, max_h)
                out_rows.append((str(media_id), w, h, scale, resized))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=cols)
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


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
