"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via mapInPandas in bounded Arrow
batches.

IMAGE decode is REAL for PNG and GIF (kernels/imagekit.py — stdlib
zlib + the same predictor math the PDF kernel uses): dimensions, format,
and an 8-bin luminance-histogram feature from actual decoded pixels.
Formats whose entropy codecs aren't in the stdlib (JPEG/WebP/AVIF)
classify as ``unsupported:<fmt>`` with null dims — a clean refusal
(parity with the PDF engine's DCTDecode refusal), never silent garbage;
undecodable bytes classify as ``error``. AUDIO decode is REAL for WAV
(kernels/audiokit.py — RIFF PCM 8/16/32-bit, any channel count,
normalized to a canonical 16-bit domain): sample rate, count, duration,
and an 8-bin amplitude-histogram feature from actual decoded samples.
Entropy-coded audio (MP3/OGG/FLAC/M4A) classifies as
``unsupported:<fmt>`` — swapping in torchaudio later only replaces
``_decode_audio_real``. A ``fake=True`` escape exists for both
modalities (plumbing tests predate the real decoders and still exercise
the batching contract with arbitrary bytes).
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
    "VIDEO_META_SCHEMA",
    "image_features",
    "audio_features",
    "video_metadata",
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


N_FEATURE_BINS = 8


def image_feature_from_luminance(lum: np.ndarray) -> np.ndarray:
    """8-bin histogram of decoded luminance, normalized by pixel count —
    integer bin edges (256/8) so an oracle can recompute it exactly."""
    hist = np.bincount((lum.ravel() // (256 // N_FEATURE_BINS)),
                       minlength=N_FEATURE_BINS)[:N_FEATURE_BINS]
    return (hist / max(1, lum.size)).astype("float32")


def _decode_image_real(payload: bytes) -> tuple[int, int, str, np.ndarray]:
    """REAL decode via kernels/imagekit.py (stdlib PNG + GIF): dimensions,
    format, 8-bin luminance-histogram feature from decoded pixels.
    UnsupportedImage/ValueError propagate — image_features classifies."""
    from ..kernels.imagekit import decode_image

    width, height, fmt, lum = decode_image(payload)
    return width, height, fmt, image_feature_from_luminance(lum)


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

    from ..kernels.imagekit import UnsupportedImage

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    width, height, fmt, feature = decode(raw)
                    feature = feature.tolist()
                except UnsupportedImage as u:
                    width = height = feature = None
                    fmt = f"unsupported:{u.fmt}"
                except Exception:  # zlib/struct/Index… — classify, don't kill
                    width = height = feature = None
                    fmt = "error"
                out_rows.append((str(media_id), width, height, len(raw),
                                 fmt, feature))
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
    T.StructField("format", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_audio_real(
        payload: bytes) -> tuple[str, int, int, float, np.ndarray]:
    """REAL decode via kernels/audiokit.py (stdlib RIFF PCM WAV): sample
    rate/count/duration, 8-bin amplitude-histogram feature from decoded
    samples. UnsupportedAudio/ValueError propagate — audio_features
    classifies."""
    from ..kernels.audiokit import audio_feature_from_samples, decode_audio

    fmt, rate, n, samples = decode_audio(payload)
    return fmt, rate, n, n / rate, audio_feature_from_samples(samples)


def _decode_audio_fake(
        payload: bytes) -> tuple[str, int, int, float, np.ndarray]:
    """Deterministic fake decode: sample rate picked by payload CRC,
    sample count from byte length (16-bit mono), 8-dim 'feature' from the
    byte histogram."""
    crc = zlib.crc32(payload or b"")
    rate = (8000, 16000, 22050, 44100)[crc & 3]
    n_samples = max(1, len(payload or b"") // 2)
    arr = np.frombuffer((payload or b"\0")[:4096], dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    feature = (hist / max(1, len(arr))).astype("float32")
    return "wav", rate, n_samples, n_samples / rate, feature


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Audio decode + feature-extract twin of image_features: mapInPandas,
    binary column never shuffles, bounded output batches. Entropy-coded
    formats classify as ``unsupported:<fmt>``, undecodable bytes as
    ``error`` — same taxonomy as image_features."""
    decode = _decode_audio_fake if fake else _decode_audio_real

    from ..kernels.audiokit import UnsupportedAudio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_META_SCHEMA]
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    fmt, rate, n, dur, feature = decode(raw)
                    feature = feature.tolist()
                except UnsupportedAudio as u:
                    rate = n = dur = feature = None
                    fmt = f"unsupported:{u.fmt}"
                except Exception:  # struct/zero-rate/… — classify, don't kill
                    rate = n = dur = feature = None
                    fmt = "error"
                out_rows.append((str(media_id), rate, n, dur, len(raw),
                                 fmt, feature))
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


def _resize_image_real(payload: bytes, max_w: int,
                       max_h: int) -> tuple[int, int, float, bytes]:
    """REAL resize for PNG/GIF: decode (imagekit), aspect-preserving
    nearest-neighbor fit into (max_w, max_h) — never upscale — re-encoded
    as grayscale PNG (the stdlib-encodable target; luminance is what the
    downstream feature extractors consume)."""
    from ..kernels.imagekit import decode_image, encode_png

    w, h, _fmt, lum = decode_image(payload)
    scale = min(1.0, max_w / w, max_h / h)
    out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    return out_w, out_h, scale, encode_png(lum[np.ix_(ys, xs)])


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

    from ..kernels.imagekit import UnsupportedImage

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RESIZE_SCHEMA]
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, scale, resized = resize(raw, max_w, max_h)
                except Exception:  # incl. Unsupported — null row
                    w = h = scale = resized = None
                out_rows.append((str(media_id), w, h, scale, resized))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=cols)
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


VIDEO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("brand", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
])


def video_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    batch_rows: int = 64,
) -> DataFrame:
    """REAL video metadata via kernels/videokit.py (ISO BMFF box walk):
    duration, display dims, codec fourcc — the inputs frame_sample_plan
    consumes. WebM/AVI classify as ``unsupported:<fmt>``, garbage as
    ``error``; mapInPandas keeps the mdat payload out of any shuffle."""
    from ..kernels.videokit import UnsupportedVideo, probe_video

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_META_SCHEMA]
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    m = probe_video(raw)
                    row = (str(media_id), m["duration_s"], m["width"],
                           m["height"], m["codec"], m["brand"], len(raw),
                           m["format"])
                except UnsupportedVideo as u:
                    row = (str(media_id), None, None, None, None, None,
                           len(raw), f"unsupported:{u.fmt}")
                except Exception:  # struct/EBML overrun — classify
                    row = (str(media_id), None, None, None, None, None,
                           len(raw), "error")
                out_rows.append(row)
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=cols)
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        run, VIDEO_META_SCHEMA)


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
