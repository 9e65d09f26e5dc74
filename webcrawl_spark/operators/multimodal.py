"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via mapInPandas in bounded Arrow
batches.

IMAGE decode is REAL for PNG, GIF (kernels/imagekit.py — stdlib zlib +
the same predictor math the PDF kernel uses) and JPEG, baseline AND
progressive (kernels/jpegkit.py — full Huffman entropy decode + IDCT):
dimensions, format, and an 8-bin luminance-histogram feature from
actual decoded pixels. Formats whose codecs aren't implementable from
the stdlib (WebP/AVIF, arithmetic JPEG) classify as
``unsupported:<fmt>`` with null dims — a clean refusal
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
    "DHASH_SCHEMA",
    "image_features",
    "audio_features",
    "video_metadata",
    "resize_images",
    "frame_sample_plan",
    "dhash_from_luminance",
    "image_dhash",
    "dhash_near_dup_pairs",
    "ahash_from_samples",
    "audio_ahash",
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


DHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("b0", T.IntegerType()),
    T.StructField("b1", T.IntegerType()),
    T.StructField("b2", T.IntegerType()),
    T.StructField("b3", T.IntegerType()),
])


def dhash_from_luminance(lum: np.ndarray,
                         grid: int = 8) -> tuple[int, int, int, int]:
    """Difference hash (dHash) of a decoded luminance grid, as four 16-bit
    bands — INTEGER-exact end to end, so an oracle can recompute it.

    The image is partitioned into grid×(grid+1) area blocks by the
    standard floor map (pixel (x,y) → block (y*grid//H, x*(grid+1)//W));
    bit (r,c) is set iff block (r,c) is strictly brighter than block
    (r,c+1), compared by integer cross-multiplication of block sums and
    pixel counts (sum_l * n_r > sum_r * n_l) — no float averaging, no
    rounding. Band b holds rows 2b and 2b+1 (bit position
    (r%2)*grid + c), giving four 16-bit ints that double as the LSH band
    keys for near-dup grouping."""
    h, w = lum.shape
    if h < 1 or w < 2:
        raise ValueError("dhash needs at least a 1x2 image")
    cols = grid + 1
    r_idx = (np.arange(h) * grid) // h
    c_idx = (np.arange(w) * cols) // w
    lum64 = lum.astype(np.int64)
    sums = np.zeros((grid, cols), dtype=np.int64)
    cnts = np.zeros((grid, cols), dtype=np.int64)
    np.add.at(sums, (r_idx[:, None], c_idx[None, :]), lum64)
    np.add.at(cnts, (r_idx[:, None], c_idx[None, :]),
              np.ones((h, w), dtype=np.int64))
    # images narrower/shorter than the grid leave empty blocks; treat an
    # empty block as brightness 0 (cnt 1) so the comparison stays total
    cnts = np.maximum(cnts, 1)
    left, right = sums[:, :-1], sums[:, 1:]
    nl, nr = cnts[:, :-1], cnts[:, 1:]
    bits = (left * nr) > (right * nl)          # (grid, grid) bools
    bands = []
    for b in range(4):
        v = 0
        for rr in range(2):
            for c in range(grid):
                if bits[2 * b + rr, c]:
                    v |= 1 << (rr * grid + c)
        bands.append(int(v))
    return bands[0], bands[1], bands[2], bands[3]


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Perceptual hash per image: decode (real PNG/GIF path) → dHash bands.
    Same mapInPandas shape as image_features — the binary column never
    shuffles; only (id, format, 4×int16-band) rows leave the scan stage.
    Undecodable rows classify (``unsupported:<fmt>`` / ``error``) with
    null bands."""
    from ..kernels.imagekit import UnsupportedImage, decode_image

    def decode_lum(raw: bytes) -> tuple[str, np.ndarray]:
        if fake:
            crc = zlib.crc32(raw or b"")
            rng = np.random.RandomState(crc & 0x7FFFFFFF)
            return "png", rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
        _, _, fmt, lum = decode_image(raw)
        return fmt, lum

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    fmt, lum = decode_lum(raw)
                    b0, b1, b2, b3 = dhash_from_luminance(lum)
                except UnsupportedImage as u:
                    fmt, b0, b1, b2, b3 = f"unsupported:{u.fmt}", \
                        None, None, None, None
                except Exception:
                    fmt, b0, b1, b2, b3 = "error", None, None, None, None
                out_rows.append((str(media_id), fmt, b0, b1, b2, b3))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=[
                        f.name for f in DHASH_SCHEMA])
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[
                    f.name for f in DHASH_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, DHASH_SCHEMA)


def dhash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 10,
                         id_col: str = "media_id") -> DataFrame:
    """Near-duplicate image pairs from dHash bands: banded pigeonhole LSH.
    Candidates come from four band-equality self-joins (hash joins on
    small int keys — never all-pairs) and are verified by the exact
    Hamming distance (bit_count of the four XORs, all JVM-side). A pair
    with Hamming ≤ 3 is GUARANTEED a clean shared band (4 bands can't all
    be hit by 3 flips); beyond that recall is the standard banding
    trade-off — flips spread over ≥4 distinct bands make a pair
    invisible, increasingly unlikely for genuinely near-duplicate images
    whose differing bits cluster in the edited region. Returns
    (id_a, id_b, hamming) with hamming ≤ max_hamming."""
    good = hashes.filter(F.col("b0").isNotNull()) \
        .select(F.col(id_col).alias("_id"), "b0", "b1", "b2", "b3")
    l, r = good.alias("l"), good.alias("r")
    cand = None
    for b in ("b0", "b1", "b2", "b3"):
        pairs = l.join(r, (F.col(f"l.{b}") == F.col(f"r.{b}"))
                       & (F.col("l._id") < F.col("r._id")))
        sel = pairs.select(F.col("l._id").alias("id_a"),
                           F.col("r._id").alias("id_b"))
        cand = sel if cand is None else cand.unionByName(sel)
    cand = cand.distinct()
    la = good.select(F.col("_id").alias("id_a"),
                     *[F.col(b).alias(f"{b}_a") for b in
                       ("b0", "b1", "b2", "b3")])
    rb = good.select(F.col("_id").alias("id_b"),
                     *[F.col(b).alias(f"{b}_b") for b in
                       ("b0", "b1", "b2", "b3")])
    ham = sum(F.bit_count(F.col(f"{b}_a").bitwiseXOR(F.col(f"{b}_b")))
              for b in ("b0", "b1", "b2", "b3"))
    return (
        cand.join(la, "id_a").join(rb, "id_b")
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def ahash_from_samples(samples: np.ndarray,
                       grid: int = 64) -> tuple[int, int, int, int]:
    """Loudness-contour hash: the 1-D dHash twin for audio. The decoded
    (canonical 16-bit) sample stream is partitioned into grid+1 area
    blocks by the floor map (sample t → block t*(grid+1)//n); bit j is
    set iff block j is strictly louder than block j+1, compared by integer
    cross-multiplication of per-block |amplitude| sums and counts — exact,
    recomputable by any engine. Returns four 16-bit bands (bit j → band
    j//16), the same shape dhash_near_dup_pairs consumes."""
    n = len(samples)
    if n < 2:
        raise ValueError("ahash needs at least 2 samples")
    cols = grid + 1
    k = (np.arange(n, dtype=np.int64) * cols) // n
    mag = np.abs(samples.astype(np.int64))
    sums = np.zeros(cols, dtype=np.int64)
    cnts = np.zeros(cols, dtype=np.int64)
    np.add.at(sums, k, mag)
    np.add.at(cnts, k, 1)
    cnts = np.maximum(cnts, 1)
    bits = (sums[:-1] * cnts[1:]) > (sums[1:] * cnts[:-1])
    bands = [0, 0, 0, 0]
    for j in range(grid):
        if bits[j]:
            bands[j // 16] |= 1 << (j % 16)
    return bands[0], bands[1], bands[2], bands[3]


def audio_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    batch_rows: int = 64,
) -> DataFrame:
    """Perceptual hash per audio clip: real WAV decode → loudness-contour
    bands. Same mapInPandas/classify shape as audio_features; feed the
    output to dhash_near_dup_pairs for banded near-dup grouping."""
    from ..kernels.audiokit import UnsupportedAudio, decode_audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    fmt, _, _, samples = decode_audio(raw)
                    b0, b1, b2, b3 = ahash_from_samples(samples)
                except UnsupportedAudio as u:
                    fmt, b0, b1, b2, b3 = f"unsupported:{u.fmt}", \
                        None, None, None, None
                except Exception:
                    fmt, b0, b1, b2, b3 = "error", None, None, None, None
                out_rows.append((str(media_id), fmt, b0, b1, b2, b3))
                if len(out_rows) >= batch_rows:
                    yield pd.DataFrame(out_rows, columns=[
                        f.name for f in DHASH_SCHEMA])
                    out_rows = []
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[
                    f.name for f in DHASH_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, DHASH_SCHEMA)
