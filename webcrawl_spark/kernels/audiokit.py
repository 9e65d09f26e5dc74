"""Pure-stdlib audio decode for the multimodal operators.

WAV (RIFF PCM — the one container whose payload needs no entropy codec)
decodes fully with struct + numpy: sample rate, channel count, sample
count, and a mono-mixed int-domain amplitude histogram feature. Formats
needing codecs outside the stdlib (MP3/OGG/FLAC/AAC) refuse via the
same typed ``UnsupportedImage``-style exception as the image kernel —
``UnsupportedAudio`` — so callers classify instead of crash.

PCM support: 8-bit unsigned, 16/32-bit signed little-endian, any
channel count. All depths are normalized into one canonical signed
16-bit integer domain ([-32768, 32767]; 8-bit ← s*256, 32-bit ← s>>16)
BEFORE the mono mix, so the downstream amplitude-histogram feature is
pure integer math an oracle can recompute exactly regardless of source
depth. 24-bit and float WAVs refuse cleanly (rare on the web,
ambiguous normalization).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedAudio",
    "decode_wav",
    "decode_audio",
    "encode_wav",
    "audio_feature_from_samples",
    "N_AUDIO_BINS",
]

N_AUDIO_BINS = 8


class UnsupportedAudio(ValueError):
    def __init__(self, fmt: str, why: str):
        super().__init__(f"{fmt}: {why}")
        self.fmt = fmt
        self.why = why


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (sample_rate, n_samples, mono int64 samples in the canonical
    signed-16-bit domain). Walks RIFF chunks (fmt then data; extra chunks
    like LIST skipped by size)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE header")
    pos = 12
    rate = channels = bits = audio_fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)           # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            payload = body
    if rate is None or payload is None:
        raise ValueError("WAV: missing fmt or data chunk")
    if rate == 0:
        raise ValueError("WAV: zero sample rate")
    if audio_fmt != 1:                         # 1 = PCM; 3 = float, etc.
        raise UnsupportedAudio("wav", f"non-PCM format tag {audio_fmt}")
    if bits == 8:
        samples = (np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                   - 128) * 256
    elif bits == 16:
        samples = np.frombuffer(
            payload[:len(payload) // 2 * 2], dtype="<i2").astype(np.int64)
    elif bits == 32:
        samples = np.frombuffer(
            payload[:len(payload) // 4 * 4], dtype="<i4").astype(np.int64) \
            >> 16                                    # arithmetic = floor
    else:
        raise UnsupportedAudio("wav", f"{bits}-bit PCM")
    if channels > 1:
        n = len(samples) // channels
        samples = samples[:n * channels].reshape(n, channels)
        samples = samples.sum(axis=1) // channels    # integer mono mix
    return rate, len(samples), samples


def audio_feature_from_samples(samples: np.ndarray) -> np.ndarray:
    """8-bin amplitude histogram over the canonical 16-bit domain,
    normalized by sample count — bin = (s + 32768) // 8192, all-integer
    edges so an oracle can recompute per-bin COUNTS exactly."""
    bins = (samples + 32768) // (65536 // N_AUDIO_BINS)
    hist = np.bincount(np.clip(bins, 0, N_AUDIO_BINS - 1),
                       minlength=N_AUDIO_BINS)[:N_AUDIO_BINS]
    return (hist / max(1, samples.size)).astype("float32")


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16,
               channels: int = 1) -> bytes:
    """Minimal PCM WAV writer (test/datagen helper)."""
    dt = {8: np.uint8, 16: "<i2", 32: "<i4"}[bits]
    raw = (samples.astype(np.int64) + (128 if bits == 8 else 0)) \
        .astype(dt).tobytes()
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block,
                      bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


def decode_audio(data: bytes) -> tuple[str, int, int, np.ndarray]:
    """Sniff + decode → (format, sample_rate, n_samples, mono samples).
    MP3/OGG/FLAC/M4A refuse via UnsupportedAudio; unknown bytes raise
    ValueError."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        rate, n, samples = decode_wav(data)
        return "wav", rate, n, samples
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3",
                                          b"\xff\xf2"):
        raise UnsupportedAudio("mp3", "MPEG audio codec not in stdlib")
    if data[:4] == b"OggS":
        raise UnsupportedAudio("ogg", "Vorbis/Opus codec not in stdlib")
    if data[:4] == b"fLaC":
        raise UnsupportedAudio("flac", "FLAC codec not in stdlib")
    if data[4:8] == b"ftyp":
        raise UnsupportedAudio("m4a", "AAC codec not in stdlib")
    raise ValueError("not a recognized audio format")
