"""Spark-compatible xxHash64.

The driver-side admission paths need the SAME host_bucket value Spark's
``F.xxhash64`` produces (frontier files are laid out by it), without
paying a Spark job for a few thousand driver rows. This is the public
XXH64 algorithm (Collet) with Spark's conventions: seed 42, little-endian
reads, and a SIGNED 64-bit result — bit-for-bit parity is gated by
tests/test_urlkit.py::TestXxh64 against ``F.xxhash64`` itself.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

__all__ = ["xxhash64", "spark_bucket"]


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _MASK, 31) * _P1) & _MASK


def _merge(hash_: int, acc: int) -> int:
    hash_ ^= _round(0, acc)
    return ((hash_ * _P1) + _P4) & _MASK


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 of ``data`` (str = UTF-8 bytes), returned as Spark's SIGNED
    64-bit value."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos:pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8:pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16:pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24:pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) \
            & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while pos + 8 <= n:
        k = _round(0, int.from_bytes(data[pos:pos + 8], "little"))
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _MASK
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos:pos + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_bucket(value: str, num_buckets: int) -> int:
    """``pmod(xxhash64(value), num_buckets)`` — the frontier's bucket
    assignment, driver-side."""
    return xxhash64(value) % num_buckets
