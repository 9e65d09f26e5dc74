"""Bloom-filter shards for the URL-seen set (north rule: one filter shard
per host-hash partition, merged via treeAggregate).

Role at scale: the frontier's dedup is *exact* (left anti-join against the
seen table); the Bloom shard is the cheap pre-filter that lets the engine
drop the (dominant) already-seen candidates before they reach the shuffle
join — at 10^10 URLs the seen table is ~TBs while all Bloom shards together
are a few GB (1% FP at 10 bits/key), so probing host-local shards inside an
Arrow UDF avoids shuffling candidates that are certainly duplicates. The
definitely-new survivors (plus FPs) go through the exact anti-join.

Keys are 64-bit url hashes (xxhash64 of the dedup key, computed JVM-side);
probe positions derive from a splitmix64 remix, all vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["BloomShard", "bits_for", "optimal_k"]

_SPLITMIX_1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = np.uint64(0x94D049BB133111EB)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives an independent second hash stream."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= _SPLITMIX_1
        h ^= h >> np.uint64(27)
        h *= _SPLITMIX_2
        h ^= h >> np.uint64(31)
    return h


def bits_for(n_keys: int, fp_rate: float = 0.01) -> int:
    """Optimal bit count, rounded up to a byte multiple (min 64 bits)."""
    if n_keys <= 0:
        return 64
    m = int(np.ceil(-n_keys * np.log(fp_rate) / (np.log(2) ** 2)))
    return max(64, (m + 7) // 8 * 8)


def optimal_k(m_bits: int, n_keys: int) -> int:
    if n_keys <= 0:
        return 1
    return max(1, min(16, round(m_bits / n_keys * np.log(2))))


class BloomShard:
    __slots__ = ("bits", "m", "k")

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = (
            bits if bits is not None else np.zeros(self.m // 8, dtype=np.uint8)
        )

    @classmethod
    def build(cls, hashes: np.ndarray, m_bits: int, k: int) -> "BloomShard":
        shard = cls(m_bits, k)
        shard.add(hashes)
        return shard

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing: h1 + i*h2 mod m."""
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = _mix(h1) | np.uint64(1)  # odd increment
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe → bool array ('maybe seen')."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes))
        byte = self.bits[pos >> 3]
        bit = (byte >> (pos & 7).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def merge(self, other: "BloomShard") -> "BloomShard":
        """In-place union (the treeAggregate combiner)."""
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    # --- (de)serialization for parquet/broadcast ------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.k], dtype=np.int64).tobytes()
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomShard":
        m, k = np.frombuffer(blob[:16], dtype=np.int64)
        bits = np.frombuffer(blob[16:], dtype=np.uint8).copy()
        return cls(int(m), int(k), bits)


def merge_blobs(blobs: list[bytes]) -> bytes:
    """Reduce serialized shards (used by the treeAggregate-style merge)."""
    assert blobs
    acc = BloomShard.from_bytes(blobs[0])
    for b in blobs[1:]:
        acc.merge(BloomShard.from_bytes(b))
    return acc.to_bytes()
