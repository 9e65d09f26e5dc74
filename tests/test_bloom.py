"""Bloom shard structure: no false negatives, bounded false positives,
merge = union, serialization round-trip."""

import numpy as np

from webcrawl_spark.frontier.bloom import BloomShard, bits_for, merge_blobs, optimal_k


def test_no_false_negatives():
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 2**63, size=10_000).astype(np.uint64)
    m = bits_for(10_000, 0.01)
    shard = BloomShard.build(keys, m, optimal_k(m, 10_000))
    assert shard.contains(keys).all()


def test_false_positive_rate_bounded():
    rng = np.random.RandomState(2)
    keys = rng.randint(0, 2**63, size=10_000).astype(np.uint64)
    other = rng.randint(0, 2**63, size=20_000).astype(np.uint64)
    other = np.setdiff1d(other, keys)
    m = bits_for(10_000, 0.01)
    shard = BloomShard.build(keys, m, optimal_k(m, 10_000))
    fp = shard.contains(other).mean()
    assert fp < 0.03  # 3× headroom over the 1% design point


def test_merge_is_union():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 2**63, size=1000).astype(np.uint64)
    b = rng.randint(0, 2**63, size=1000).astype(np.uint64)
    m = bits_for(2000, 0.01)
    k = optimal_k(m, 2000)
    sa = BloomShard.build(a, m, k)
    sb = BloomShard.build(b, m, k)
    merged = BloomShard.from_bytes(
        merge_blobs([sa.to_bytes(), sb.to_bytes()])
    )
    assert merged.contains(a).all() and merged.contains(b).all()


def test_serialization_roundtrip():
    rng = np.random.RandomState(4)
    keys = rng.randint(0, 2**63, size=100).astype(np.uint64)
    m = bits_for(100, 0.01)
    shard = BloomShard.build(keys, m, optimal_k(m, 100))
    back = BloomShard.from_bytes(shard.to_bytes())
    assert back.m == shard.m and back.k == shard.k
    assert (back.bits == shard.bits).all()
    assert back.contains(keys).all()


def test_empty_shard():
    shard = BloomShard(64, 2)
    assert not shard.contains(np.array([1, 2, 3], dtype=np.uint64)).any()
