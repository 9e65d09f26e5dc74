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


class TestBucketSeenKeys:
    """The executor-side per-bucket exact key read (the seen-check's exact
    half): partition-pruned listing, incremental cache across rounds, and
    invalidation when a rollback removes round files."""

    def _write(self, root, rnd, bucket, urls):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = os.path.join(root, f"round={rnd}", f"host_bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"url": urls}),
                       os.path.join(d, f"part-{rnd}.parquet"))

    def test_incremental_and_invalidation(self, tmp_path):
        import shutil

        from webcrawl_spark.frontier.crawl import (
            _SEEN_KEY_CACHE, _bucket_seen_keys,
        )

        root = str(tmp_path / "frontier")
        self._write(root, 0, 3, ["a", "b"])
        assert set(_bucket_seen_keys(root, 3, 0, "url").to_pylist()) == {"a", "b"}
        # uncommitted round invisible
        self._write(root, 1, 3, ["c"])
        assert set(_bucket_seen_keys(root, 3, 0, "url").to_pylist()) == {"a", "b"}
        # committed → incremental delta read on the cached entry
        assert set(_bucket_seen_keys(root, 3, 1, "url").to_pylist()) == {"a", "b", "c"}
        assert (root, 3, "url") in _SEEN_KEY_CACHE
        # other bucket: nothing
        assert len(_bucket_seen_keys(root, 7, 1, "url")) == 0
        # rollback removes round 1 → cached paths lost → full re-read
        shutil.rmtree(f"{root}/round=1")
        assert set(_bucket_seen_keys(root, 3, 1, "url").to_pylist()) == {"a", "b"}

    def test_row_cap_skips_caching(self, tmp_path, monkeypatch):
        import webcrawl_spark.frontier.crawl as crawl_mod

        root = str(tmp_path / "frontier")
        self._write(root, 0, 0, [f"u{i}" for i in range(100)])
        monkeypatch.setattr(crawl_mod, "_SEEN_CACHE_MAX_ROWS", 10)
        crawl_mod._SEEN_KEY_CACHE.clear()
        got = crawl_mod._bucket_seen_keys(root, 0, 0, "url")
        assert len(got) == 100
        assert (root, 0, "url") not in crawl_mod._SEEN_KEY_CACHE

    def test_row_cap_enforced_on_incremental_append(self, tmp_path,
                                                    monkeypatch):
        """ADVICE r4: the cap must also bound the INCREMENTAL path — a
        worker with bucket affinity appending deltas round after round
        would otherwise grow its cached arrays past the cap forever."""
        import webcrawl_spark.frontier.crawl as crawl_mod

        root = str(tmp_path / "frontier")
        self._write(root, 0, 0, [f"u{i}" for i in range(8)])
        monkeypatch.setattr(crawl_mod, "_SEEN_CACHE_MAX_ROWS", 10)
        crawl_mod._SEEN_KEY_CACHE.clear()
        assert len(crawl_mod._bucket_seen_keys(root, 0, 0, "url")) == 8
        assert (root, 0, "url") in crawl_mod._SEEN_KEY_CACHE  # under cap
        # round 1 pushes the entry over the cap via the incremental path
        self._write(root, 1, 0, [f"v{i}" for i in range(8)])
        got = crawl_mod._bucket_seen_keys(root, 0, 1, "url")
        assert len(got) == 16  # result still exact
        assert (root, 0, "url") not in crawl_mod._SEEN_KEY_CACHE  # evicted
        crawl_mod._SEEN_KEY_CACHE.clear()
