"""Image dHash: integer-exact difference hash over the real PNG decode,
banded near-dup pairing, numpy-reference parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawl_spark.kernels.imagekit import encode_png
from webcrawl_spark.operators.multimodal import (
    dhash_from_luminance,
    dhash_near_dup_pairs,
    image_dhash,
)


def _ref_dhash(lum: np.ndarray, grid: int = 8):
    """Independent scalar-loop reference of the documented definition."""
    h, w = lum.shape
    cols = grid + 1
    sums = np.zeros((grid, cols), dtype=np.int64)
    cnts = np.zeros((grid, cols), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            sums[(y * grid) // h, (x * cols) // w] += int(lum[y, x])
            cnts[(y * grid) // h, (x * cols) // w] += 1
    cnts = np.maximum(cnts, 1)
    bands = [0, 0, 0, 0]
    for r in range(grid):
        for c in range(grid):
            if sums[r, c] * cnts[r, c + 1] > sums[r, c + 1] * cnts[r, c]:
                bands[r // 2] |= 1 << ((r % 2) * grid + c)
    return tuple(bands)


class TestDhashFromLuminance:
    def test_matches_scalar_reference(self):
        rng = np.random.RandomState(4)
        for h, w in [(8, 9), (16, 16), (5, 7), (31, 20), (1, 2), (64, 48)]:
            lum = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
            assert dhash_from_luminance(lum) == _ref_dhash(lum)

    def test_flat_image_hashes_to_zero(self):
        lum = np.full((16, 18), 77, dtype=np.uint8)
        assert dhash_from_luminance(lum) == (0, 0, 0, 0)

    def test_left_right_gradient_sets_all_bits(self):
        # strictly decreasing brightness left→right: every comparison fires
        lum = np.tile(np.arange(18, 0, -1, dtype=np.uint8) * 10, (16, 1))
        assert dhash_from_luminance(lum) == (0xFFFF,) * 4

    def test_scale_invariance(self):
        # dHash's point: the same picture at 2x resolution hashes the same
        rng = np.random.RandomState(9)
        small = rng.randint(0, 256, size=(16, 18), dtype=np.uint8)
        big = np.kron(small, np.ones((2, 2), dtype=np.uint8))
        assert dhash_from_luminance(small) == dhash_from_luminance(big)

    def test_rejects_degenerate(self):
        with pytest.raises(ValueError):
            dhash_from_luminance(np.zeros((1, 1), dtype=np.uint8))


class TestImageDhashSpark:
    def _images(self, spark):
        # 32x36 → every dhash block is exactly 4x4: block-level brightness
        # IS the hash input, so edits translate to exact bit flips
        rng = np.random.RandomState(7)
        blocks = (rng.permutation(72).reshape(8, 9) * 3).astype(np.int64)
        base = np.kron(blocks, np.ones((4, 4))).astype(np.uint8)
        near_blocks = blocks.copy()
        # edit only edge-column blocks — (r,0) feeds bit (r,0) alone and
        # (r,8) feeds bit (r,7) alone — so exactly two bits flip
        near_blocks[0, 0] = blocks[0, 1] + 30 \
            if blocks[0, 0] <= blocks[0, 1] else max(blocks[0, 1] - 30, 0)
        near_blocks[7, 8] = max(blocks[7, 7] - 30, 0) \
            if blocks[7, 8] >= blocks[7, 7] else blocks[7, 7] + 30
        near = np.kron(near_blocks, np.ones((4, 4))).astype(np.uint8)
        far = np.kron(rng.permutation(72).reshape(8, 9).astype(np.uint8) * 3
                      + 1, np.ones((4, 4), dtype=np.uint8))
        rows = [
            ("base", bytearray(encode_png(base))),
            ("near", bytearray(encode_png(near))),
            ("far", bytearray(encode_png(far))),
            ("bad", bytearray(b"JUNKJUNKJUNK")),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        return df, base, near, far

    def test_hashes_match_direct_decode(self, spark):
        df, base, near, far = self._images(spark)
        got = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
               for r in image_dhash(df).collect()}
        assert got["base"] == dhash_from_luminance(base)
        assert got["near"] == dhash_from_luminance(near)
        assert got["far"] == dhash_from_luminance(far)
        assert got["bad"] == (None, None, None, None)

    def test_near_dup_pairs(self, spark):
        df, base, near, far = self._images(spark)
        hb, hn = dhash_from_luminance(base), dhash_from_luminance(near)
        expect = sum(bin(a ^ b).count("1") for a, b in zip(hb, hn))
        assert 1 <= expect <= 3   # the fixture flips edge-column bits only
        hashes = image_dhash(df)
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in dhash_near_dup_pairs(hashes,
                                               max_hamming=12).collect()}
        assert pairs[("base", "near")] == expect
        assert ("base", "far") not in pairs

    def test_identical_images_hamming_zero(self, spark):
        df, base, _, _ = self._images(spark)
        twin = spark.createDataFrame(
            [("copy", bytearray(encode_png(base)))],
            "media_id string, payload binary")
        pairs = dhash_near_dup_pairs(image_dhash(df.unionByName(twin)),
                                     max_hamming=0).collect()
        assert {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs} \
            == {("base", "copy", 0)}

    def test_band_join_is_keyed_not_cartesian(self, spark):
        df, *_ = self._images(spark)
        plan = dhash_near_dup_pairs(image_dhash(df)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan
        assert "CartesianProduct" not in plan


class TestAudioAhash:
    def test_matches_scalar_reference(self):
        from webcrawl_spark.operators.multimodal import ahash_from_samples

        rng = np.random.RandomState(3)
        for n in (130, 801, 4097):
            s = rng.randint(-32768, 32768, size=n).astype(np.int64)
            cols = 65
            sums = np.zeros(cols, dtype=np.int64)
            cnts = np.zeros(cols, dtype=np.int64)
            for t in range(n):
                k = (t * cols) // n
                sums[k] += abs(int(s[t]))
                cnts[k] += 1
            cnts = np.maximum(cnts, 1)
            bands = [0, 0, 0, 0]
            for j in range(64):
                if sums[j] * cnts[j + 1] > sums[j + 1] * cnts[j]:
                    bands[j // 16] |= 1 << (j % 16)
            assert ahash_from_samples(s) == tuple(bands)

    def test_time_stretch_invariance(self):
        from webcrawl_spark.operators.multimodal import ahash_from_samples

        rng = np.random.RandomState(8)
        s = rng.randint(-32768, 32768, size=650).astype(np.int64)
        assert ahash_from_samples(s) == ahash_from_samples(np.repeat(s, 3))

    def test_spark_path_and_pairing(self, spark):
        from webcrawl_spark.kernels.audiokit import encode_wav
        from webcrawl_spark.operators.multimodal import (
            audio_ahash, dhash_near_dup_pairs,
        )

        rng = np.random.RandomState(5)
        base = rng.randint(-30000, 30000, size=1601).astype(np.int64)
        quiet = base // 2                 # same contour, half the volume
        other = rng.randint(-30000, 30000, size=1601).astype(np.int64)
        rows = [
            ("base", bytearray(encode_wav(base, 8000))),
            ("quiet", bytearray(encode_wav(quiet, 8000))),
            ("other", bytearray(encode_wav(other, 8000))),
            ("junk", bytearray(b"not audio")),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        hashes = audio_ahash(df)
        got = {r["media_id"]: (r["format"], r["b0"]) for r in hashes.collect()}
        assert got["junk"][0] == "error" and got["junk"][1] is None
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in dhash_near_dup_pairs(hashes,
                                               max_hamming=8).collect()}
        assert ("base", "quiet") in pairs and pairs[("base", "quiet")] <= 8
        assert ("base", "other") not in pairs
