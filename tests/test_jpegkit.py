"""kernels/jpegkit — baseline JPEG decode (ITU-T T.81 public spec).

Reference parity note: the reference's PDF stack refuses DCT streams it
cannot decode (packages/firecrawl-rs/src/pdf.rs); this kernel goes
further for the multimodal operators and actually decodes the baseline
process, keeping typed refusals for progressive/arithmetic/CMYK.
"""
import struct

import numpy as np
import pytest

from webcrawl_spark.kernels.imagekit import UnsupportedImage
from webcrawl_spark.kernels.jpegkit import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(42)


def _gradient(h, w, k=1):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return ((x * 3 + y * 5) * k % 256).astype(np.uint8)


def _block_constant(h, w):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return ((x // 8 * 11 + y // 8 * 17) % 256).astype(np.uint8)


class TestRoundtrip:
    def test_grayscale_q1_smooth_is_near_lossless(self):
        img = _gradient(29, 37)
        w, h, lum = decode_jpeg(encode_jpeg(img, quant=1))
        assert (w, h) == (37, 29)
        assert np.abs(lum.astype(int) - img.astype(int)).max() <= 1

    def test_block_constant_exact_by_arithmetic(self):
        # DC-only blocks: quantize→IDCT roundtrip is exact, not approximate
        img = _block_constant(23, 41)
        for q in (1, 2, 5):
            _, _, lum = decode_jpeg(encode_jpeg(img, quant=q))
            np.testing.assert_array_equal(lum, img)

    def test_noisy_bounded_error(self):
        img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
        _, _, lum = decode_jpeg(encode_jpeg(img, quant=2))
        assert np.abs(lum.astype(int) - img.astype(int)).max() <= 3

    def test_color_444_luminance_matches(self):
        img = _block_constant(24, 40)
        cb = np.full_like(img, 90)
        cr = np.full_like(img, 150)
        _, _, lum = decode_jpeg(encode_jpeg(img, cb, cr))
        np.testing.assert_array_equal(lum, img)

    def test_color_420_subsampled_luminance_matches(self):
        # 4:2:0 exercises multi-block-per-MCU interleaving and the
        # MCU-major → raster Y-block mapping
        img = _block_constant(24, 40)
        cb = np.full_like(img, 90)
        cr = np.full_like(img, 150)
        _, _, lum = decode_jpeg(encode_jpeg(img, cb, cr, subsample=True))
        np.testing.assert_array_equal(lum, img)

    def test_restart_intervals(self):
        img = _block_constant(33, 57)
        _, _, lum = decode_jpeg(encode_jpeg(img, restart_interval=2))
        np.testing.assert_array_equal(lum, img)
        cb = np.full_like(img, 64)
        cr = np.full_like(img, 192)
        _, _, lum2 = decode_jpeg(encode_jpeg(
            img, cb, cr, subsample=True, restart_interval=1))
        np.testing.assert_array_equal(lum2, img)

    @pytest.mark.parametrize("h,w", [(1, 1), (7, 9), (8, 8), (17, 8),
                                     (15, 31)])
    def test_odd_dimensions_cropped(self, h, w):
        img = _gradient(h, w, k=7)
        ww, hh, lum = decode_jpeg(encode_jpeg(img, quant=1))
        assert (ww, hh) == (w, h)
        assert lum.shape == (h, w)
        assert np.abs(lum.astype(int) - img.astype(int)).max() <= 1

    def test_stuffed_ff_bytes_survive(self):
        # images with many max-value runs tend to produce 0xFF entropy
        # bytes → exercises FF00 stuffing on both sides
        img = np.full((16, 16), 255, dtype=np.uint8)
        img[::2, ::2] = 0
        _, _, lum = decode_jpeg(encode_jpeg(img, quant=1))
        assert np.abs(lum.astype(int) - img.astype(int)).max() <= 1


class TestProgressive:
    """SOF2: spectral selection + successive approximation must decode
    bit-identically to the baseline path on the same coefficients."""

    @pytest.mark.parametrize("al", [0, 1, 2])
    def test_grayscale_matches_baseline(self, al):
        from webcrawl_spark.kernels.jpegkit import encode_jpeg_progressive

        img = _gradient(29, 37)
        base = decode_jpeg(encode_jpeg(img, quant=2))[2]
        prog = decode_jpeg(encode_jpeg_progressive(img, quant=2, al=al))[2]
        np.testing.assert_array_equal(prog, base)

    def test_noisy_matches_baseline(self):
        from webcrawl_spark.kernels.jpegkit import encode_jpeg_progressive

        img = RNG.integers(0, 256, (24, 31), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quant=2))[2]
        prog = decode_jpeg(encode_jpeg_progressive(img, quant=2, al=1))[2]
        np.testing.assert_array_equal(prog, base)

    @pytest.mark.parametrize("subsample", [False, True])
    def test_color_matches_baseline(self, subsample):
        from webcrawl_spark.kernels.jpegkit import encode_jpeg_progressive

        img = _block_constant(24, 40)
        cb = np.full_like(img, 90)
        cr = np.full_like(img, 150)
        base = decode_jpeg(encode_jpeg(img, cb, cr,
                                       subsample=subsample))[2]
        prog = decode_jpeg(encode_jpeg_progressive(
            img, cb, cr, subsample=subsample, al=2))[2]
        np.testing.assert_array_equal(prog, base)
        np.testing.assert_array_equal(prog, img)  # block-constant → exact

    def test_sof2_without_scan_is_value_error(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8\xff\xc2\x00\x08\x08\x00\x10\x00\x10\x00"
                        b"\xff\xd9")


class TestRefusals:
    @pytest.mark.parametrize("sof", [0xC3, 0xC9, 0xCB, 0xCF])
    def test_other_processes(self, sof):
        data = b"\xff\xd8" + bytes([0xFF, sof]) + struct.pack(">H", 8) \
            + b"\x08\x00\x10\x00\x10\x00"
        with pytest.raises(UnsupportedImage) as e:
            decode_jpeg(data)
        assert e.value.fmt == "jpeg"

    def test_12bit_precision(self):
        body = struct.pack(">BHHB", 12, 16, 16, 1) + b"\x01\x11\x00"
        data = b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
        with pytest.raises(UnsupportedImage):
            decode_jpeg(data)

    def test_cmyk_refused(self):
        body = struct.pack(">BHHB", 8, 16, 16, 4)
        for cid in range(1, 5):
            body += struct.pack(">BBB", cid, 0x11, 0)
        data = b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
        with pytest.raises(UnsupportedImage) as e:
            decode_jpeg(data)
        assert "CMYK" in e.value.why

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"GIF89a not a jpeg")

    def test_truncated_entropy_stream(self):
        img = _gradient(16, 16)
        data = encode_jpeg(img, quant=1)
        with pytest.raises(ValueError):
            decode_jpeg(data[:len(data) // 2])

    def test_missing_scan(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9")


class TestResizeIntegration:
    def test_resize_consumes_jpeg(self, spark):
        from webcrawl_spark.operators.multimodal import resize_images

        img = _block_constant(64, 96)
        df = spark.createDataFrame(
            [("j0", bytearray(encode_jpeg(img)))],
            "media_id string, payload binary")
        r = resize_images(df, max_w=32, max_h=32, fake=False).collect()[0]
        assert (r["width"], r["height"]) == (32, 21)
        assert r["resized"][:8] == b"\x89PNG\r\n\x1a\n"


class TestBombGuard:
    def test_huge_declared_dims_refuse_before_alloc(self):
        body = struct.pack(">BHHB", 8, 65500, 65500, 1) + b"\x01\x11\x00"
        data = b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(body)) + body
        with pytest.raises(UnsupportedImage, match="decode cap"):
            decode_jpeg(data)
