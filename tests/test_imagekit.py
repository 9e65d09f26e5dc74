"""imagekit kernel: real stdlib PNG/GIF decode (r4 verdict #4) — filter
types, color types, palettes, GIF LZW + interlace, refusal taxonomy —
and the multimodal operators' fake=False path on real bytes."""

import struct
import zlib

import numpy as np
import pytest

from webcrawl_spark.kernels.imagekit import (
    PNG_SIG, UnsupportedImage, decode_gif, decode_image, decode_png,
    encode_gif, encode_png, luminance,
)

RNG = np.random.default_rng(1234)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _build_png(px: np.ndarray, color_type: int, filters: list[int],
               palette: np.ndarray | None = None,
               interlace: int = 0) -> bytes:
    """Hand-encoder applying a chosen PNG filter per row (the inverse of
    the kernel's unfilter), so every filter path is exercised."""
    h, w = px.shape[:2]
    nch = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * nch).astype(np.int16)
    bpp = nch
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int16)
    for y in range(h):
        row = flat[y].copy()
        ft = filters[y % len(filters)]
        enc = row.copy()
        if ft == 1:
            for j in range(w * nch - 1, bpp - 1, -1):
                enc[j] = (row[j] - row[j - bpp]) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            for j in range(w * nch):
                left = row[j - bpp] if j >= bpp else 0
                enc[j] = (row[j] - ((int(left) + int(prev[j])) >> 1)) % 256
        elif ft == 4:
            for j in range(w * nch):
                a = int(row[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                c = int(prev[j - bpp]) if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[j] = (row[j] - pr) % 256
        raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return (out + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


class TestPng:
    def test_gray_roundtrip(self):
        gray = RNG.integers(0, 256, (13, 17), dtype=np.uint8)
        w, h, lum = decode_png(encode_png(gray))
        assert (w, h) == (17, 13)
        assert np.array_equal(lum, gray)

    @pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                         [0, 1, 2, 3, 4]])
    def test_rgb_all_filters(self, filters):
        rgb = RNG.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        w, h, lum = decode_png(_build_png(rgb, 2, filters))
        assert (w, h) == (11, 9)
        assert np.array_equal(lum, luminance(rgb))

    def test_rgba_and_gray_alpha(self):
        rgba = RNG.integers(0, 256, (6, 7, 4), dtype=np.uint8)
        _, _, lum = decode_png(_build_png(rgba, 6, [0, 2, 4]))
        assert np.array_equal(lum, luminance(rgba[..., :3]))
        ga = RNG.integers(0, 256, (6, 7, 2), dtype=np.uint8)
        _, _, lum2 = decode_png(_build_png(ga, 4, [1, 3]))
        assert np.array_equal(lum2, ga[..., 0])

    def test_palette(self):
        pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = RNG.integers(0, 16, (8, 5), dtype=np.uint8)
        _, _, lum = decode_png(
            _build_png(idx[..., None], 3, [0, 2], palette=pal))
        assert np.array_equal(lum, luminance(pal[idx]))

    def test_multiple_idat_chunks(self):
        gray = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
        png = encode_png(gray)
        # split the IDAT into two chunks
        at = png.index(b"IDAT") - 4
        (ln,) = struct.unpack(">I", png[at:at + 4])
        body = png[at + 8:at + 8 + ln]
        rebuilt = (png[:at] + _chunk(b"IDAT", body[:3])
                   + _chunk(b"IDAT", body[3:]) + _chunk(b"IEND", b""))
        _, _, lum = decode_png(rebuilt)
        assert np.array_equal(lum, gray)

    @pytest.mark.parametrize("h,w", [(1, 1), (3, 2), (8, 8), (13, 17),
                                     (24, 40)])
    def test_adam7_interlaced_roundtrip(self, h, w):
        gray = RNG.integers(0, 256, (h, w), dtype=np.uint8)
        ww, hh, lum = decode_png(encode_png(gray, interlace=True))
        assert (ww, hh) == (w, h)
        np.testing.assert_array_equal(lum, gray)

    def test_refusals(self):
        gray = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
        bad_depth = bytearray(encode_png(gray))
        ihdr_at = bad_depth.index(b"IHDR") + 4
        bad_depth[ihdr_at + 8] = 16            # bit depth byte
        with pytest.raises(UnsupportedImage, match="bit depth"):
            decode_png(bytes(bad_depth[:ihdr_at - 8]) + _chunk(
                b"IHDR", bytes(bad_depth[ihdr_at:ihdr_at + 13]))
                + bytes(bad_depth[ihdr_at + 17:]))
        with pytest.raises(ValueError):
            decode_png(b"\x89PNG\r\n\x1a\njunk")


class TestGif:
    def test_roundtrip(self):
        pal = RNG.integers(0, 256, (8, 3), dtype=np.uint8)
        idx = RNG.integers(0, 8, (10, 14), dtype=np.uint8)
        w, h, lum = decode_gif(encode_gif(idx, pal))
        assert (w, h) == (14, 10)
        assert np.array_equal(lum, luminance(pal[idx]))

    def test_interlaced(self):
        pal = RNG.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = RNG.integers(0, 4, (16, 5), dtype=np.uint8)
        _, _, lum = decode_gif(encode_gif(idx, pal, interlaced=True))
        assert np.array_equal(lum, luminance(pal[idx]))

    def test_two_color(self):
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        idx = (np.indices((6, 6)).sum(0) % 2).astype(np.uint8)
        _, _, lum = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(lum, luminance(pal[idx]))

    def test_real_lzw_stream(self):
        """A properly LZW-compressed stream (not just literals): compress
        with a reference GIF-LZW encoder written inline, decode with the
        kernel."""
        pal = np.array([[i, i, i] for i in range(4)], dtype=np.uint8)
        idx = np.tile(np.array([0, 0, 1, 1, 2, 2, 3, 3], dtype=np.uint8),
                      (4, 2))                 # runs → real table entries
        h, w = idx.shape
        min_code = 2
        clear, end = 1 << min_code, (1 << min_code) + 1
        # reference LZW compressor (MSB-agnostic, LSB packing)
        table = {bytes([i]): i for i in range(clear)}
        next_code, width = end + 1, min_code + 1
        codes = [clear]
        cur = b""
        for p in idx.ravel().tolist():
            nxt = cur + bytes([p])
            if nxt in table:
                cur = nxt
            else:
                codes.append(table[cur])
                table[nxt] = next_code
                next_code += 1
                if next_code > (1 << width) and width < 12:
                    width += 1
                cur = bytes([p])
        codes.append(table[cur])
        codes.append(end)
        # pack LSB-first with the DECODER's width schedule (no entry is
        # added for the first code after a Clear — prev is empty)
        out, acc, nbits, cw, nc = bytearray(), 0, 0, min_code + 1, end + 1
        first = True
        for c in codes[:]:
            acc |= c << nbits
            nbits += cw
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
            if c == clear:
                cw, nc, first = min_code + 1, end + 1, True
            elif c != end:
                if first:
                    first = False
                else:
                    nc += 1
                    if nc == (1 << cw) and cw < 12:
                        cw += 1
        if nbits:
            out.append(acc & 0xFF)
        blocks = bytearray()
        for i in range(0, len(out), 255):
            part = out[i:i + 255]
            blocks += bytes([len(part)]) + part
        blocks += b"\x00"
        gif = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)
               + pal.tobytes()
               + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
               + bytes([min_code]) + bytes(blocks) + b"\x3B")
        _, _, lum = decode_gif(gif)
        assert np.array_equal(lum, luminance(pal[idx]))

    def test_extension_blocks_skipped(self):
        pal = np.array([[9, 9, 9], [200, 10, 30]], dtype=np.uint8)
        idx = np.zeros((3, 3), dtype=np.uint8)
        g = encode_gif(idx, pal)
        # inject a Graphic Control Extension after the 13-byte header +
        # the (padded, 2-entry) GCT = 6 bytes
        at = 13 + 6
        ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        g2 = g[:at] + ext + g[at:]
        _, _, lum = decode_gif(g2)
        assert np.array_equal(lum, luminance(pal[idx]))


class TestDispatch:
    def test_sniff(self):
        gray = RNG.integers(0, 256, (4, 4), dtype=np.uint8)
        assert decode_image(encode_png(gray))[2] == "png"
        pal = np.array([[1, 2, 3]], dtype=np.uint8)
        assert decode_image(
            encode_gif(np.zeros((2, 2), np.uint8), pal))[2] == "gif"
        # baseline AND progressive JPEG now decode for real
        from webcrawl_spark.kernels.jpegkit import (
            encode_jpeg, encode_jpeg_progressive,
        )
        w, h, fmt, lum = decode_image(encode_jpeg(gray, quant=1))
        assert (w, h, fmt) == (4, 4, "jpeg")
        w, h, fmt, lum2 = decode_image(
            encode_jpeg_progressive(gray, quant=1))
        assert (w, h, fmt) == (4, 4, "jpeg")
        np.testing.assert_array_equal(lum2, lum)
        with pytest.raises(UnsupportedImage, match="SOF9"):
            decode_image(    # arithmetic coding stays a typed refusal
                b"\xff\xd8\xff\xc9\x00\x08\x08\x00\x10\x00\x10\x00")
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0junkjunk")   # truncated APP0
        with pytest.raises(UnsupportedImage, match="webp"):
            decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
        with pytest.raises(ValueError):
            decode_image(b"plainly not an image")


class TestOperatorsRealDecode:
    def test_image_features_real(self, spark):
        from webcrawl_spark.operators.multimodal import (
            image_feature_from_luminance, image_features,
        )

        imgs = {}
        rows = []
        for i in range(6):
            gray = ((np.indices((8 + i, 10)).sum(0) * (i + 3)) % 256) \
                .astype(np.uint8)
            imgs[f"m{i}"] = gray
            rows.append((f"m{i}", bytearray(encode_png(gray))))
        from webcrawl_spark.kernels.jpegkit import encode_jpeg
        jgray = (np.indices((16, 24)).sum(0) // 8 * 31 % 256) \
            .astype(np.uint8)
        rows.append(("jpg", bytearray(encode_jpeg(jgray, quant=1))))
        rows.append(("arith", bytearray(
            b"\xff\xd8\xff\xc9\x00\x08\x08\x00\x10\x00\x10\x00")))
        rows.append(("bad", bytearray(b"garbage")))
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        out = {r["media_id"]: r for r in
               image_features(df, fake=False).collect()}
        for i in range(6):
            r = out[f"m{i}"]
            assert (r["width"], r["height"]) == (10, 8 + i)
            assert r["format"] == "png"
            exp = image_feature_from_luminance(imgs[f"m{i}"])
            assert np.allclose(r["feature"], exp)
        assert out["jpg"]["format"] == "jpeg"
        assert (out["jpg"]["width"], out["jpg"]["height"]) == (24, 16)
        assert out["arith"]["format"] == "unsupported:jpeg"
        assert out["arith"]["width"] is None
        assert out["bad"]["format"] == "error"

    def test_resize_real(self, spark):
        from webcrawl_spark.operators.multimodal import resize_images

        gray = RNG.integers(0, 256, (60, 100), dtype=np.uint8)
        df = spark.createDataFrame(
            [("a", bytearray(encode_png(gray))),
             ("junk", bytearray(b"nope"))],
            "media_id string, payload binary")
        out = {r["media_id"]: r for r in
               resize_images(df, max_w=50, max_h=50, fake=False).collect()}
        r = out["a"]
        assert (r["width"], r["height"]) == (50, 30)
        assert r["scale"] == pytest.approx(0.5)
        w2, h2, lum2 = decode_png(bytes(r["resized"]))
        assert (w2, h2) == (50, 30)
        assert np.array_equal(lum2, gray[np.ix_(
            (np.arange(30) * 2).astype(int), (np.arange(50) * 2).astype(int))])
        assert out["junk"]["width"] is None
        assert out["junk"]["resized"] is None


class TestBombGuards:
    def test_png_huge_dims_refuse(self):
        import struct as _s
        import zlib as _z
        ihdr = _s.pack(">IIBBBBB", 65000, 65000, 8, 0, 0, 0, 0)
        body = _s.pack(">I", 13) + b"IHDR" + ihdr \
            + _s.pack(">I", _z.crc32(b"IHDR" + ihdr))
        png = PNG_SIG + body + _s.pack(">I", 0) + b"IEND" \
            + _s.pack(">I", _z.crc32(b"IEND"))
        with pytest.raises(UnsupportedImage, match="decode cap"):
            decode_png(png)

    def test_corrupt_idat_classifies_in_operator(self, spark):
        from webcrawl_spark.operators.multimodal import image_features

        png = bytearray(encode_png(np.zeros((8, 8), np.uint8)))
        at = png.index(b"IDAT") + 4
        png[at:at + 6] = b"\x00" * 6           # corrupt the zlib stream
        df = spark.createDataFrame([("m", bytearray(bytes(png)))],
                                   "media_id string, payload binary")
        # zlib.error is not a ValueError — must classify, not kill the task
        assert image_features(df, fake=False).collect()[0]["format"] \
            == "error"
