"""Pure-stdlib image decode for the multimodal operators.

PNG (ISO 15948) and GIF (GIF87a/89a) are fully decodable with zlib +
bit-twiddling — the same predictor math the PDF kernel already uses for
FlateDecode xref streams (kernels/pdfkit.py) — so the engine's
``_decode_image_real`` path does real work for the two formats that
dominate crawled inline images, with no imaging library in the runtime.
Baseline JPEG decodes for real too (kernels/jpegkit.py — pure-numpy
Huffman + IDCT, luminance-only reconstruction); progressive JPEG,
WebP, and AVIF get a clean ``UnsupportedImage`` refusal (parity with
the PDF engine's DCTDecode refusal), never silent garbage.

Decoded output is a LUMINANCE plane (uint8, integer BT.601-ish weights
(r*299 + g*587 + b*114) // 1000 — integer math so any oracle can
recompute it bit-exactly) plus (width, height, format). PNG support:
bit depth 8, color types 0/2/3/4/6, sequential and Adam7-interlaced
layouts. GIF support: first frame,
global/local palettes, LZW (LSB-first packing), interlaced row order,
frame offsets within the logical screen.

Encoders (`encode_png`, `encode_gif`) are test/datagen helpers — the
inverse path, kept minimal (PNG filter-0 rows; GIF emitted as literal
codes with periodic Clear, the classic 'uncompressed GIF' trick).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "UnsupportedImage",
    "decode_png",
    "decode_gif",
    "decode_image",
    "encode_png",
    "encode_gif",
    "luminance",
]


class UnsupportedImage(ValueError):
    """Raised for formats/feature-combinations the stdlib cannot decode;
    carries the format name so callers can classify instead of crash."""

    def __init__(self, fmt: str, why: str):
        super().__init__(f"{fmt}: {why}")
        self.fmt = fmt
        self.why = why


def luminance(rgb: np.ndarray) -> np.ndarray:
    """Integer BT.601 luminance — exact integer math, oracle-recomputable."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: decompression-bomb guard: a crawled payload's declared dimensions are
#: attacker-controlled; refuse (typed, classifiable) before allocating.
#: 64 MP ≈ any real inline web image; jpegkit shares this policy.
MAX_PIXELS = 64_000_000
#: Adam7 pass origins/steps (x0, y0, dx, dy) — spec §8.2
ADAM7_PASSES = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(data: bytes, width: int, height: int,
                  bpp: int) -> np.ndarray:
    """Undo per-row PNG filters (None/Sub/Up/Average/Paeth — spec §9).
    Same math as the PDF kernel's predictor 10-15 path
    (kernels/pdfkit.py:354-415), operating on (height, rowlen) bytes.
    None/Up/Sub are vectorized; Average/Paeth carry an inherent
    left-neighbor dependence and run per-byte — worst-case cost is
    bounded by the MAX_PIXELS decode cap, and a production deployment
    would swap this for a codec library without touching the operator
    contract."""
    rowlen = width * bpp
    need = height * (rowlen + 1)
    if len(data) < need:
        raise ValueError("PNG: truncated pixel data")
    out = np.empty((height, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ft = data[pos]
        row = np.frombuffer(data, dtype=np.uint8, count=rowlen,
                            offset=pos + 1).copy()
        pos += 1 + rowlen
        if ft == 0:
            pass
        elif ft == 1:                                  # Sub
            # prefix sum mod 256 per bpp lane — vectorized (Sub is the
            # most common filter in photographic PNGs after Paeth)
            for k in range(bpp):
                row[k::bpp] = np.cumsum(
                    row[k::bpp], dtype=np.int64) & 0xFF
        elif ft == 2:                                  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:                                  # Average
            for j in range(rowlen):
                left = int(row[j - bpp]) if j >= bpp else 0
                row[j] = (int(row[j]) + ((left + int(prev[j])) >> 1)) & 0xFF
        elif ft == 4:                                  # Paeth
            for j in range(rowlen):
                a = int(row[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                c = int(prev[j - bpp]) if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (int(row[j]) + pr) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[y] = row
        prev = row
    return out


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, luminance uint8 [h, w]). Bit depth 8, color
    types 0/2/3/4/6, sequential or Adam7-interlaced; anything else
    refuses via UnsupportedImage."""
    if data[:8] != PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos, width, height = 8, None, None
    bit_depth = color_type = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length                     # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise UnsupportedImage("png", f"bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise UnsupportedImage("png", f"color type {color_type}")
    if width * height > MAX_PIXELS:
        raise UnsupportedImage(
            "png", f"{width}x{height} exceeds {MAX_PIXELS}-pixel decode cap")
    nch = _CHANNELS[color_type]
    if interlace == 1:
        expected = sum(
            ph * (pw * nch + 1)
            for pw, ph in (((width - x0 + dx - 1) // dx,
                            (height - y0 + dy - 1) // dy)
                           for x0, y0, dx, dy in ADAM7_PASSES)
            if pw and ph)
    else:
        expected = height * (width * nch + 1)
    # bounded inflate: never materialize more than the geometry implies
    raw = zlib.decompressobj().decompress(bytes(idat), expected)
    if interlace == 1:
        px = np.empty((height, width, nch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue                       # empty pass: zero bytes
            take = ph * (pw * nch + 1)
            sub = _png_unfilter(raw[pos:pos + take], pw, ph, nch)
            pos += take
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
    elif interlace:
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    else:
        px = _png_unfilter(raw, width, height, nch) \
            .reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = palette[px[..., 0]]
        return width, height, luminance(rgb)
    if color_type == 0:
        return width, height, px[..., 0]
    if color_type == 4:                        # gray + alpha
        return width, height, px[..., 0]
    return width, height, luminance(px[..., :3])


def encode_png(gray: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal grayscale-8 PNG encoder (filter 0 rows, optional Adam7
    pass layout) for tests/datagen."""
    h, w = gray.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = gray[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts += [b"\x00" + sub[y].astype(np.uint8).tobytes()
                      for y in range(sub.shape[0])]
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + gray[y].astype(np.uint8).tobytes()
                       for y in range(h))
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# --------------------------------------------------------------------------
# GIF
# --------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code_size: int,
                    max_out: int | None = None) -> bytes:
    """GIF-flavour LZW: LSB-first bit packing, clear=2^n, end=2^n+1,
    code width grows after the table fills 2^width (max 12 bits).
    ``max_out`` bounds the emitted bytes (LZW-bomb guard: the frame
    geometry tells the caller exactly how many pixels are legitimate)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = end + 1

    width = next_code = 0
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("GIF: LZW code out of range")
            out += entry
            prev = entry
            if max_out is not None and len(out) >= max_out:
                return bytes(out[:max_out])
            if next_code == (1 << width) and width < 12:
                width += 1
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, luminance uint8 [h, w]) of the FIRST frame
    composited onto the logical screen (background = color 0)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if sw * sh > MAX_PIXELS:
        raise UnsupportedImage(
            "gif", f"{sw}x{sh} exceeds {MAX_PIXELS}-pixel decode cap")
    pos = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    screen = np.zeros((sh, sw), dtype=np.uint8)
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:                         # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:                       # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack("<HHHHB",
                                                   data[pos + 1:pos + 10])
            pos += 10
            lct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                lct = np.frombuffer(data[pos:pos + 3 * n],
                                    dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if lct is None:
                raise ValueError("GIF: no color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while pos < len(data) and data[pos]:
                n = data[pos]
                stream += data[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1                            # block terminator
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(stream), min_code,
                                max_out=iw * ih)[:iw * ih],
                dtype=np.uint8)
            if len(idx) < iw * ih:
                raise ValueError("GIF: truncated frame")
            frame = idx.reshape(ih, iw)
            if iflags & 0x40:                  # interlaced row order
                ordered = np.empty_like(frame)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        ordered[y] = frame[src]
                        src += 1
                frame = ordered
            lum = luminance(lct[np.minimum(frame, len(lct) - 1)])
            screen[iy:iy + ih, ix:ix + iw] = lum[:sh - iy, :sw - ix]
            return sw, sh, screen               # first frame only
        elif b0 == 0x3B:                       # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
    raise ValueError("GIF: no image frame")


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlaced: bool = False) -> bytes:
    """Minimal GIF89a encoder for tests: literal LZW codes with periodic
    Clear (the 'uncompressed GIF' trick — decoders accept it because the
    table never overflows 12 bits)."""
    h, w = indices.shape
    n = len(palette)
    size_pow = max(1, (n - 1).bit_length())
    ct = np.zeros((2 ** size_pow, 3), dtype=np.uint8)
    ct[:n] = palette
    min_code = max(2, size_pow)
    clear = 1 << min_code
    end = clear + 1

    rows = list(range(h))
    if interlaced:
        rows = [y for start, step in _GIF_INTERLACE_PASSES
                for y in range(start, h, step)]
    # pack codes LSB-first: Clear, then pixels as literals with a Clear
    # every `clear - 2` literals so the growing table never widens codes
    acc = nbits = 0
    out = bytearray()
    width = min_code + 1

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    count = 0
    for y in rows:
        for x in range(w):
            emit(int(indices[y, x]))
            count += 1
            if count >= clear - 2:
                emit(clear)
                count = 0
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        part = out[i:i + 255]
        blocks += bytes([len(part)]) + part
    blocks += b"\x00"
    gct_flags = 0x80 | (size_pow - 1)
    iflags = 0x40 if interlaced else 0
    return (b"GIF89a"
            + struct.pack("<HHBBB", w, h, gct_flags, 0, 0)
            + ct.tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
            + bytes([min_code]) + bytes(blocks)
            + b"\x3B")


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def decode_image(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """Sniff + decode → (width, height, format, luminance). JPEG/WebP/AVIF
    refuse via UnsupportedImage; unknown bytes raise ValueError."""
    if data[:8] == PNG_SIG:
        w, h, lum = decode_png(data)
        return w, h, "png", lum
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h, lum = decode_gif(data)
        return w, h, "gif", lum
    if data[:3] == b"\xff\xd8\xff":
        # baseline/extended-sequential decode in kernels/jpegkit.py;
        # progressive/arithmetic/CMYK refuse typed from there
        from .jpegkit import decode_jpeg

        w, h, lum = decode_jpeg(data)
        return w, h, "jpeg", lum
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        raise UnsupportedImage("webp", "VP8 codec not in stdlib")
    if data[4:12] in (b"ftypavif", b"ftypheic"):
        raise UnsupportedImage("avif", "AV1 codec not in stdlib")
    raise ValueError("not a recognized image format")
