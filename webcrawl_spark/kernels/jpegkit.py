"""Baseline JPEG decode to luminance, pure numpy + stdlib.

Implements the public ITU-T T.81 baseline process (SOF0, and SOF1
extended-sequential with 8-bit precision): marker parse, DQT/DHT/DRI,
canonical Huffman entropy decode with restart intervals and byte
de-stuffing, dequantize + inverse zigzag, and a vectorized orthonormal
8x8 IDCT over all luminance blocks at once. Because every downstream
consumer (multimodal feature/resize operators) wants LUMINANCE, only
the Y component is reconstructed — chroma blocks are entropy-decoded
(the bitstream must advance) but never dequantized or transformed,
which skips ~2/3 of the IDCT work on 4:2:0 images for free.

Refusals are typed (UnsupportedImage, shared with kernels/imagekit.py):
progressive (SOF2) → ``jpeg-progressive``, arithmetic/lossless/12-bit →
``jpeg``; truncated or corrupt streams raise ValueError. This mirrors
the reference's PDF engine behavior for DCTDecode (pdf.rs refuses DCT
streams it cannot decode rather than emitting garbage).

``encode_jpeg`` is the test/datagen twin (grayscale or YCbCr 4:4:4 /
4:2:0, flat quant tables, equal-length canonical Huffman tables) — it
exists so the decoder can be exercised hermetically, like encode_png /
encode_wav.

Throughput note: the entropy decode is a per-symbol Python loop
(~1-3 MB/s); adequate for bounded-size feature extraction in
mapInPandas batches, and the first thing a production deployment swaps
for a codec library. The IDCT and assembly stages are vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagekit import MAX_PIXELS, UnsupportedImage

__all__ = ["decode_jpeg", "encode_jpeg"]

# zigzag scan order: index k in the stream → linear position in the 8x8
# block (row*8+col). Public T.81 Figure A.6 constant.
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis M: coeff = M @ b @ M.T,
    spatial = M.T @ C @ M."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    m = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    m[0, :] = 0.5 / np.sqrt(2.0)
    return m


_M = _dct_matrix()


class _Huff:
    """Canonical Huffman table in the T.81 F.2.2.3 decode shape."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code = 0
        ptr = 0
        for length in range(1, 17):
            if counts[length - 1]:
                self.valptr[length] = ptr
                self.mincode[length] = code
                code += counts[length - 1]
                ptr += counts[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise ValueError("JPEG: truncated entropy stream")
        self.pos = p + n
        v = 0
        for b in self.bits[p:p + n]:
            v = (v << 1) | int(b)
        return v

    def decode(self, table: _Huff) -> int:
        bits = self.bits
        p = self.pos
        n = len(bits)
        code = 0
        for length in range(1, 17):
            if p >= n:
                raise ValueError("JPEG: truncated entropy stream")
            code = (code << 1) | int(bits[p])
            p += 1
            if code <= table.maxcode[length]:
                self.pos = p
                return table.symbols[
                    table.valptr[length] + code - table.mincode[length]]
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, n: int) -> int:
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _scan_segments(data: bytes, start: int) -> list[bytes]:
    """Entropy-coded data from ``start``: de-stuff FF00, split on RST0-7
    (each split = one restart interval), stop at any other marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break                       # real marker (EOI, next SOS, ...)
    segs.append(bytes(cur))
    return segs


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, uint8 luminance[h, w]). Baseline/extended-
    sequential 8-bit Huffman JPEG; everything else refuses typed."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    restart_interval = 0
    comps: list[dict] = []
    width = height = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = data[i + 1]
        if marker == 0xD9:              # EOI
            break
        (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
        body = data[i + 4:i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xC2:
            raise UnsupportedImage(
                "jpeg-progressive", "progressive DCT not implemented")
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise UnsupportedImage(
                "jpeg", f"SOF{marker - 0xC0} process not implemented")
        if marker in (0xC0, 0xC1):      # baseline / extended sequential
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6])
            if precision != 8:
                raise UnsupportedImage("jpeg", f"{precision}-bit precision")
            if ncomp == 4:
                raise UnsupportedImage("jpeg", "4-component (CMYK/YCCK)")
            if width == 0 or height == 0 or ncomp not in (1, 3):
                raise ValueError("JPEG: bad SOF dimensions")
            if width * height > MAX_PIXELS:
                # bomb guard: header dims are attacker-controlled and the
                # coefficient store is allocated before entropy data is
                # ever validated
                raise UnsupportedImage(
                    "jpeg", f"{width}x{height} exceeds "
                            f"{MAX_PIXELS}-pixel decode cap")
            for c in range(ncomp):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * c:9 + 3 * c])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker == 0xDB:            # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(
                        body[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(
                        body[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                if len(tbl) != 64:
                    raise ValueError("JPEG: short DQT")
                qt[tq] = tbl
        elif marker == 0xC4:            # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 15
                counts = list(body[p + 1:p + 17])
                total = sum(counts)
                symbols = body[p + 17:p + 17 + total]
                if len(symbols) != total:
                    raise ValueError("JPEG: short DHT")
                huff[(tc, th)] = _Huff(counts, symbols)
                p += 17 + total
        elif marker == 0xDD:            # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:            # SOS
            if not comps:
                raise ValueError("JPEG: SOS before SOF")
            return _decode_scan(data, i, body, comps, qt, huff,
                                restart_interval, width, height)
        # APPn / COM / others: skipped by length
    raise ValueError("JPEG: no scan data")


def _decode_scan(data, scan_start, sos, comps, qt, huff,
                 restart_interval, width, height):
    ns = sos[0]
    if ns != len(comps):
        raise UnsupportedImage("jpeg", "non-interleaved multi-scan")
    scan_tables = {}
    for s in range(ns):
        cs, tdta = sos[1 + 2 * s], sos[2 + 2 * s]
        scan_tables[cs] = (tdta >> 4, tdta & 15)
    for c in comps:
        if c["id"] not in scan_tables:
            raise ValueError("JPEG: scan component not in frame")
        td, ta = scan_tables[c["id"]]
        dc = huff.get((0, td))
        ac = huff.get((1, ta))
        if dc is None or ac is None:
            raise ValueError("JPEG: missing Huffman table")
        if c["tq"] not in qt:
            raise ValueError("JPEG: missing quant table")
        c["dc"], c["ac"], c["q"] = dc, ac, qt[c["tq"]]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    y = comps[0]
    if len(comps) == 1:
        # non-interleaved single-component scan: MCU = one data unit
        mcus_x = (width + 7) // 8
        mcus_y = (height + 7) // 8
        yh = yv = 1
        blocks_x, blocks_y = mcus_x, mcus_y
    else:
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
        yh, yv = y["h"], y["v"]
        blocks_x = mcus_x * yh
        blocks_y = mcus_y * yv
    mcus = mcus_x * mcus_y

    segments = _scan_segments(data, scan_start)
    y_coefs = np.zeros((blocks_y * blocks_x, 64), dtype=np.int64)
    per_mcu = [(ci, c, c["h"] * c["v"] if len(comps) > 1 else 1)
               for ci, c in enumerate(comps)]
    interval = restart_interval or mcus
    seg_idx = 0
    reader = None
    preds = [0] * len(comps)
    done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if done % interval == 0:
                if seg_idx >= len(segments):
                    raise ValueError("JPEG: missing restart segment")
                reader = _BitReader(segments[seg_idx])
                seg_idx += 1
                preds = [0] * len(comps)
            for ci, c, nblocks in per_mcu:
                for b in range(nblocks):
                    s = reader.decode(c["dc"])
                    preds[ci] += _extend(reader.receive(s), s)
                    if c is y:
                        # MCU-major → plane-raster position
                        by, bx = divmod(b, yh)
                        gidx = ((my * yv + by) * blocks_x
                                + mx * yh + bx)
                        coef = y_coefs[gidx]
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(c["ac"])
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[k] = _extend(reader.receive(sz), sz)
                            k += 1
                    else:
                        k = 1           # chroma: advance the stream only
                        while k < 64:
                            rs = reader.decode(c["ac"])
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r + 1
                            reader.receive(sz)
            done += 1

    # vectorized dequant + inverse zigzag + IDCT over every Y block
    deq = (y_coefs * y["q"][None, :]).astype(np.float64)
    spatial = np.zeros((len(deq), 64), dtype=np.float64)
    spatial[:, ZIGZAG] = deq            # zigzag k → linear position
    blocks = spatial.reshape(-1, 8, 8)
    # spatial = M.T @ C @ M, batched
    pix = np.einsum("ka,nkl,lb->nab", _M, blocks, _M) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    plane = pix.reshape(blocks_y, blocks_x, 8, 8).transpose(
        0, 2, 1, 3).reshape(blocks_y * 8, blocks_x * 8)

    # Y resolution vs frame resolution (h/v relative to hmax/vmax)
    if len(comps) > 1 and (y["h"] != hmax or y["v"] != vmax):
        plane = plane.repeat(vmax // y["v"], axis=0) \
                     .repeat(hmax // y["h"], axis=1)
    return width, height, plane[:height, :width]


# --------------------------------------------------------------------------
# encoder (test/datagen helper)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)   # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s? use 0s below
        # (write() above already emitted the padded byte)


def _equal_length_table(symbols: list[int]) -> tuple[list[int], bytes,
                                                     dict[int, tuple[int,
                                                                     int]]]:
    """Canonical table giving every symbol the same code length L =
    ceil(log2(len+1)) — trivially valid, exercises the generic DHT reader."""
    length = max(1, (len(symbols)).bit_length())
    if (1 << length) == len(symbols):   # avoid the all-ones code
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (code, length) for code, sym in enumerate(symbols)}
    return counts, bytes(symbols), codes


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s
                           for r in range(16) for s in range(1, 11)]


def _encode_block(w: _BitWriter, coef_zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    mag = abs(diff)
    size = mag.bit_length()
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]   # EOB
        w.write(code, length)
    return dc


def _forward_blocks(plane: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """Pad to 8 (edge-replicate), forward DCT (C = M @ b @ M.T),
    quantize with the linear-order table, emit zigzag-order blocks."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) \
                   .reshape(-1, 8, 8)
    coefs = np.einsum("ij,njk,lk->nil", _M, blocks, _M).reshape(-1, 64)
    qlin = np.round(coefs / _q_linear(q_zz)[None, :]).astype(np.int64)
    # baseline category limits: AC size ≤ 10, DC size ≤ 11
    qlin[:, 1:] = np.clip(qlin[:, 1:], -1023, 1023)
    qlin[:, 0] = np.clip(qlin[:, 0], -2047, 2047)
    return qlin[:, ZIGZAG].astype(np.int64)


def _q_linear(q_zz: np.ndarray) -> np.ndarray:
    """Quant table stored in zigzag order → linear (row-major) order."""
    lin = np.empty(64, dtype=np.int64)
    lin[ZIGZAG] = q_zz
    return lin


def encode_jpeg(y: np.ndarray, cb: np.ndarray | None = None,
                cr: np.ndarray | None = None, quant: int = 2,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Minimal baseline encoder: grayscale (y only) or YCbCr 4:4:4 /
    4:2:0 (``subsample=True``), flat quant tables (value ``quant``),
    equal-length canonical Huffman tables, optional restart intervals."""
    h, w = y.shape
    q_zz = np.full(64, quant, dtype=np.int64)
    dc_counts, dc_syms, dc_codes = _equal_length_table(_DC_SYMS)
    ac_counts, ac_syms, ac_codes = _equal_length_table(_AC_SYMS)

    ncomp = 1 if cb is None else 3
    samp_y = (2, 2) if (subsample and ncomp == 3) else (1, 1)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0) + bytes(
        int(v) for v in q_zz)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += struct.pack(">BBB", 1, (samp_y[0] << 4) | samp_y[1], 0)
    if ncomp == 3:
        sof += struct.pack(">BBB", 2, 0x11, 0)
        sof += struct.pack(">BBB", 3, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_syms)),
                               (1, (ac_counts, ac_syms))):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += struct.pack(">BB", cid, 0x00)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # plane → per-component zigzag block lists in MCU order
    planes = [y]
    samps = [samp_y]
    if ncomp == 3:
        if subsample:
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2
            def ds(p):
                pp = np.pad(p.astype(np.int64), ((0, ph - h), (0, pw - w)),
                            mode="edge")
                return ((pp[0::2, 0::2] + pp[0::2, 1::2]
                         + pp[1::2, 0::2] + pp[1::2, 1::2]) // 4)
            planes += [ds(cb), ds(cr)]
        else:
            planes += [cb, cr]
        samps += [(1, 1), (1, 1)]

    comp_blocks = []
    comp_grids = []
    for p, (sh, sv) in zip(planes, samps):
        blocks = _forward_blocks(p, q_zz)
        bw = (p.shape[1] + 7) // 8
        bh = (p.shape[0] + 7) // 8
        comp_blocks.append(blocks.reshape(bh, bw, 64))
        comp_grids.append((bh, bw))

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    if ncomp == 1:
        mcus_y, mcus_x = comp_grids[0]
    else:
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcus = mcus_x * mcus_y

    writer = _BitWriter()
    preds = [0] * ncomp
    interval = restart_interval or mcus
    entropy = bytearray()
    done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if done and done % interval == 0:
                writer.flush()
                entropy += writer.out
                entropy += bytes([0xFF, 0xD0 + ((done // interval - 1) % 8)])
                writer = _BitWriter()
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samps[ci]
                if ncomp == 1:
                    sh = sv = 1
                bh, bw = comp_grids[ci]
                for by in range(sv):
                    for bx in range(sh):
                        gy = min(my * sv + by, bh - 1)
                        gx = min(mx * sh + bx, bw - 1)
                        preds[ci] = _encode_block(
                            writer, comp_blocks[ci][gy, gx], preds[ci],
                            dc_codes, ac_codes)
            done += 1
    writer.flush()
    entropy += writer.out
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
