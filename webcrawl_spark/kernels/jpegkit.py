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

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

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


def _scan_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``: de-stuff FF00, split on RST0-7
    (each split = one restart interval), stop at any other marker.
    → (segments, position of the terminating marker)."""
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
            i = n
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
    return segs, i


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (width, height, uint8 luminance[h, w]). Baseline/extended-
    sequential (SOF0/SOF1) and progressive (SOF2, spectral selection +
    successive approximation per T.81 §G) 8-bit Huffman JPEG; arithmetic
    / lossless / hierarchical / 12-bit / CMYK refuse typed."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    restart_interval = 0
    comps: list[dict] = []
    width = height = 0
    progressive = False
    prog = None
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
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise UnsupportedImage(
                "jpeg", f"SOF{marker - 0xC0} process not implemented")
        if marker == 0xC2:
            progressive = True
        if marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
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
            if not progressive:
                return _decode_scan(data, i, body, comps, qt, huff,
                                    restart_interval, width, height)
            if prog is None:
                prog = _ProgState(comps, width, height)
            i = _decode_prog_scan(data, i, body, prog, huff,
                                  restart_interval)
        # APPn / COM / others: skipped by length
    if prog is not None and prog.any_scan:
        return _reconstruct_y(prog, qt, width, height)
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

    segments, _scan_end = _scan_segments(data, scan_start)
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

    return _idct_assemble(y_coefs, y["q"], blocks_x, blocks_y,
                          y["h"], y["v"], hmax, vmax, len(comps),
                          width, height)


def _idct_assemble(y_coefs, q, blocks_x, blocks_y, yh, yv, hmax, vmax,
                   ncomp, width, height):
    """Vectorized dequant + inverse zigzag + IDCT over every Y block,
    assembled into the cropped luminance plane."""
    deq = (y_coefs * q[None, :]).astype(np.float64)
    spatial = np.zeros((len(deq), 64), dtype=np.float64)
    spatial[:, ZIGZAG] = deq            # zigzag k → linear position
    blocks = spatial.reshape(-1, 8, 8)
    # spatial = M.T @ C @ M, batched
    pix = np.einsum("ka,nkl,lb->nab", _M, blocks, _M) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    plane = pix.reshape(blocks_y, blocks_x, 8, 8).transpose(
        0, 2, 1, 3).reshape(blocks_y * 8, blocks_x * 8)
    # Y resolution vs frame resolution (h/v relative to hmax/vmax)
    if ncomp > 1 and (yh != hmax or yv != vmax):
        plane = plane.repeat(vmax // yv, axis=0) \
                     .repeat(hmax // yh, axis=1)
    return width, height, plane[:height, :width]


def _reconstruct_y(prog: "_ProgState", qt, width, height):
    y = prog.comps[0]
    if y["tq"] not in qt:
        raise ValueError("JPEG: missing quant table")
    return _idct_assemble(prog.y_coefs, qt[y["tq"]], prog.blocks_x,
                          prog.blocks_y, prog.yh, prog.yv,
                          prog.hmax, prog.vmax, len(prog.comps),
                          width, height)


class _ProgState:
    """Progressive-decode coefficient store: only the Y component is
    accumulated (chroma-only scans are skipped wholesale; chroma units
    inside interleaved DC scans are entropy-consumed and discarded)."""

    def __init__(self, comps: list[dict], width: int, height: int):
        self.comps = comps
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if len(comps) == 1:
            self.mcus_x = (width + 7) // 8
            self.mcus_y = (height + 7) // 8
            self.yh = self.yv = 1
        else:
            self.mcus_x = (width + 8 * self.hmax - 1) // (8 * self.hmax)
            self.mcus_y = (height + 8 * self.vmax - 1) // (8 * self.vmax)
            self.yh, self.yv = comps[0]["h"], comps[0]["v"]
        self.blocks_x = self.mcus_x * self.yh
        self.blocks_y = self.mcus_y * self.yv
        self.y_coefs = np.zeros((self.blocks_y * self.blocks_x, 64),
                                dtype=np.int64)
        for c in comps:
            cw = -(-width * c["h"] // self.hmax)       # ceil
            ch = -(-height * c["v"] // self.vmax)
            c["bw"], c["bh"] = (cw + 7) // 8, (ch + 7) // 8
        self.any_scan = False


def _decode_prog_scan(data: bytes, scan_start: int, sos: bytes,
                      prog: "_ProgState", huff, restart_interval) -> int:
    """One progressive scan (T.81 §G.2): DC first/refine (interleaved or
    single-component) and AC first/refine (always single-component).
    Returns the stream position after the scan's entropy data."""
    ns = sos[0]
    ss, se = sos[1 + 2 * ns], sos[2 + 2 * ns]
    ah_al = sos[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 15
    scan_comps = []
    by_id = {c["id"]: c for c in prog.comps}
    for s in range(ns):
        cs, tdta = sos[1 + 2 * s], sos[2 + 2 * s]
        if cs not in by_id:
            raise ValueError("JPEG: scan component not in frame")
        scan_comps.append((by_id[cs], tdta >> 4, tdta & 15))

    segments, end = _scan_segments(data, scan_start)
    prog.any_scan = True
    y = prog.comps[0]
    is_y_scan = any(c is y for c, _, _ in scan_comps)
    if ss > 0 and (ns != 1 or not is_y_scan):
        if ns != 1:
            raise ValueError("JPEG: interleaved AC scan is invalid")
        return end                       # chroma-only AC scan: skip
    if se > 63 or ss > se:
        raise ValueError("JPEG: bad spectral band")

    if ss == 0:                          # DC scan (first or refinement)
        tables = {}
        for c, td, _ta in scan_comps:
            if ah == 0:
                t = huff.get((0, td))
                if t is None:
                    raise ValueError("JPEG: missing DC table")
                tables[id(c)] = t
        if ns > 1:
            mcus_x, mcus_y = prog.mcus_x, prog.mcus_y
            per_mcu = [(c, c["h"] * c["v"], td) for c, td, _ in scan_comps]
        else:
            # non-interleaved: iterate the component's REAL block grid
            # (no MCU padding), mapping into the padded Y store
            c0 = scan_comps[0][0]
            mcus_x, mcus_y = c0["bw"], c0["bh"]
            per_mcu = [(c0, 1, scan_comps[0][1])]
        mcus = mcus_x * mcus_y
        interval = restart_interval or mcus
        reader = None
        preds: dict[int, int] = {}
        seg_idx = 0
        done = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if done % interval == 0:
                    if seg_idx >= len(segments):
                        raise ValueError("JPEG: missing restart segment")
                    reader = _BitReader(segments[seg_idx])
                    seg_idx += 1
                    preds = {id(c): 0 for c, _, _ in per_mcu}
                for c, nblocks, _td in per_mcu:
                    for b in range(nblocks):
                        if c is y:
                            if ns > 1:
                                by_, bx_ = divmod(b, prog.yh)
                                gidx = ((my * prog.yv + by_) * prog.blocks_x
                                        + mx * prog.yh + bx_)
                            else:
                                gidx = my * prog.blocks_x + mx
                            coef = prog.y_coefs[gidx]
                        else:
                            coef = None
                        if ah == 0:      # first DC scan
                            s = reader.decode(tables[id(c)])
                            preds[id(c)] += _extend(reader.receive(s), s)
                            if coef is not None:
                                coef[0] = preds[id(c)] << al
                        else:            # DC refinement: one raw bit/unit
                            bit = reader.receive(1)
                            if coef is not None and bit:
                                coef[0] |= 1 << al
                done += 1
        return end

    # AC scan over the Y component's own block grid, raster order
    c0, _td, ta = scan_comps[0]
    ac = huff.get((1, ta))
    if ac is None:
        raise ValueError("JPEG: missing AC table")
    bw, bh = c0["bw"], c0["bh"]
    mcus = bw * bh
    interval = restart_interval or mcus
    reader = None
    eobrun = 0
    seg_idx = 0
    done = 0
    p1, m1 = 1 << al, -1 << al
    for by_ in range(bh):
        for bx_ in range(bw):
            if done % interval == 0:
                if seg_idx >= len(segments):
                    raise ValueError("JPEG: missing restart segment")
                reader = _BitReader(segments[seg_idx])
                seg_idx += 1
                eobrun = 0
            coef = prog.y_coefs[by_ * prog.blocks_x + bx_]
            if ah == 0:                  # AC first scan (§G.2.2)
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.decode(ac)
                        r, s = rs >> 4, rs & 15
                        if s:
                            k += r
                            if k > se:
                                raise ValueError("JPEG: AC index overflow")
                            coef[k] = _extend(reader.receive(s), s) << al
                            k += 1
                        elif r == 15:
                            k += 16
                        else:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
            else:                        # AC refinement scan (§G.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(ac)
                        r, s = rs >> 4, rs & 15
                        val = 0
                        if s:
                            val = p1 if reader.receive(1) else m1
                        elif r != 15:
                            # no -1 here: the tail below consumes THIS
                            # block's remaining correction bits and then
                            # decrements (unlike the first-scan case)
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        while k <= se:
                            if coef[k] != 0:
                                if reader.receive(1) and not (coef[k] & p1):
                                    coef[k] += p1 if coef[k] >= 0 else m1
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if val and k <= se:
                            coef[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if coef[k] != 0:
                            if reader.receive(1) and not (coef[k] & p1):
                                coef[k] += p1 if coef[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
            done += 1
    return end


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


def _emit_ac_first(w: _BitWriter, coef_zz, ss, se, al, ac_codes):
    """One block of an AC first scan (band ss..se at precision al),
    per-block EOB (no cross-block EOB runs — valid, just not minimal)."""
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        t = int(coef_zz[k])
        temp = abs(t) >> al
        if temp == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            r -= 16
        s = temp.bit_length()
        code, length = ac_codes[(r << 4) | s]
        w.write(code, length)
        v = temp if t > 0 else -temp
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
        emitted = True
    if r > 0 or not emitted:
        code, length = ac_codes[0x00]   # EOB (run of 1)
        w.write(code, length)


def _emit_ac_refine(w: _BitWriter, coef_zz, ss, se, al, ac_codes):
    """One block of an AC refinement scan (T.81 §G.1.2.3 shape):
    correction bits buffer after each emitted symbol."""
    absv = [abs(int(coef_zz[k])) >> al for k in range(ss, se + 1)]
    eobidx = -1
    for j, a in enumerate(absv):
        if a == 1:
            eobidx = j
    r = 0
    br: list[int] = []
    for j, a in enumerate(absv):
        if a == 0:
            r += 1
            continue
        while r > 15 and j <= eobidx:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            for bit in br:
                w.write(bit, 1)
            br = []
            r -= 16
        if a > 1:                       # already nonzero: correction bit
            br.append(a & 1)
            continue
        code, length = ac_codes[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(coef_zz[ss + j]) > 0 else 0, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        code, length = ac_codes[0x00]
        w.write(code, length)
        for bit in br:
            w.write(bit, 1)


def encode_jpeg_progressive(y: np.ndarray, cb: np.ndarray | None = None,
                            cr: np.ndarray | None = None, quant: int = 2,
                            subsample: bool = False,
                            al: int = 1) -> bytes:
    """Progressive (SOF2) encoder twin: spectral selection (DC; AC 1-5;
    AC 6-63) with ``al`` successive-approximation levels on the Y bands
    (first scans at Al=al, then refinement passes down to 0). Chroma AC
    ships as single Al=0 scans (each component/band owns its own SA
    sequence, so this is a valid progression). Grayscale or YCbCr
    4:4:4 / 4:2:0."""
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
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_syms)),
                               (1, (ac_counts, ac_syms))):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    # per-component coefficient grids (same layout as the baseline encoder)
    planes = [y]
    samps = [samp_y]
    if ncomp == 3:
        if subsample:
            ph2 = (h + 1) // 2 * 2
            pw2 = (w + 1) // 2 * 2

            def ds(p):
                pp = np.pad(p.astype(np.int64),
                            ((0, ph2 - h), (0, pw2 - w)), mode="edge")
                return ((pp[0::2, 0::2] + pp[0::2, 1::2]
                         + pp[1::2, 0::2] + pp[1::2, 1::2]) // 4)
            planes += [ds(cb), ds(cr)]
        else:
            planes += [cb, cr]
        samps += [(1, 1), (1, 1)]
    comp_blocks = []
    comp_grids = []
    for p, _s in zip(planes, samps):
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

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int,
                   a: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += struct.pack(">BB", cid, 0x00)
        body += bytes([ss, se, (ah << 4) | a])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def mcu_units():
        """(ci, gy, gx) unit sequence of the interleaved DC scan."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    sh, sv = samps[ci] if ncomp > 1 else (1, 1)
                    bh, bw = comp_grids[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            yield (ci, min(my * sv + by, bh - 1),
                                   min(mx * sh + bx, bw - 1))

    all_ids = list(range(1, ncomp + 1))

    # 1. DC first scan (interleaved), Al=al
    out += sos_header(all_ids, 0, 0, 0, al)
    writer = _BitWriter()
    preds = [0] * ncomp
    for ci, gy, gx in mcu_units():
        dc = int(comp_blocks[ci][gy, gx][0]) >> al
        diff = dc - preds[ci]
        preds[ci] = dc
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1,
                         size)
    writer.flush()
    out += writer.out

    # 2-3. AC Y first scans at Al=al
    ybh, ybw = comp_grids[0]
    for ss, se in ((1, 5), (6, 63)):
        out += sos_header([1], ss, se, 0, al)
        writer = _BitWriter()
        for by in range(ybh):
            for bx in range(ybw):
                _emit_ac_first(writer, comp_blocks[0][by, bx], ss, se, al,
                               ac_codes)
        writer.flush()
        out += writer.out

    # 4. chroma AC: single Al=0 scans
    for ci in range(1, ncomp):
        cbh, cbw = comp_grids[ci]
        out += sos_header([ci + 1], 1, 63, 0, 0)
        writer = _BitWriter()
        for by in range(cbh):
            for bx in range(cbw):
                _emit_ac_first(writer, comp_blocks[ci][by, bx], 1, 63, 0,
                               ac_codes)
        writer.flush()
        out += writer.out

    # 5. successive-approximation refinements down to Al=0
    for a in range(al - 1, -1, -1):
        out += sos_header(all_ids, 0, 0, a + 1, a)   # DC refine
        writer = _BitWriter()
        for ci, gy, gx in mcu_units():
            writer.write((int(comp_blocks[ci][gy, gx][0]) >> a) & 1, 1)
        writer.flush()
        out += writer.out
        for ss, se in ((1, 5), (6, 63)):             # AC Y refine
            out += sos_header([1], ss, se, a + 1, a)
            writer = _BitWriter()
            for by in range(ybh):
                for bx in range(ybw):
                    _emit_ac_refine(writer, comp_blocks[0][by, bx], ss, se,
                                    a, ac_codes)
            writer.flush()
            out += writer.out

    out += b"\xff\xd9"
    return bytes(out)


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
