"""Pure-stdlib video METADATA extraction (ISO BMFF / MP4 box walk).

Frame/pixel decode needs codecs far outside the stdlib, but the
metadata a frame-sampling plan actually consumes — duration, display
dimensions, codec fourcc — lives in plain ISO 14496-12 box structure:
``moov/mvhd`` (timescale + duration), the video ``trak``'s ``tkhd``
(16.16 fixed-point width/height) identified via ``mdia/hdlr`` = 'vide',
and ``stbl/stsd`` (sample-description fourcc, e.g. avc1/hev1/av01).
This module walks those boxes with struct only; containers needing an
EBML parser (WebM/MKV) or legacy RIFF (AVI) refuse typed —
``UnsupportedVideo`` — so callers classify instead of crash, exactly
like the image/audio kernels.

``build_mp4`` is the hermetic test twin (minimal ftyp+moov+mdat).
"""

from __future__ import annotations

import struct

__all__ = ["UnsupportedVideo", "parse_mp4", "parse_webm", "probe_video",
           "build_mp4", "build_webm"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class UnsupportedVideo(ValueError):
    def __init__(self, fmt: str, why: str):
        super().__init__(f"{fmt}: {why}")
        self.fmt = fmt
        self.why = why


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        payload = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4: truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            payload = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("MP4: bad box size")
        yield btype, payload, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box at ``path`` (e.g. moov → trak → ...); None if absent."""
    if not path:
        return (start, end)
    for btype, p0, p1 in _boxes(data, start, end):
        if btype == path[0]:
            found = _find(data, p0, p1, *path[1:])
            if found is not None:
                return found
    return None


def parse_mp4(data: bytes) -> dict:
    """→ {brand, duration_s, width, height, codec}. Width/height come from
    the first 'vide'-handler track's tkhd (16.16 fixed point, exact
    integer semantics: value / 65536); duration from mvhd."""
    if data[4:8] != b"ftyp":
        raise ValueError("MP4: missing ftyp")
    brand = data[8:12].decode("ascii", "replace")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4: missing moov")
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("MP4: missing mvhd")
    body = data[mvhd[0]:mvhd[1]]
    version = body[0]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", body[20:32])
    else:
        timescale, duration = struct.unpack(">II", body[12:20])
    if timescale == 0:
        raise ValueError("MP4: zero timescale")

    width = height = None
    codec = None
    for btype, p0, p1 in _boxes(data, moov[0], moov[1]):
        if btype != b"trak":
            continue
        hdlr = _find(data, p0, p1, b"mdia", b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(data, p0, p1, b"tkhd")
        if tkhd is not None:
            tb = data[tkhd[0]:tkhd[1]]
            # width/height are the LAST 8 bytes of tkhd (v0 and v1)
            w_fixed, h_fixed = struct.unpack(">II", tb[-8:])
            width, height = w_fixed // 65536, h_fixed // 65536
        stsd = _find(data, p0, p1, b"mdia", b"minf", b"stbl", b"stsd")
        if stsd is not None:
            sb = data[stsd[0]:stsd[1]]
            (n_entries,) = struct.unpack(">I", sb[4:8])
            if n_entries >= 1 and len(sb) >= 16:
                codec = sb[12:16].decode("ascii", "replace")
        break
    return {
        "brand": brand,
        "duration_s": duration / timescale,
        "width": width,
        "height": height,
        "codec": codec,
    }


# --------------------------------------------------------------------------
# WebM / Matroska (EBML)
# --------------------------------------------------------------------------

# EBML element IDs (public Matroska/WebM spec)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO_EL = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA


def _ebml_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` → (value, next_pos).
    Element IDs keep the length-marker bit; sizes strip it (an all-ones
    size means 'unknown' and is returned as -1)."""
    if pos >= len(data):
        raise ValueError("EBML: truncated varint")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML: invalid varint lead byte")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("EBML: truncated varint")
    raw = int.from_bytes(data[pos:pos + length], "big")
    if keep_marker:
        return raw, pos + length
    value = raw - (1 << (8 * length - length))     # strip marker bit
    if value == (1 << (7 * length)) - 1:
        value = -1                                 # unknown size
    return value, pos + length


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end) for siblings."""
    pos = start
    while pos < end:
        eid, pos = _ebml_vint(data, pos, keep_marker=True)
        size, pos = _ebml_vint(data, pos, keep_marker=False)
        p1 = end if size < 0 else pos + size
        if p1 > end:
            raise ValueError("EBML: element overruns parent")
        yield eid, pos, p1
        pos = p1


def _ebml_uint(data: bytes, p0: int, p1: int) -> int:
    return int.from_bytes(data[p0:p1], "big")


def parse_webm(data: bytes) -> dict:
    """→ {brand (DocType), duration_s, width, height, codec}. Duration =
    Segment>Info Duration (float, in TimestampScale-ns units); dims/codec
    from the first TrackType==1 (video) TrackEntry."""
    doctype = "matroska"
    duration = None
    tscale = 1_000_000                  # spec default, ns
    width = height = codec = None
    top = list(_ebml_children(data, 0, len(data)))
    for eid, p0, p1 in top:
        if eid == _EBML_HEADER:
            for cid, c0, c1 in _ebml_children(data, p0, p1):
                if cid == _DOCTYPE:
                    doctype = data[c0:c1].decode("ascii", "replace") \
                        .rstrip("\x00")
        elif eid == _SEGMENT:
            for cid, c0, c1 in _ebml_children(data, p0, p1):
                if cid == _INFO:
                    for iid, i0, i1 in _ebml_children(data, c0, c1):
                        if iid == _TIMESTAMP_SCALE:
                            tscale = _ebml_uint(data, i0, i1)
                        elif iid == _DURATION:
                            raw = data[i0:i1]
                            duration = struct.unpack(
                                ">f" if len(raw) == 4 else ">d", raw)[0]
                elif cid == _TRACKS:
                    for tid, t0, t1 in _ebml_children(data, c0, c1):
                        if tid != _TRACK_ENTRY or width is not None:
                            continue
                        entry = list(_ebml_children(data, t0, t1))
                        ttype = next((_ebml_uint(data, e0, e1)
                                      for e, e0, e1 in entry
                                      if e == _TRACK_TYPE), None)
                        if ttype != 1:
                            continue
                        for e, e0, e1 in entry:
                            if e == _CODEC_ID:
                                codec = data[e0:e1].decode(
                                    "ascii", "replace").rstrip("\x00")
                            elif e == _VIDEO_EL:
                                for v, v0, v1 in _ebml_children(
                                        data, e0, e1):
                                    if v == _PIXEL_W:
                                        width = _ebml_uint(data, v0, v1)
                                    elif v == _PIXEL_H:
                                        height = _ebml_uint(data, v0, v1)
    if duration is None and width is None:
        raise ValueError("EBML: no Segment Info or video track found")
    return {
        "brand": doctype,
        "duration_s": (duration * tscale / 1e9
                       if duration is not None else None),
        "width": width,
        "height": height,
        "codec": codec,
    }


def probe_video(data: bytes) -> dict:
    """Sniff + parse → metadata dict plus format (mp4 / webm / mkv).
    AVI refuses via UnsupportedVideo; unknown bytes raise ValueError."""
    if data[4:8] == b"ftyp":
        meta = parse_mp4(data)
        meta["format"] = "mp4"
        return meta
    if data[:4] == b"\x1a\x45\xdf\xa3":
        meta = parse_webm(data)
        meta["format"] = "webm" if meta["brand"] == "webm" else "mkv"
        return meta
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        raise UnsupportedVideo("avi", "RIFF AVI not implemented")
    raise ValueError("not a recognized video container")


# --------------------------------------------------------------------------
# builder (test/datagen helper)
# --------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _ebml_encode_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_encode_size(n: int) -> bytes:
    length = 1
    while n >= (1 << (7 * length)) - 1:
        length += 1
    return ((1 << (7 * length)) | n).to_bytes(length, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return _ebml_encode_id(eid) + _ebml_encode_size(len(payload)) + payload


def _uintb(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_webm(duration_s: float, width: int = 0, height: int = 0,
               codec: str = "V_VP9", timescale_ns: int = 1_000_000,
               doctype: str = "webm") -> bytes:
    """Minimal valid-enough WebM/Matroska (test/datagen helper)."""
    header = _el(_EBML_HEADER, _el(_DOCTYPE, doctype.encode("ascii")))
    duration = duration_s * 1e9 / timescale_ns
    info = _el(_INFO,
               _el(_TIMESTAMP_SCALE, _uintb(timescale_ns))
               + _el(_DURATION, struct.pack(">d", duration)))
    video = _el(_VIDEO_EL,
                _el(_PIXEL_W, _uintb(width)) + _el(_PIXEL_H, _uintb(height)))
    track = _el(_TRACK_ENTRY,
                _el(_TRACK_TYPE, b"\x01")
                + _el(_CODEC_ID, codec.encode("ascii")) + video)
    segment = _el(_SEGMENT, info + _el(_TRACKS, track))
    return header + segment


def build_mp4(duration_s: float, timescale: int = 1000,
              width: int = 0, height: int = 0, codec: str = "avc1",
              brand: str = "isom", mvhd_version: int = 0) -> bytes:
    """Minimal valid-enough MP4: ftyp + moov(mvhd + video trak) + mdat."""
    duration = round(duration_s * timescale)
    if mvhd_version == 1:
        mvhd = _box(b"mvhd", b"\x01\x00\x00\x00"
                    + struct.pack(">QQIQ", 0, 0, timescale, duration)
                    + b"\x00" * 80)
    else:
        mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"
                    + struct.pack(">IIII", 0, 0, timescale, duration)
                    + b"\x00" * 80)
    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
                + struct.pack(">II", width * 65536, height * 65536))
    hdlr = _box(b"hdlr", b"\x00\x00\x00\x00\x00\x00\x00\x00"
                + b"vide" + b"\x00" * 13)
    entry = _box(codec.encode("ascii"), b"\x00" * 70)
    stsd = _box(b"stsd", b"\x00\x00\x00\x00\x00\x00\x00\x01" + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", brand.encode("ascii") + b"\x00\x00\x02\x00"
                + b"isomiso2")
    return ftyp + moov + _box(b"mdat", b"\x00" * 16)
