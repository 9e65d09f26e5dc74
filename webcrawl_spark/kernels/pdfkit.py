"""PDF engine kernel (S3/U6) — deterministic text-layer PDF build + extract.

The reference scrapes PDFs as first-class documents:
- packages/firecrawl-rs/src/pdf.rs:13-45 — lopdf page count + /Title from the
  trailer Info dict, falling back to the first object carrying /Title;
- apps/WebCrawl/src/scraper/scrapeURL/engines/pdf/index.ts:21-34 — pdf-parse
  text extraction, HTML-escaped, used as BOTH the html and markdown outputs;
- index.ts:87-104 — a 150 ms/page time budget against the scrape timeout.

The sandbox has no pypdf/pdfminer, so this module implements the minimal
slice of the (public) PDF 1.4 spec the engine needs, from scratch:

- ``build_pdf``: a deterministic writer (Catalog → Pages → Page tree,
  FlateDecode content streams of ``Tj`` text-show operators, Info /Title,
  xref + trailer). Used by the synthetic corpus and tests.
- ``pdf_metadata``: page count (count of /Type /Page objects ≡ lopdf
  get_pages on a flat tree) + title (trailer Info /Title, then any-object
  /Title fallback — pdf.rs:23-43 order).
- ``pdf_text``: content streams in /Kids order, FlateDecode-aware, text from
  ``Tj``/``'``/``TJ`` operators. Line model (the deterministic stand-in for
  pdf-parse's y-position line breaks): one text-show = one line, lines joined
  with "\\n", pages joined with "\\n\\n".
- ``scrape_pdf_result``: the engine result shape of index.ts:87-120 —
  escaped text as html AND markdown, effective page count under max_pages,
  and the insufficient-time flag.

All pure functions over bytes — the Spark operator wraps them in one Arrow
batch UDF (operators/pdf.py).
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "escape_html",
    "build_pdf",
    "pdf_metadata",
    "pdf_text",
    "pdf_is_encrypted",
    "scrape_pdf_result",
    "MILLISECONDS_PER_PAGE",
    "LINES_PER_PAGE",
]

MILLISECONDS_PER_PAGE = 150  # engines/pdf/index.ts:19
LINES_PER_PAGE = 40


def escape_html(text: str) -> str:
    """escape-html npm package semantics (the exact five entities, in its
    replacement table order)."""
    return (
        text.replace("&", "&amp;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def _pdf_escape_string(s: str) -> bytes:
    """Escape delimiters; non-ASCII bytes of the utf-8 encoding are
    octal-escaped so the file stays 7-bit clean."""
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    raw = out.encode("utf-8")
    return b"".join(
        bytes([b]) if 32 <= b < 127 else b"\\%03o" % b for b in raw
    )


def build_pdf(lines: list[str], title: str | None = None,
              lines_per_page: int = LINES_PER_PAGE) -> bytes:
    """Deterministic multi-page PDF with a real text layer. One ``Tj`` per
    line, ``lines_per_page`` lines per page, FlateDecode content streams."""
    pages = [lines[i:i + lines_per_page]
             for i in range(0, max(1, len(lines)), lines_per_page)] or [[]]
    n_pages = len(pages)
    # object ids: 1 Catalog, 2 Pages, 3 Font, 4.. pages, then streams, Info
    first_page = 4
    first_stream = first_page + n_pages
    info_id = first_stream + n_pages

    objects: dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % (first_page + i) for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (b"<< /Type /Pages /Kids [" + kids +
                  b"] /Count %d >>" % n_pages)
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, page_lines in enumerate(pages):
        objects[first_page + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % (first_stream + i)
        )
        content = b"BT /F1 11 Tf 72 720 Td 14 TL\n" + b"".join(
            b"(" + _pdf_escape_string(line) + b") Tj T*\n"
            for line in page_lines
        ) + b"ET"
        compressed = zlib.compress(content, 6)
        objects[first_stream + i] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(compressed)
            + compressed + b"\nendstream"
        )
    if title is not None:
        objects[info_id] = b"<< /Title (" + _pdf_escape_string(title) + b") >>"

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objects):
        offsets[oid] = len(buf)
        buf += b"%d 0 obj\n" % oid + objects[oid] + b"\nendobj\n"
    xref_at = len(buf)
    max_id = max(objects)
    buf += b"xref\n0 %d\n" % (max_id + 1)
    buf += b"0000000000 65535 f \n"
    for oid in range(1, max_id + 1):
        buf += b"%010d 00000 n \n" % offsets.get(oid, 0)
    trailer = b"<< /Size %d /Root 1 0 R" % (max_id + 1)
    if title is not None:
        trailer += b" /Info %d 0 R" % info_id
    trailer += b" >>"
    buf += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(buf)


def build_pdf_fonts(cid_text: str, diff_line: bytes,
                    differences: bytes) -> bytes:
    """Deterministic single-page fixture exercising font-resolved decoding:
    /F1 is a Type0 (Identity-H) font whose ToUnicode CMap maps 2-byte codes
    ``0x0041 + i`` → the characters of ``cid_text`` (bfchar for the first,
    bfrange for the rest), shown as a hex string; /F2 is a simple font with
    an /Encoding /Differences array (``differences`` e.g. b"65 /bullet")
    showing the raw byte line ``diff_line``. Used by tests only — the
    corpus writer ``build_pdf`` is unchanged."""
    codes = b"".join(b"%04X" % (0x41 + i) for i in range(len(cid_text)))
    first = cid_text[0]
    bfchar = b"<0041> <%04X>" % ord(first)
    if len(cid_text) > 1:
        # one bfrange per char keeps destinations exact for arbitrary text
        ranges = b"\n".join(
            b"<%04X> <%04X> <%04X>" % (0x41 + i, 0x41 + i, ord(ch))
            for i, ch in enumerate(cid_text[1:], start=1))
        bfrange = b"2 beginbfrange\n" + ranges + b"\nendbfrange\n"
    else:
        bfrange = b""
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"1 beginbfchar\n" + bfchar + b"\nendbfchar\n" + bfrange
            + b"end")
    content = (b"BT /F1 11 Tf 72 720 Td <" + codes + b"> Tj ET\n"
               b"BT /F2 11 Tf 72 700 Td (" + diff_line + b") Tj ET")
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R /F2 6 0 R >> >> "
            b"/Contents 7 0 R >>"),
        4: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/Encoding /Identity-H /ToUnicode 5 0 R >>"),
        5: (b"<< /Length %d >>\nstream\n" % len(cmap) + cmap
            + b"\nendstream"),
        6: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Fake "
            b"/Encoding << /Type /Encoding /Differences ["
            + differences + b"] >> >>"),
        7: (b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream"),
    }
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objects):
        offsets[oid] = len(buf)
        buf += b"%d 0 obj\n" % oid + objects[oid] + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objects) + 1)
    for oid in range(1, len(objects) + 1):
        buf += b"%010d 00000 n \n" % offsets[oid]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at))
    return bytes(buf)


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# (?!\d) blocks the backtracked partial-number match: on '/Length 12 0 R'
# the engine would otherwise retry (\d+)='1' (whose next char '2' defeats
# the indirect-ref lookahead) and return a truncated length
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
# string operand: (literal with escapes) or <hex>
_TITLE_RE = re.compile(
    rb"/Title\s*(?:\(((?:[^()\\]|\\.)*)\)|<([0-9a-fA-F\s]*)>)")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages(?![a-zA-Z])")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_CONTENTS_RE = re.compile(rb"/Contents\s*(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)*)\s*\])")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_ENCRYPT_RE = re.compile(rb"/Encrypt\s+(?:\d+\s+\d+\s+R|<<)")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
# /Filter may be a single name or an array of names (decode chain order)
_FILTER_RE = re.compile(rb"/Filter\s*(?:/([A-Za-z0-9]+)|\[((?:\s*/[A-Za-z0-9]+)*)\s*\])")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm(?![a-zA-Z])")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_N_RE = re.compile(rb"/N\s+(\d+)")
# text-show operators inside a decoded content stream: literal or hex operand
_SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"        # (s) Tj   or   (s) '
    rb"|<([0-9a-fA-F\s]*)>\s*(Tj|')"           # <hex> Tj  or  <hex> '
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ",          # [ (a) -120 <hex> (b) ] TJ
    re.S,
)
_TJ_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)|<([0-9a-fA-F\s]*)>", re.S)

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _decode_text_bytes(raw: bytes) -> str:
    """lopdf decode_text_string semantics: UTF-16BE when the BOM is present
    (pdf.rs:23-43 titles of real-world PDFs are commonly UTF-16BE),
    else treat as (mostly-ASCII) PDFDocEncoding — decoded here as utf-8 with
    replacement, which is identity on ASCII."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("utf-8", errors="replace")


def _hex_string_bytes(raw: bytes) -> bytes:
    """<hex string>: whitespace ignored, odd final digit padded with 0."""
    h = b"".join(raw.split())
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _unescape_pdf_bytes(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):   # line continuation
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        else:
            out += c
            i += 1
    return bytes(out)


def _unescape_pdf_string(raw: bytes) -> str:
    return _decode_text_bytes(_unescape_pdf_bytes(raw))


def _string_match_text(lit: bytes | None, hexs: bytes | None) -> str:
    """Decode a (literal, hex) regex alternative pair to text."""
    if lit is not None:
        return _unescape_pdf_string(lit)
    return _decode_text_bytes(_hex_string_bytes(hexs or b""))


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Scanning object index — deliberately xref-free: object offsets come
    from the 'N 0 obj' markers themselves, so classic xref tables, xref
    STREAMS (PDF 1.5+, /Type /XRef), and truncated/corrupt xref sections all
    parse identically (lopdf likewise falls back to scanning on a bad xref).
    Stream payloads are skipped via /Length (they are arbitrary bytes —
    compressed data can contain 'endobj'/'endstream' sequences, so delimiter
    regexes alone would truncate objects)."""
    objs: dict[int, bytes] = {}
    pos = 0
    n = len(data)
    while pos < n:
        m = _OBJ_HEAD_RE.search(data, pos)
        if not m:
            break
        oid = int(m.group(1))
        start = m.end()
        sm = _STREAM_START_RE.search(data, start)
        em = data.find(b"endobj", start)
        if sm is not None and (em == -1 or sm.start() < em):
            head = data[start:sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm:
                scan_from = sm.end() + int(lm.group(1))
            else:
                scan_from = sm.end()
            es = data.find(b"endstream", scan_from)
            em = data.find(b"endobj", es if es != -1 else scan_from)
        if em == -1:
            em = n
        objs[oid] = data[start:em]
        pos = em + len(b"endobj")
    return objs


_INT_RE = re.compile(rb"\s*(\d+)")
_DECODEPARMS_RE = re.compile(
    rb"/DecodeParms\s*(<<.*?>>|\[.*?\])", re.S)
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")


def _decode_parms_list(head: bytes, n: int) -> list[bytes | None]:
    """Per-filter /DecodeParms dicts (a single dict applies to the first
    filter; an array aligns entry-by-entry with the /Filter array, null =
    no parms — PDF 1.7 §7.4)."""
    m = _DECODEPARMS_RE.search(head)
    if not m:
        return [None] * n
    seg = m.group(1)
    if seg.startswith(b"<<"):
        return [seg] + [None] * (n - 1)
    toks = re.findall(rb"<<.*?>>|null", seg, re.S)
    out: list[bytes | None] = [t if t.startswith(b"<<") else None
                               for t in toks]
    out += [None] * (n - len(out))
    return out[:n]


def _apply_predictor(data: bytes, parm: bytes) -> bytes:
    """Undo /Predictor on a decompressed Flate/LZW payload: 2 = TIFF
    horizontal differencing, 10-15 = PNG row filters (None/Sub/Up/Average/
    Paeth, per-row filter byte — PNG spec §9; real-world xref streams
    almost always use predictor 12/Up). Unknown predictor values pass
    through unchanged."""
    pm = _PREDICTOR_RE.search(parm)
    pred = int(pm.group(1)) if pm else 1
    if pred < 2:
        return data
    colors = int(m.group(1)) if (m := _COLORS_RE.search(parm)) else 1
    bpc = int(m.group(1)) if (m := _BPC_RE.search(parm)) else 8
    columns = int(m.group(1)) if (m := _COLUMNS_RE.search(parm)) else 1
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if pred == 2:
        if bpc != 8:
            return data          # sub-byte TIFF differencing: out of slice
        row = bytearray(data)
        n_rows = len(row) // rowlen
        for r in range(n_rows):
            base = r * rowlen
            for j in range(bpp, rowlen):
                row[base + j] = (row[base + j] + row[base + j - bpp]) & 0xFF
        return bytes(row)
    # PNG predictors: each stored row = filter-type byte + rowlen bytes
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        i += 1 + rowlen
        if len(row) < rowlen:
            row += bytes(rowlen - len(row))
        if ft == 1:                                   # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:                                 # Up
            for j in range(rowlen):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:                                 # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:                                 # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF-flavour LZW (spec 7.4.4, lopdf/pdf.rs:13-45 parity): MSB-first
    bit packing, 8-bit symbols, Clear=256, EOD=257, code width 9→12
    growing one code EARLY by default (/EarlyChange 1). Shares predictor
    post-processing with FlateDecode via _apply_predictor. (The GIF
    kernel's LZW is the LSB-first twin — kernels/imagekit.py.)"""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258

    width = next_code = 0
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1      # drop consumed bits: keep acc
            #                              a machine int, not an O(n) bignum
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                if next_code < 4096:
                    table.append(prev + entry[:1])
                    next_code += 1
            elif code == next_code and next_code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            prev = entry
            if next_code + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _decode_filters(raw: bytes, head: bytes) -> tuple[bytes | None,
                                                      bytes | None]:
    """Apply the /Filter decode chain (name or array order) →
    (payload, unsupported_filter_name). Supported: FlateDecode and
    LZWDecode (both incl. /Predictor + /EarlyChange via DecodeParms),
    ASCIIHexDecode, ASCII85Decode. An unsupported filter
    (DCTDecode/JPXDecode image codecs, Crypt, …) returns (None, name):
    the stream is skipped rather than misread, and the caller can surface
    the 'unsupported' refusal (lopdf raises a typed filter error
    there)."""
    fm = _FILTER_RE.search(head)
    if not fm:
        return raw, None
    if fm.group(1) is not None:
        names = [fm.group(1)]
    else:
        names = [m.group(1) for m in _FILTER_NAME_RE.finditer(fm.group(2))]
    parms = _decode_parms_list(head, len(names))
    out = raw
    for name, parm in zip(names, parms):
        try:
            if name == b"FlateDecode":
                out = zlib.decompress(out)
                if parm is not None:
                    out = _apply_predictor(out, parm)
            elif name == b"LZWDecode":
                early = 1
                if parm is not None and (em := _EARLY_RE.search(parm)):
                    early = int(em.group(1))
                out = lzw_decode(out, early_change=early)
                if parm is not None:
                    out = _apply_predictor(out, parm)
            elif name == b"ASCIIHexDecode":
                body = out.split(b">", 1)[0]
                out = _hex_string_bytes(body)
            elif name == b"ASCII85Decode":
                import base64
                body = out.split(b"~>", 1)[0]
                out = base64.a85decode(b"".join(body.split()))
            else:
                return None, name
        except Exception:
            return None, None
    return out, None


class _PdfObjects:
    """Object index + stream access over the scanned objects, with object
    streams (/Type /ObjStm, PDF 1.5+) expanded: their FlateDecoded payload
    carries N (objnum, offset) header pairs followed by the packed objects —
    each is lifted into the index like a top-level object."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.unsupported: set[bytes] = set()   # filters met but undecodable
        self.objs = _scan_objects(data)
        for oid in list(self.objs):
            body = self.objs[oid]
            if not _OBJSTM_RE.search(body[:200]):
                continue
            payload = self.stream_of(oid)
            nm = _N_RE.search(body)
            fm = _FIRST_RE.search(body)
            if payload is None or nm is None or fm is None:
                continue
            n_objs, first = int(nm.group(1)), int(fm.group(1))
            header, pos = [], 0
            ok = True
            for _ in range(n_objs * 2):
                im = _INT_RE.match(payload, pos)
                if not im:
                    ok = False
                    break
                header.append(int(im.group(1)))
                pos = im.end()
            if not ok:
                continue
            nums, offs = header[0::2], header[1::2]
            for i, (num, off) in enumerate(zip(nums, offs)):
                end = (first + offs[i + 1]) if i + 1 < n_objs else len(payload)
                self.objs.setdefault(num, payload[first + off:end])

    def get(self, oid: int, default: bytes | None = None) -> bytes | None:
        return self.objs.get(oid, default)

    def _resolve_length(self, head: bytes) -> int | None:
        lm = _LENGTH_RE.search(head)
        if lm:
            return int(lm.group(1))
        rm = _LENGTH_REF_RE.search(head)  # indirect /Length N 0 R
        if rm:
            body = self.objs.get(int(rm.group(1)))
            if body is not None:
                im = _INT_RE.match(body)
                if im:
                    return int(im.group(1))
        return None

    def stream_of(self, oid: int) -> bytes | None:
        """Decoded stream payload of an object (None: no stream / bad
        length / unsupported filter)."""
        body = self.objs.get(oid)
        if body is None:
            return None
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            return None
        head = body[:sm.start()]
        length = self._resolve_length(head)
        if length is not None and sm.end() + length <= len(body):
            raw = body[sm.end():sm.end() + length]
        else:
            fm = _STREAM_RE.search(body)
            if fm is None:
                return None
            raw = fm.group(1)
        out, unsupported = _decode_filters(raw, head)
        if unsupported is not None:
            self.unsupported.add(unsupported)
        return out


def _walk_page_tree(px: "_PdfObjects", node_id: int,
                    seen: set[int]) -> list[int]:
    """Depth-first /Kids walk: intermediate /Pages nodes recurse, leaf /Page
    nodes collect — real-world PDFs nest the page tree (lopdf get_pages
    order); cycle-guarded against corrupt trees."""
    if node_id in seen:
        return []
    seen.add(node_id)
    body = px.get(node_id, b"")
    if _PAGE_TYPE_RE.search(body):
        return [node_id]
    out: list[int] = []
    km = _KIDS_RE.search(body)
    if km:
        for r in _REF_RE.finditer(km.group(1)):
            out.extend(_walk_page_tree(px, int(r.group(1)), seen))
    return out


def _page_ids(px: "_PdfObjects") -> list[int]:
    """Page objects in tree order (nested /Kids), document-order fallback
    when the catalog/page tree is broken."""
    root_m = _ROOT_RE.search(px.data)
    if root_m:
        pm = _PAGES_REF_RE.search(px.get(int(root_m.group(1)), b""))
        if pm:
            ids = _walk_page_tree(px, int(pm.group(1)), set())
            if ids:
                return ids
    return [oid for oid in sorted(px.objs)
            if _PAGE_TYPE_RE.search(px.objs[oid])
            and not _PAGES_TYPE_RE.search(px.objs[oid])]


def pdf_metadata(data: bytes,
                 px: "_PdfObjects | None" = None) -> tuple[int, str | None]:
    """(num_pages, title) — pdf.rs:13-45: page count = page-tree leaf count
    (lopdf get_pages, incl. nested /Kids and pages packed in object
    streams); title from trailer Info first, then any object carrying
    /Title, literal or hex string, UTF-16BE-aware (lopdf
    decode_text_string). Pass ``px`` to reuse an existing object index
    (scrape_pdf_result parses each document once)."""
    px = px if px is not None else _PdfObjects(data)
    num_pages = len(_page_ids(px))
    title: str | None = None
    info_m = _INFO_RE.search(data)
    if info_m:
        body = px.get(int(info_m.group(1)))
        if body is not None:
            t = _TITLE_RE.search(body)
            if t:
                title = _string_match_text(t.group(1), t.group(2))
    if title is None:
        for oid in sorted(px.objs):
            t = _TITLE_RE.search(px.objs[oid])
            if t:
                title = _string_match_text(t.group(1), t.group(2))
                break
    return num_pages, (title.strip() if title is not None else None)


# --- font-aware decode (ToUnicode CMaps, /Differences, Type0 CID text) ----
# pdf-parse/lopdf resolve text through the page's font resources; without
# this, any PDF using a non-trivial encoding (subset-embedded fonts, CID
# fonts, symbolic encodings) extracts garbage. Slice implemented: ToUnicode
# bfchar/bfrange with scalar destinations, /Encoding /Differences glyph
# names (AGL subset + uniXXXX), Type0 2-byte codes.

_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_ENTRY_RE = re.compile(rb"/([A-Za-z0-9.+_-]+)\s+(\d+)\s+\d+\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0(?![a-zA-Z])")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_ENCODING_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+\d+\s+R")
_DIFFERENCES_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.S)
_DIFF_TOKEN_RE = re.compile(rb"(\d+)|/([A-Za-z0-9.]+)")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_HEX_RE = re.compile(rb"<([0-9a-fA-F]+)>")

# Adobe Glyph List subset: the names Differences arrays commonly carry
_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "bullet": "•",
    "emdash": "—", "endash": "–", "quotedblleft": "“",
    "quotedblright": "”", "quoteleft": "‘",
    "quoteright": "’", "ellipsis": "…", "fi": "ﬁ",
    "fl": "ﬂ", "dagger": "†", "daggerdbl": "‡",
    "Euro": "€", "sterling": "£", "yen": "¥",
    "cent": "¢", "copyright": "©", "registered": "®",
    "trademark": "™", "degree": "°", "plusminus": "±",
    "multiply": "×", "divide": "÷", "eacute": "é",
    "egrave": "è", "agrave": "à", "ccedilla": "ç",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "ntilde": "ñ", "aring": "å",
    "oslash": "ø",
}


def _glyph_char(name: str) -> str:
    """Glyph name → character: AGL subset, uniXXXX/uXXXX forms, single
    ASCII letters/digits; unknown names are dropped (pdf-parse emits
    nothing for unmapped glyphs)."""
    if name in _GLYPHS:
        return _GLYPHS[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return ""
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return ""
    if len(name) == 1 and name.isalnum():
        return name
    return ""


class _PdfFont:
    """Per-font decode info resolved from the page's /Resources."""
    __slots__ = ("two_byte", "cmap", "diffs")

    def __init__(self, two_byte: bool, cmap: dict[int, str] | None,
                 diffs: dict[int, str] | None) -> None:
        self.two_byte = two_byte
        self.cmap = cmap
        self.diffs = diffs

    def decode(self, raw: bytes) -> str:
        if self.two_byte:
            codes = [int.from_bytes(raw[i:i + 2], "big")
                     for i in range(0, len(raw) - len(raw) % 2, 2)]
        else:
            codes = list(raw)
        out: list[str] = []
        for c in codes:
            if self.cmap is not None and c in self.cmap:
                out.append(self.cmap[c])
            elif self.diffs is not None and c in self.diffs:
                out.append(self.diffs[c])
            elif not self.two_byte:
                # base-encoding fallback: StandardEncoding ≈ Latin-1 on
                # the codes a Differences array leaves untouched
                out.append(chr(c))
            # unmapped CID → dropped (matches pdf-parse)
        return "".join(out)


def _parse_tounicode(cmap_stream: bytes) -> dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap; destinations are
    UTF-16BE code units (scalar destinations; array-form bfrange is out of
    this slice)."""
    out: dict[int, str] = {}

    def dst_text(h: bytes) -> str:
        b = bytes.fromhex(h.decode("ascii"))
        if len(b) % 2:
            b = b + b"\x00"
        return b.decode("utf-16-be", errors="ignore")

    for block in _BFCHAR_RE.finditer(cmap_stream):
        hexes = _CMAP_HEX_RE.findall(block.group(1))
        for i in range(0, len(hexes) - 1, 2):
            out[int(hexes[i], 16)] = dst_text(hexes[i + 1])
    for block in _BFRANGE_RE.finditer(cmap_stream):
        hexes = _CMAP_HEX_RE.findall(block.group(1))
        for i in range(0, len(hexes) - 2, 3):
            lo, hi = int(hexes[i], 16), int(hexes[i + 1], 16)
            base = dst_text(hexes[i + 2])
            if not base:
                continue
            for c in range(lo, min(hi, lo + 65535) + 1):
                out[c] = base[:-1] + chr(ord(base[-1]) + (c - lo))
    return out


def _parse_differences(enc_body: bytes) -> dict[int, str] | None:
    dm = _DIFFERENCES_RE.search(enc_body)
    if not dm:
        return None
    diffs: dict[int, str] = {}
    code = 0
    for tok in _DIFF_TOKEN_RE.finditer(dm.group(1)):
        if tok.group(1) is not None:
            code = int(tok.group(1))
        else:
            diffs[code] = _glyph_char(tok.group(2).decode("ascii",
                                                          "replace"))
            code += 1
    return diffs


def _page_fonts(px: "_PdfObjects", page_body: bytes) -> dict[bytes, _PdfFont]:
    """Font name → decode info from the page's /Resources /Font dict
    (inline or via an indirect Resources object)."""
    target = page_body
    rm = _RESOURCES_REF_RE.search(page_body)
    if rm:
        resolved = px.get(int(rm.group(1)))
        if resolved is not None:
            target = resolved
    fm = _FONT_DICT_RE.search(target)
    if not fm:
        return {}
    fonts: dict[bytes, _PdfFont] = {}
    for entry in _FONT_ENTRY_RE.finditer(fm.group(1)):
        fbody = px.get(int(entry.group(2)))
        if fbody is None:
            continue
        two_byte = _TYPE0_RE.search(fbody) is not None
        cmap = None
        tm = _TOUNICODE_RE.search(fbody)
        if tm:
            stream = px.stream_of(int(tm.group(1)))
            if stream is not None:
                cmap = _parse_tounicode(stream)
        diffs = _parse_differences(fbody)
        if diffs is None:
            em = _ENCODING_REF_RE.search(fbody)
            if em:
                enc_body = px.get(int(em.group(1)))
                if enc_body is not None:
                    diffs = _parse_differences(enc_body)
        if cmap is not None or diffs is not None or two_byte:
            fonts[entry.group(1)] = _PdfFont(two_byte, cmap, diffs)
    return fonts


# content tokens in stream order: Tf font selection OR a text-show operator
_CONTENT_TOKEN_RE = re.compile(
    rb"/([A-Za-z0-9.+_-]+)\s+[-+0-9.]+\s+Tf"     # /F1 11 Tf
    rb"|\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"         # (s) Tj   or   (s) '
    rb"|<([0-9a-fA-F\s]*)>\s*(Tj|')"             # <hex> Tj  or  <hex> '
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ",            # [ (a) -120 <hex> ] TJ
    re.S,
)


def _decode_show(lit: bytes | None, hexs: bytes | None,
                 font: _PdfFont | None) -> str:
    if font is None:
        return _string_match_text(lit, hexs)
    raw = (_unescape_pdf_bytes(lit) if lit is not None
           else _hex_string_bytes(hexs or b""))
    return font.decode(raw)


def _content_text(content: bytes,
                  fonts: dict[bytes, _PdfFont] | None = None) -> list[str]:
    fonts = fonts or {}
    cur: _PdfFont | None = None
    lines: list[str] = []
    for m in _CONTENT_TOKEN_RE.finditer(content):
        if m.group(1) is not None:
            cur = fonts.get(m.group(1))
            continue
        if m.group(2) is not None or m.group(4) is not None:
            lines.append(_decode_show(m.group(2), m.group(4), cur))
        else:
            parts = [_decode_show(s.group(1), s.group(2), cur)
                     for s in _TJ_STR_RE.finditer(m.group(6))]
            lines.append("".join(parts))
    return lines


def pdf_text(data: bytes, px: "_PdfObjects | None" = None) -> str:
    """Text layer in page-tree order: one text-show per line, '\\n' between
    lines, '\\n\\n' between pages (the deterministic stand-in for
    pdf-parse's render_page line model). Handles hex-string operands,
    UTF-16BE text, filter chains (incl. PNG/TIFF predictors), indirect
    /Length, object streams, and font-resolved decoding (ToUnicode CMaps,
    Type0 2-byte codes, /Differences encodings) via the page's /Resources
    fonts."""
    px = px if px is not None else _PdfObjects(data)
    page_texts: list[str] = []
    for pid in _page_ids(px):
        body = px.get(pid, b"")
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        fonts = _page_fonts(px, body)
        content_ids = ([int(cm.group(1))] if cm.group(1)
                       else [int(r.group(1))
                             for r in _REF_RE.finditer(cm.group(2))])
        lines: list[str] = []
        for cid in content_ids:
            raw = px.stream_of(cid)
            if raw is not None:
                lines.extend(_content_text(raw, fonts))
        page_texts.append("\n".join(lines))
    return "\n\n".join(page_texts)


def pdf_is_encrypted(data: bytes) -> bool:
    """Trailer /Encrypt present — the engine refuses rather than misreads
    (lopdf load fails on encrypted docs → 'Failed to load PDF').

    The search is anchored to trailer *dicts* — each ``trailer`` keyword
    followed by a dict open (``trailer\\s*<<``), scanned only up to the
    following ``startxref`` — so a readable document whose *content*
    mentions '/Encrypt 5 0 R' (e.g. a PDF about PDF security) is not
    refused, and a crafted document with the bare bytes ``trailer`` in
    trailing junk cannot shrink the scanned region and fail the check
    open (encryption is never *removed* by an incremental update, so
    /Encrypt in ANY trailer dict → refuse). PDF 1.5+ cross-reference
    *streams* carry the trailer dict inside a /Type /XRef object instead —
    for those (no ``trailer`` dict) the scan is restricted to XRef-stream
    object headers, never literal strings or decoded content."""
    found_trailer = False
    for m in re.finditer(rb"trailer\s*<<", data):
        found_trailer = True
        end = data.find(b"startxref", m.start())
        if end == -1:
            end = len(data)
        # real trailer dicts are tiny; capping the span keeps a
        # content-level 'trailer <<' string (whose nearest startxref may
        # be half the file away) from widening the scan over ordinary
        # content that merely mentions /Encrypt
        region = data[m.start():min(end, m.start() + 4096)]
        if _ENCRYPT_RE.search(region):
            return True
    if found_trailer:
        return False
    for m in re.finditer(rb"/Type\s*/XRef(?![a-zA-Z])", data):
        start = data.rfind(b"obj", 0, m.start())
        end = data.find(b"stream", m.end())
        head = data[max(start, 0):end if end != -1 else m.end() + 2048]
        if _ENCRYPT_RE.search(head):
            return True
    return False


def scrape_pdf_result(
    data: bytes | None,
    max_pages: int | None = None,
    timeout_ms: int | None = None,
) -> dict:
    """engines/pdf/index.ts:87-120 result shape: escaped text as both html
    and markdown, effective page count capped at max_pages, the 150 ms/page
    insufficient-time verdict against the scrape timeout, and an ``error``
    taxonomy for refused files (the reference throws typed errors /
    'Failed to load PDF'; a DataFrame engine classifies):

      empty | not_pdf | encrypted | no_pages | insufficient_time |
      unsupported | parse_error | None (ok=True)

    ``unsupported``: the document parsed (page count/title extracted from
    the tree) but every content stream needed a codec outside the engine
    (DCTDecode/JPX scanned pages, Crypt) — refused cleanly instead of
    returning silently-empty text. Documents where at least one page
    decodes return ok=True with the partial text (pdf-parse's best-effort
    model).
    """

    def fail(error: str, *, num_pages: int = 0, title=None,
             insufficient: bool = False) -> dict:
        return {"num_pages": num_pages, "title": title, "html": "",
                "markdown": "", "insufficient_time": insufficient,
                "ok": False, "error": error}

    if not data:
        return fail("empty")
    if b"%PDF-" not in data[:1024]:
        # the reference refuses non-pdf content (index.ts:75-86); the magic
        # may follow a small preamble, never deep in the file
        return fail("not_pdf")
    if pdf_is_encrypted(data):
        return fail("encrypted")
    try:
        px = _PdfObjects(data)          # ONE parse for metadata + text
        num_pages, title = pdf_metadata(data, px=px)
        if num_pages == 0:
            # no parseable page tree — unloadable document
            return fail("no_pages", title=title)
        effective = min(num_pages, max_pages) if max_pages else num_pages
        if (timeout_ms is not None
                and effective * MILLISECONDS_PER_PAGE > timeout_ms):
            return fail("insufficient_time", num_pages=effective,
                        title=title, insufficient=True)
        text = pdf_text(data, px=px)
        if not text.strip() and px.unsupported:
            # image-only/exotic-codec document: page tree parsed, zero
            # decodable content — a clean refusal, not silent empty text
            return fail("unsupported", num_pages=effective, title=title)
        escaped = escape_html(text)
        return {"num_pages": effective, "title": title, "html": escaped,
                "markdown": escaped, "insufficient_time": False, "ok": True,
                "error": None}
    except Exception:
        return fail("parse_error")
