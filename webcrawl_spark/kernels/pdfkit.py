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


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![^/>\]]*R)")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_TITLE_RE = re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_CONTENTS_RE = re.compile(rb"/Contents\s*(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)*)\s*\])")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_INFO_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_FLATE_RE = re.compile(rb"/Filter\s*/FlateDecode")
# text-show operators inside a decoded content stream
_SHOW_RE = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"     # (s) Tj   or   (s) '
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ",        # [ (a) -120 (b) ] TJ
    re.S,
)
_TJ_STR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)", re.S)

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_pdf_string(raw: bytes) -> str:
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
    return bytes(out).decode("utf-8", errors="replace")


def _objects(data: bytes) -> dict[int, bytes]:
    """Scanning object index. Stream payloads are skipped via /Length (they
    are arbitrary bytes — compressed data can contain 'endobj'/'endstream'
    sequences, so delimiter regexes alone would truncate objects)."""
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


def pdf_metadata(data: bytes) -> tuple[int, str | None]:
    """(num_pages, title) — pdf.rs:13-45: page count from the page objects;
    title from trailer Info first, then any object carrying /Title."""
    objs = _objects(data)
    num_pages = sum(
        1 for body in objs.values()
        if _PAGE_TYPE_RE.search(body) and b"stream" not in body[:40]
    )
    title: str | None = None
    info_m = _INFO_RE.search(data)
    if info_m:
        body = objs.get(int(info_m.group(1)))
        if body is not None:
            t = _TITLE_RE.search(body)
            if t:
                title = _unescape_pdf_string(t.group(1))
    if title is None:
        for oid in sorted(objs):
            t = _TITLE_RE.search(objs[oid])
            if t:
                title = _unescape_pdf_string(t.group(1))
                break
    return num_pages, (title.strip() if title is not None else None)


def _content_text(content: bytes) -> list[str]:
    lines: list[str] = []
    for m in _SHOW_RE.finditer(content):
        if m.group(1) is not None:
            lines.append(_unescape_pdf_string(m.group(1)))
        else:
            parts = [_unescape_pdf_string(s.group(1))
                     for s in _TJ_STR_RE.finditer(m.group(3))]
            lines.append("".join(parts))
    return lines


def pdf_text(data: bytes) -> str:
    """Text layer in page order: one text-show per line, '\\n' between
    lines, '\\n\\n' between pages (the deterministic stand-in for
    pdf-parse's render_page line model)."""
    objs = _objects(data)

    def stream_of(oid: int) -> bytes | None:
        body = objs.get(oid)
        if body is None:
            return None
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            return None
        lm = _LENGTH_RE.search(body[:sm.start()])
        if lm:
            raw = body[sm.end():sm.end() + int(lm.group(1))]
        else:
            fm = _STREAM_RE.search(body)
            if fm is None:
                return None
            raw = fm.group(1)
        if _FLATE_RE.search(body[:sm.start()]):
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return None
        return raw

    page_ids: list[int] = []
    root_m = _ROOT_RE.search(data)
    pages_body = None
    if root_m:
        root_body = objs.get(int(root_m.group(1)), b"")
        pm = _PAGES_REF_RE.search(root_body)
        if pm:
            pages_body = objs.get(int(pm.group(1)))
    if pages_body is not None:
        km = _KIDS_RE.search(pages_body)
        if km:
            page_ids = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
    if not page_ids:  # fallback: document order
        page_ids = [oid for oid in sorted(objs)
                    if _PAGE_TYPE_RE.search(objs[oid])]

    page_texts: list[str] = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        content_ids = ([int(cm.group(1))] if cm.group(1)
                       else [int(r.group(1))
                             for r in _REF_RE.finditer(cm.group(2))])
        lines: list[str] = []
        for cid in content_ids:
            raw = stream_of(cid)
            if raw is not None:
                lines.extend(_content_text(raw))
        page_texts.append("\n".join(lines))
    return "\n\n".join(page_texts)


def scrape_pdf_result(
    data: bytes | None,
    max_pages: int | None = None,
    timeout_ms: int | None = None,
) -> dict:
    """engines/pdf/index.ts:87-120 result shape: escaped text as both html
    and markdown, effective page count capped at max_pages, and the
    150 ms/page insufficient-time verdict against the scrape timeout."""
    if not data:
        return {"num_pages": 0, "title": None, "html": "", "markdown": "",
                "insufficient_time": False, "ok": False}
    try:
        num_pages, title = pdf_metadata(data)
        if num_pages == 0:
            # no parseable page tree — not a PDF (the reference refuses
            # non-pdf content-types / unloadable docs, index.ts:75-86)
            return {"num_pages": 0, "title": title, "html": "",
                    "markdown": "", "insufficient_time": False, "ok": False}
        effective = min(num_pages, max_pages) if max_pages else num_pages
        if (timeout_ms is not None
                and effective * MILLISECONDS_PER_PAGE > timeout_ms):
            return {"num_pages": effective, "title": title, "html": "",
                    "markdown": "", "insufficient_time": True, "ok": False}
        escaped = escape_html(pdf_text(data))
        return {"num_pages": effective, "title": title, "html": escaped,
                "markdown": escaped, "insufficient_time": False, "ok": True}
    except Exception:
        return {"num_pages": 0, "title": None, "html": "", "markdown": "",
                "insufficient_time": False, "ok": False}
