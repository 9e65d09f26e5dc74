"""Document converter (S4): xlsx/docx/odt/rtf bytes → HTML, feeding the
standard html→markdown pipeline like any fetched page. Word-processor
providers cover paragraphs/headings/blockquotes, full character styling
(bold/italic/strike/code/sup/sub, line breaks), nested lists, hyperlinks,
external images, tables, and footnotes/endnotes/comments rendered as the
reference's end-of-body sections.

Mirrors the reference document stack:
- provider: packages/firecrawl-rs/src/document/providers/xlsx.rs:19-73 —
  per sheet an H2 heading + a table; every cell a single normal paragraph
  (empty cells → no blocks); calamine Data→string formatting
  (floats via Rust f64::to_string → no trailing '.0').
- renderer: packages/firecrawl-rs/src/document/renderers/html.rs:11-237 —
  maud markup: `<!DOCTYPE html><html lang="en"><head>…<title>Document
  </title></head><body><main>{blocks}</main></body></html>`; table rows in
  <tbody>; a cell whose blocks are exactly one normal paragraph renders its
  inlines bare (render_blocks_inline, html.rs:104-115) — so `<td>text</td>`,
  not `<td><p>text</p></td>`; maud escapes & < > " in text.

The xlsx reader implements the minimal OOXML slice (workbook.xml sheet
order, workbook rels, sharedStrings, inline strings, n/b/str cell types,
calamine-style bounding-rectangle ranges) over zipfile + stdlib XML — no
third-party deps. ``build_xlsx`` is the deterministic writer used by tests
and the synthetic corpus (fixed zip timestamps).
"""

from __future__ import annotations

import io
import re
import zipfile
from dataclasses import dataclass, field
from xml.etree import ElementTree as ET

__all__ = [
    "Document", "Block", "Inline", "ListItem", "xlsx_to_document",
    "render_document_html",
    "xlsx_to_html", "build_xlsx", "docx_to_document", "docx_to_html",
    "build_docx", "odt_to_document", "odt_to_html", "build_odt",
    "rtf_to_document", "rtf_to_html", "convert_document",
]

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "rel": "http://schemas.openxmlformats.org/package/2006/relationships",
}


@dataclass
class Inline:
    """Styled text run (document/mod.rs Inline: Text/Strong/Em/Del/Code/
    Sup/Sub/Link/LineBreak/Bookmark + note/comment refs). Rendering nests
    per ResolvedRunStyle::apply (docx.rs:520-536): del innermost, then em,
    strong, and sup/sub outermost; the link outermost of all (Inline::Link
    wraps styled children, docx.rs:634-653); adjacent runs sharing an href
    render inside ONE <a>. ``code`` replaces the run's other styling with
    a bare <code> (docx.rs:618-630 early return)."""
    text: str = ""           # for ref kinds: the note/comment id
    bold: bool = False
    italic: bool = False
    href: str | None = None
    strike: bool = False
    code: bool = False
    vert: str | None = None  # "sup" | "sub" (w:vertAlign / text-position)
    # "text" | "br" | "footnote_ref" | "endnote_ref" | "comment_ref"
    # | "bookmark" (html.rs:224-236 special inlines)
    kind: str = "text"


@dataclass
class ListItem:
    """List item with optional nested sublists (document/mod.rs ListItem:
    blocks = [Paragraph?, List...]). Rendering follows render_blocks_inline
    (html.rs:100-110): inlines alone → bare; inlines + sublists →
    <p>inlines</p> followed by the nested <ol>/<ul>; sublists alone → just
    the nested lists."""
    inlines: list[Inline] = field(default_factory=list)
    sublists: list["Block"] = field(default_factory=list)


@dataclass
class Block:
    """Subset of the reference document model needed by the spreadsheet and
    word-processor providers: paragraphs (normal/heading/blockquote) with
    optional styled runs, flat lists, and body tables of text cells."""
    kind: str   # "paragraph" | "heading" | "blockquote" | "table" | "list" | "image"
    level: int = 2
    text: str = ""
    rows: list[list[str]] = field(default_factory=list)
    # styled runs; None → render the plain ``text``
    inlines: list[Inline] | None = None
    # list blocks (html.rs:191-200: <ol>/<ul> of <li>); items are plain
    # list[Inline] (flat) or ListItem (carries nested sublists)
    ordered: bool = False
    items: list = field(default_factory=list)
    # image blocks (html.rs:203-208; EXTERNAL http(s) images only —
    # embedded package media is dropped, docx.rs:979-990)
    src: str = ""
    alt: str | None = None


@dataclass
class Document:
    blocks: list[Block] = field(default_factory=list)
    title: str | None = None
    # <meta name="author"> in the rendered head (html.rs:33-36)
    author: str | None = None
    # (id, blocks) in document order (document/mod.rs Note; separator
    # pseudo-notes excluded, docx.rs:1013-1027)
    footnotes: list[tuple[str, list[Block]]] = field(default_factory=list)
    endnotes: list[tuple[str, list[Block]]] = field(default_factory=list)
    # (id, author_name, author_initials, blocks) (document/mod.rs Comment)
    comments: list[tuple[str, str | None, str | None, list[Block]]] = \
        field(default_factory=list)


def _fmt_float(v: float) -> str:
    """calamine Data::Float → Rust f64::to_string (xlsx.rs:79): integral
    values print without a fractional part, and exponent notation is NEVER
    emitted ('10000000000000000', '0.00001' — not '1e+16', '1e-05'), so
    repr()'s e-notation is expanded to a plain decimal string."""
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    s = repr(v)
    if "e" not in s and "E" not in s:
        return s
    from decimal import Decimal
    return format(Decimal(s), "f")


def _cell_ref_col(ref: str) -> int:
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return col - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        parts = [t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")]
        out.append("".join(parts))
    return out


def _cell_value(c: ET.Element, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        if is_el is None:
            return ""
        return "".join(tt.text or "" for tt in is_el.iter(f"{{{_NS['m']}}}t"))
    v = c.find("m:v", _NS)
    raw = (v.text or "") if v is not None else ""
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "true" if raw.strip() == "1" else "false"
    if t == "str":
        return raw
    if raw == "":
        return ""
    try:
        return _fmt_float(float(raw))
    except ValueError:
        return raw


def xlsx_to_document(data: bytes) -> Document:
    """xlsx.rs:19-67: per sheet (workbook order) an H2 heading block + one
    table block over the sheet's calamine range (bounding rectangle of used
    cells; missing cells render empty)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = {}
    try:
        rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.findall("rel:Relationship", _NS):
            rels[rel.get("Id")] = rel.get("Target")
    except KeyError:
        pass
    shared = _shared_strings(zf)

    doc = Document()
    sheets_el = wb.find("m:sheets", _NS)
    for idx, sheet in enumerate(sheets_el.findall("m:sheet", _NS), start=1):
        name = sheet.get("name", f"Sheet{idx}")
        rid = sheet.get(f"{{{_NS['r']}}}id")
        target = rels.get(rid, f"worksheets/sheet{idx}.xml")
        path = "xl/" + target.lstrip("/") if not target.startswith("xl/") \
            else target
        doc.blocks.append(Block(kind="heading", level=2, text=name))
        try:
            ws = ET.fromstring(zf.read(path))
        except KeyError:
            doc.blocks.append(Block(kind="table", rows=[]))
            continue
        # collect used cells with positions
        cells: dict[tuple[int, int], str] = {}
        min_c = min_r = 1 << 30
        max_c = max_r = -1
        for r_idx, row in enumerate(ws.iter(f"{{{_NS['m']}}}row")):
            rnum = int(row.get("r", r_idx + 1)) - 1
            for c_idx, c in enumerate(row.findall("m:c", _NS)):
                ref = c.get("r")
                cnum = _cell_ref_col(ref) if ref else c_idx
                val = _cell_value(c, shared)
                cells[(rnum, cnum)] = val
                if val != "" or c.get("t") or c.find("m:v", _NS) is not None:
                    min_c, max_c = min(min_c, cnum), max(max_c, cnum)
                    min_r, max_r = min(min_r, rnum), max(max_r, rnum)
        rows: list[list[str]] = []
        if max_r >= 0:
            for rnum in range(min_r, max_r + 1):
                rows.append([
                    cells.get((rnum, cnum), "")
                    for cnum in range(min_c, max_c + 1)
                ])
        doc.blocks.append(Block(kind="table", rows=rows))
    return doc


# --- docx provider (useful-slice subset of providers/docx.rs) ---------------

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _w(tag: str) -> str:
    return f"{{{_W}}}{tag}"


def _para_text(p: ET.Element) -> str:
    return "".join(t.text or "" for t in p.iter(_w("t")))


def _read_on_off(el: ET.Element | None) -> bool | None:
    """docx.rs:539-546 read_on_off: missing element → None (inherit);
    present without val → True; val 0/false/off → False; else True."""
    if el is None:
        return None
    v = (el.get(_w("val")) or el.get("val"))
    if v is None:
        return True
    return v.lower() not in ("0", "false", "off")


_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _docx_rels(zf: zipfile.ZipFile,
               path: str = "word/_rels/document.xml.rels") -> dict[str, str]:
    """A part's .rels: rId → Target (hyperlink resolution, docx.rs:634-638;
    notes/comments resolve through their own rels part, docx.rs:50-70)."""
    try:
        root = ET.fromstring(zf.read(path))
    except KeyError:
        return {}
    return {
        rel.get("Id"): rel.get("Target") or ""
        for rel in root.findall("rel:Relationship", _NS)
    }


def _ooxml_core_meta(zf: zipfile.ZipFile,
                     part: str) -> tuple[str | None, str | None]:
    """(title, author) from docProps/core.xml (docx.rs:133-171
    read_core_properties) or ODF meta.xml (odt.rs:205-236 read_meta):
    elements matched by local name — dc:title text (trimmed, non-empty),
    dc:creator (or ODF initial-creator) unless it says 'unknown'."""
    try:
        root = ET.fromstring(zf.read(part))
    except (KeyError, ET.ParseError):
        return None, None
    title = author = None
    fallback_author = None
    for el in root.iter():
        name = _lname(el.tag)
        text = (el.text or "").strip()
        if name == "title" and text and title is None:
            title = text
        elif name == "creator" and text and author is None:
            if text.lower() != "unknown":
                author = text
        elif name == "initial-creator" and text and fallback_author is None:
            if text.lower() != "unknown":
                fallback_author = text
    return title, author if author is not None else fallback_author


def _run_style(rpr: ET.Element | None) -> dict:
    """run_style_from_rpr (docx.rs:547-577): b/i/strike on-off toggles,
    rStyle whose id contains 'code' → code, vertAlign sup/sub. None values
    mean 'inherit' (RunStyle's Option fields) — resolved against the
    paragraph's pPr/rPr base by _resolve_style."""
    st = {"bold": None, "italic": None, "strike": None, "code": None,
          "vert": None}
    if rpr is None:
        return st
    st["bold"] = _read_on_off(rpr.find(_w("b")))
    st["italic"] = _read_on_off(rpr.find(_w("i")))
    st["strike"] = _read_on_off(rpr.find(_w("strike")))
    rstyle = rpr.find(_w("rStyle"))
    if rstyle is not None:
        v = rstyle.get(_w("val")) or rstyle.get("val") or ""
        if "code" in v.lower():
            st["code"] = True
    va = rpr.find(_w("vertAlign"))
    if va is not None:
        v = (va.get(_w("val")) or va.get("val") or "").lower()
        if v in ("sup", "superscript"):
            st["vert"] = "sup"
        elif v in ("sub", "subscript"):
            st["vert"] = "sub"
    return st


def _resolve_style(base: dict, local: dict) -> dict:
    """RunStyle::resolve_with (docx.rs:505-517): local Option fields win
    when set, else the paragraph base, else off. ``vert`` has no 'off'
    sentinel below baseline, so local-over-base coalescing matches
    vert_align's Option::or."""
    return {
        k: (local[k] if local[k] is not None else base[k]) or
           (None if k == "vert" else False)
        for k in base
    }


def _run_inlines(p: ET.Element,
                 rels: dict[str, str] | None = None) -> list[Inline]:
    """Paragraph runs with local rPr styling (docx.rs:547-577
    run_style_from_rpr: bold/italic/strike toggles, code rStyle, vertAlign
    sup/sub), run children in document order (docx.rs:594-617: w:t text,
    w:br line breaks, w:tab → '\\t', footnote/endnote/comment references),
    and w:hyperlink resolution (r:id → rels target, or w:anchor →
    '#anchor', docx.rs:634-653; runs inside the hyperlink carry its href).
    A code run collapses to its concatenated text, dropping refs
    (docx.rs:618-630). Run styles resolve against the paragraph's own
    pPr/rPr base (paragraph_run_style, docx.rs:288-298); hyperlink rPr
    merges over that base for its contained runs (docx.rs:640-646).
    styles.xml carries no run-style chain in the reference either (only
    heading detection) — parity holds. Runs yielding no inlines are
    dropped."""
    out: list[Inline] = []
    rels = rels or {}
    ppr = p.find(_w("pPr"))
    para_base = _run_style(ppr.find(_w("rPr")) if ppr is not None else None)

    def run_of(r: ET.Element, href: str | None, base: dict) -> None:
        st = _resolve_style(base, _run_style(r.find(_w("rPr"))))
        items: list[Inline] = []
        for ch in r:
            tag = ch.tag
            if tag == _w("t"):
                if ch.text:
                    items.append(Inline(text=ch.text, href=href, **st))
            elif tag == _w("br"):
                items.append(Inline(kind="br", href=href, **st))
            elif tag == _w("tab"):
                items.append(Inline(text="\t", href=href, **st))
            elif tag in (_w("footnoteReference"), _w("endnoteReference"),
                         _w("commentReference")):
                rid = ch.get(_w("id")) or ch.get("id")
                if rid is not None:
                    kind = {_w("footnoteReference"): "footnote_ref",
                            _w("endnoteReference"): "endnote_ref",
                            _w("commentReference"): "comment_ref"}[tag]
                    items.append(Inline(text=rid, kind=kind, href=href,
                                        **st))
        if st["code"]:
            code_text = "".join(i.text for i in items if i.kind == "text")
            items = ([Inline(text=code_text, code=True, href=href)]
                     if code_text else [])
        out.extend(items)

    def walk(node: ET.Element, href: str | None, base: dict) -> None:
        for ch in node:
            if ch.tag == _w("r"):
                run_of(ch, href, base)
            elif ch.tag == _w("hyperlink"):
                rid = ch.get(f"{{{_R_NS}}}id") or ch.get("id")
                anchor = ch.get(_w("anchor")) or ch.get("anchor")
                target = (rels.get(rid) if rid
                          else (f"#{anchor}" if anchor else None))
                # link rPr merges OVER the base for contained runs
                # (docx.rs:640-646 merged: Option.or, stays inheritable)
                lrpr = _run_style(ch.find(_w("rPr")))
                merged = {k: lrpr[k] if lrpr[k] is not None else base[k]
                          for k in base}
                walk(ch, target if target else href, merged)
            else:
                walk(ch, href, base)

    walk(p, None, para_base)
    return out


def _docx_numbering(zf: zipfile.ZipFile) -> dict[tuple[str, str], bool]:
    """word/numbering.xml → (numId, ilvl) → ordered? (docx.rs:718-757:
    num → abstractNumId, abstract levels' numFmt: 'bullet' → unordered,
    anything else → ordered)."""
    try:
        root = ET.fromstring(zf.read("word/numbering.xml"))
    except KeyError:
        return {}
    abstract: dict[str, dict[str, bool]] = {}
    for an in root.findall(_w("abstractNum")):
        aid = an.get(_w("abstractNumId")) or an.get("abstractNumId") or ""
        levels: dict[str, bool] = {}
        for lvl in an.findall(_w("lvl")):
            ilvl = lvl.get(_w("ilvl")) or lvl.get("ilvl") or "0"
            fmt_el = lvl.find(_w("numFmt"))
            fmt = (fmt_el.get(_w("val")) or fmt_el.get("val") or ""
                   if fmt_el is not None else "")
            levels[ilvl] = fmt != "bullet"
        abstract[aid] = levels
    out: dict[tuple[str, str], bool] = {}
    for num in root.findall(_w("num")):
        nid = num.get(_w("numId")) or num.get("numId") or ""
        ref = num.find(_w("abstractNumId"))
        aid = (ref.get(_w("val")) or ref.get("val") or "") \
            if ref is not None else ""
        for ilvl, ordered in abstract.get(aid, {}).items():
            out[(nid, ilvl)] = ordered
    return out


def _lname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _attr_local(el: ET.Element, name: str) -> str | None:
    """Attribute by local name regardless of namespace (get_attr_local)."""
    for k, v in el.attrib.items():
        if _lname(k) == name:
            return v
    return None


def _docx_image_block(p: ET.Element,
                      rels: dict[str, str]) -> Block | None:
    """Image paragraph (docx.rs:925-990): a paragraph with NO visible text
    whose drawing blip (r:embed/r:link) or VML imagedata (r:id) resolves
    through rels to an EXTERNAL http(s) target; alt from docPr descr/title
    (drawing) or imagedata title (VML). Embedded package media is dropped."""
    if _para_text(p).strip():
        return None
    for node in p.iter():
        if _lname(node.tag) == "drawing":
            blip = next((n for n in node.iter()
                         if _lname(n.tag) == "blip"), None)
            if blip is None:
                continue
            rid = _attr_local(blip, "embed") or _attr_local(blip, "link")
            docpr = next((n for n in node.iter()
                          if _lname(n.tag) == "docPr"), None)
            alt = (_attr_local(docpr, "descr") or _attr_local(docpr, "title")
                   if docpr is not None else None)
            target = rels.get(rid or "")
            if target and target.startswith(("http://", "https://")):
                return Block(kind="image", src=target, alt=alt)
        elif _lname(node.tag) == "pict":
            data = next((n for n in node.iter()
                         if _lname(n.tag) == "imagedata"), None)
            if data is None:
                continue
            rid = _attr_local(data, "id")
            target = rels.get(rid or "")
            if target and target.startswith(("http://", "https://")):
                return Block(kind="image", src=target,
                             alt=_attr_local(data, "title"))
    return None


def _docx_list_info(
    p: ET.Element, numbering: dict[tuple[str, str], bool],
) -> tuple[str, bool, int] | None:
    """(numId, ordered, ilvl) when the paragraph carries numPr
    (docx.rs:760-774 paragraph_list_info; unknown numId → unordered)."""
    ppr = p.find(_w("pPr"))
    if ppr is None:
        return None
    numpr = ppr.find(_w("numPr"))
    if numpr is None:
        return None
    nid_el = numpr.find(_w("numId"))
    ilvl_el = numpr.find(_w("ilvl"))
    if nid_el is None:
        return None
    nid = nid_el.get(_w("val")) or nid_el.get("val") or ""
    ilvl = (ilvl_el.get(_w("val")) or ilvl_el.get("val") or "0") \
        if ilvl_el is not None else "0"
    return (nid, numbering.get((nid, ilvl), False),
            int(ilvl) if ilvl.isdigit() else 0)


def _parse_docx_list(
    nodes: list[ET.Element], i: int,
    numbering: dict[tuple[str, str], bool], rels: dict[str, str],
) -> tuple[Block, int]:
    """Consecutive numPr paragraphs → one list block, deeper ilvl runs →
    nested sublists attached to the preceding item (docx.rs:826-900
    parse_list: breaks on shallower ilvl or same-level numId/type change;
    a trailing item that gained no content is dropped)."""
    base_nid, base_ordered, base_ilvl = _docx_list_info(nodes[i], numbering)
    block = Block(kind="list", ordered=base_ordered)
    while i < len(nodes):
        node = nodes[i]
        if node.tag != _w("p"):
            break
        info = _docx_list_info(node, numbering)
        if info is None:
            break
        nid, ordered, ilvl = info
        if ilvl < base_ilvl:
            break
        if ilvl == base_ilvl and (ordered != base_ordered
                                  or nid != base_nid):
            break
        if ilvl > base_ilvl:
            # deeper run with no preceding base item: recurse anyway so the
            # content survives (reference reaches this only via the inner
            # loop; a leading deeper item would otherwise stall)
            sub, i = _parse_docx_list(nodes, i, numbering, rels)
            if not block.items:
                block.items.append(ListItem())
            block.items[-1].sublists.append(sub)
            continue
        runs = _run_inlines(node, rels)
        item = ListItem(
            inlines=runs if any(r.text.strip() for r in runs) else [])
        block.items.append(item)
        i += 1
        while i < len(nodes) and nodes[i].tag == _w("p"):
            sub_info = _docx_list_info(nodes[i], numbering)
            if sub_info is None or sub_info[2] <= base_ilvl:
                break
            sub, i = _parse_docx_list(nodes, i, numbering, rels)
            if sub.items:
                item.sublists.append(sub)
    if block.items and not block.items[-1].inlines \
            and not block.items[-1].sublists:
        block.items.pop()
    return block, i


def _docx_styles(zf: zipfile.ZipFile) -> dict[str, tuple[str, int | None,
                                                         int | None]]:
    """word/styles.xml: styleId → (display name, heading level from the
    style's own outlineLvl or None, default half-point font size from the
    style's rPr/sz or None) — docx.rs:180-245 read_styles."""
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except KeyError:
        return {}
    out: dict[str, tuple[str, int | None, int | None]] = {}
    for st in root.findall(_w("style")):
        sid = st.get(_w("styleId")) or st.get("styleId") or ""
        if not sid:
            continue
        name_el = st.find(_w("name"))
        name = ((name_el.get(_w("val")) or name_el.get("val") or "")
                if name_el is not None else "")
        lvl = None
        ppr = st.find(_w("pPr"))
        if ppr is not None:
            ol = ppr.find(_w("outlineLvl"))
            if ol is not None:
                v = ol.get(_w("val")) or ol.get("val")
                if v and v.isdigit():
                    lvl = min(int(v) + 1, 6)
        sz = None
        rpr = st.find(_w("rPr"))
        if rpr is not None:
            sz_el = rpr.find(_w("sz"))
            if sz_el is not None:
                v = sz_el.get(_w("val")) or sz_el.get("val")
                if v and v.isdigit():
                    sz = int(v)
        out[sid] = (name, lvl, sz)
    return out


def _para_style_id(p: ET.Element) -> str | None:
    ppr = p.find(_w("pPr"))
    if ppr is None:
        return None
    st = ppr.find(_w("pStyle"))
    if st is None:
        return None
    return st.get(_w("val")) or st.get("val")


def _para_effective_size(p: ET.Element, styles: dict,
                         sid: str) -> int | None:
    """docx.rs:399-423 paragraph_effective_size: max sz over the
    paragraph's pPr/rPr and its runs' rPr, else the style's default."""
    max_sz: int | None = None
    ppr = p.find(_w("pPr"))
    if ppr is not None:
        rpr = ppr.find(_w("rPr"))
        if rpr is not None:
            sz_el = rpr.find(_w("sz"))
            if sz_el is not None:
                v = sz_el.get(_w("val")) or sz_el.get("val")
                if v and v.isdigit():
                    max_sz = int(v)
    for r in p.findall(_w("r")):
        rpr = r.find(_w("rPr"))
        if rpr is None:
            continue
        sz_el = rpr.find(_w("sz"))
        if sz_el is not None:
            v = sz_el.get(_w("val")) or sz_el.get("val")
            if v and v.isdigit():
                max_sz = int(v) if max_sz is None else max(max_sz, int(v))
    if max_sz is not None:
        return max_sz
    return styles.get(sid, ("", None, None))[2]


def _docx_size_buckets(root: ET.Element,
                       styles: dict) -> dict[str, list[int]]:
    """docx.rs:425-466 compute_style_size_buckets_for_doc: for each
    heading/title-named style, the distinct effective sizes its
    paragraphs use, sorted DESCENDING — a document using 'Heading 1' at
    three sizes demotes the smaller ones by their bucket index."""
    sets: dict[str, set[int]] = {}
    for p in root.iter(_w("p")):
        sid = _para_style_id(p)
        if not sid:
            continue
        name = styles.get(sid, ("", None, None))[0]
        id_l, name_l = sid.lower(), name.lower()
        if not ("heading" in id_l or "title" in id_l
                or "heading" in name_l or "title" in name_l):
            continue
        sz = _para_effective_size(p, styles, sid)
        if sz is not None:
            sets.setdefault(sid, set()).add(sz)
    return {k: sorted(v, reverse=True) for k, v in sets.items()}


def _parse_heading_level(s: str) -> int | None:
    """docx.rs:382-397: digits after 'heading' (skipping spaces/dashes)."""
    lower = s.lower()
    idx = lower.find("heading")
    if idx < 0:
        return None
    rest = lower[idx + len("heading"):]
    k = 0
    while k < len(rest) and (rest[k].isspace() or rest[k] == "-"):
        k += 1
    digits = ""
    while k < len(rest) and rest[k].isdigit():
        digits += rest[k]
        k += 1
    if digits and int(digits) >= 1:
        return min(int(digits), 6)
    return None


def _para_kind(p: ET.Element,
               styles: dict | None = None,
               size_buckets: dict[str, list[int]] | None = None,
               ) -> tuple[str, int]:
    """docx.rs:317-379 paragraph_kind: direct outlineLvl → Heading(v+1, ≤6);
    else pStyle resolved through styles.xml (style's own outlineLvl → its
    display name's 'heading N' → the style id's 'heading N' → title/heading/
    quote substring fallbacks on name and id), then the font-size-bucket
    demotion: within one heading style, a paragraph whose effective size
    sits at index i of the style's descending size list renders i levels
    deeper (docx.rs:367-377, capped at 6)."""
    styles = styles or {}
    size_buckets = size_buckets or {}
    ppr = p.find(_w("pPr"))
    if ppr is None:
        return "paragraph", 0
    lvl = ppr.find(_w("outlineLvl"))
    if lvl is not None:
        v = lvl.get(_w("val")) or lvl.get("val")
        if v is not None and v.isdigit():
            return "heading", min(int(v) + 1, 6)
    st = ppr.find(_w("pStyle"))
    if st is not None:
        sid = st.get(_w("val")) or st.get("val") or ""
        name, style_lvl, _ = styles.get(sid, ("", None, None))
        base: int | None = style_lvl
        if base is None and name:
            base = _parse_heading_level(name)
            if base is None and "quote" in name.lower():
                return "blockquote", 0
        if base is None:
            base = _parse_heading_level(sid)
        if base is None:
            id_l, name_l = sid.lower(), name.lower()
            if "title" in name_l or "title" in id_l:
                base = 1
            elif "heading" in name_l or "heading" in id_l:
                base = 2
            elif "quote" in name_l or "quote" in id_l:
                return "blockquote", 0
        if base is not None:
            buckets = size_buckets.get(sid)
            if buckets:
                sz = _para_effective_size(p, styles, sid)
                if sz is not None and sz in buckets:
                    base = min(base + buckets.index(sz), 6)
            return "heading", base
    return "paragraph", 0


def _runs_styled(runs: list[Inline]) -> list[Inline] | None:
    """The styled-runs gate: keep the run list when any run carries
    styling, an href, or is a special inline (br/refs); plain text renders
    through Block.text."""
    if any(r.bold or r.italic or r.href or r.strike or r.code or r.vert
           or r.kind != "text" for r in runs):
        return runs
    return None


def _docx_blocks(nodes: list[ET.Element],
                 numbering: dict[tuple[str, str], bool],
                 rels: dict[str, str],
                 styles: dict,
                 size_buckets: dict[str, list[int]] | None = None,
                 ) -> list[Block]:
    """Block sequence of a body-like container (document body, footnote/
    endnote/comment content — docx.rs parse_block_children): paragraphs
    with heading/blockquote detection (docx.rs:317-379), styled runs,
    numbered/bulleted lists with nested sublists (docx.rs:760-900), image
    paragraphs, and tables of flattened cell text."""
    blocks: list[Block] = []
    i = 0
    while i < len(nodes):
        node = nodes[i]
        if node.tag == _w("p"):
            if _docx_list_info(node, numbering) is not None:
                block, i = _parse_docx_list(nodes, i, numbering, rels)
                if block.items:
                    blocks.append(block)
                continue
            img = _docx_image_block(node, rels)
            if img is not None:
                blocks.append(img)
                i += 1
                continue
            runs = _run_inlines(node, rels)
            text = _para_text(node)
            if not text.strip() and not any(r.kind != "text" for r in runs):
                i += 1
                continue
            kind, level = _para_kind(node, styles, size_buckets)
            blocks.append(Block(kind=kind, level=level or 2, text=text,
                                inlines=_runs_styled(runs)))
        elif node.tag == _w("tbl"):
            rows = [
                [_para_text(tc) for tc in tr.findall(_w("tc"))]
                for tr in node.findall(_w("tr"))
            ]
            blocks.append(Block(kind="table", rows=rows))
        i += 1
    return blocks


def docx_to_document(data: bytes) -> Document:
    """Useful-slice docx provider (providers/docx.rs subset): body blocks
    via _docx_blocks, plus footnotes/endnotes (word/footnotes.xml /
    endnotes.xml, separator pseudo-notes skipped — docx.rs:995-1037
    read_notes) and comments (word/comments.xml with author/initials —
    docx.rs:1039-1075 read_comments), each parsed with its own rels part.
    styles.xml-based run-style inheritance is out of this subset — the
    operator seam and renderer are shared, so adding it extends this
    function only."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    root = ET.fromstring(zf.read("word/document.xml"))
    numbering = _docx_numbering(zf)
    rels = _docx_rels(zf)
    styles = _docx_styles(zf)
    body = root.find(_w("body"))
    doc = Document()
    doc.title, doc.author = _ooxml_core_meta(zf, "docProps/core.xml")
    if body is None:
        return doc
    # size buckets computed once from the MAIN document's paragraphs and
    # shared with the note parts (docx.rs:34,41-81)
    size_buckets = _docx_size_buckets(root, styles)
    doc.blocks = _docx_blocks(list(body), numbering, rels, styles,
                              size_buckets)

    for part, tag, sink in (("footnotes", "footnote", doc.footnotes),
                            ("endnotes", "endnote", doc.endnotes)):
        try:
            nroot = ET.fromstring(zf.read(f"word/{part}.xml"))
        except KeyError:
            continue
        nrels = _docx_rels(zf, f"word/_rels/{part}.xml.rels")
        for n in nroot.iter(_w(tag)):
            nid = n.get(_w("id")) or n.get("id")
            if nid is None:
                continue
            ntype = n.get(_w("type")) or n.get("type")
            if ntype in ("separator", "continuationSeparator"):
                continue
            sink.append((nid, _docx_blocks(list(n), numbering, nrels,
                                           styles, size_buckets)))
    try:
        croot = ET.fromstring(zf.read("word/comments.xml"))
    except KeyError:
        croot = None
    if croot is not None:
        crels = _docx_rels(zf, "word/_rels/comments.xml.rels")
        for c in croot.iter(_w("comment")):
            cid = c.get(_w("id")) or c.get("id")
            if cid is None:
                continue
            doc.comments.append((
                cid,
                c.get(_w("author")) or c.get("author"),
                c.get(_w("initials")) or c.get("initials"),
                _docx_blocks(list(c), numbering, crels, styles,
                             size_buckets),
            ))
    return doc


def docx_to_html(data: bytes) -> str:
    return render_document_html(docx_to_document(data))


def build_docx(blocks: list[tuple], footnotes: dict | None = None,
               endnotes: dict | None = None,
               comments: list[tuple] | None = None,
               title: str | None = None,
               author: str | None = None) -> bytes:
    """Deterministic minimal docx writer for tests/synthetic corpora.
    blocks: ("p"|"h1".."h6"|"quote", text_or_runs), ("table", rows), or
    ("ol"|"ul", [item_text_or_runs, ...]); text_or_runs is a plain string
    or a list of (text, style) runs with style ⊆ {"b","i","s","c","^","_"}
    (bold, italic, strike, code rStyle, superscript, subscript — e.g.
    "bi"). Special runs: ("#br",) line break, ("#fn", id) / ("#en", id) /
    ("#cm", id) note/comment references (emitted with the typical Word
    superscript-reference rPr for fn/en).
    footnotes/endnotes: {id: [paragraph_payload, ...]} — written to
    word/footnotes.xml / endnotes.xml including Word's separator
    pseudo-notes (ids -1/0, which readers must skip).
    comments: [(id, author, initials, [paragraph_payload, ...])]."""
    def esc(t: str) -> str:
        return (t.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    hyperlinks: list[str] = []

    def rpr_xml(style: str) -> str:
        if not style:
            return ""
        props = ("<w:b/>" if "b" in style else "") + \
                ("<w:i/>" if "i" in style else "") + \
                ("<w:strike/>" if "s" in style else "") + \
                ('<w:rStyle w:val="CodeChar"/>' if "c" in style else "") + \
                ('<w:vertAlign w:val="superscript"/>' if "^" in style
                 else "") + \
                ('<w:vertAlign w:val="subscript"/>' if "_" in style else "")
        return f"<w:rPr>{props}</w:rPr>"

    def runs_xml(payload) -> str:
        if isinstance(payload, str):
            payload = [(payload, "")]
        out = []
        for run in payload:
            if run[0] == "#br":
                out.append("<w:r><w:br/></w:r>")
                continue
            if run[0] in ("#fn", "#en", "#cm"):
                tag = {"#fn": "footnoteReference",
                       "#en": "endnoteReference",
                       "#cm": "commentReference"}[run[0]]
                rpr = ("" if run[0] == "#cm" else
                       '<w:rPr><w:rStyle w:val="FootnoteReference"/>'
                       '<w:vertAlign w:val="superscript"/></w:rPr>')
                out.append(f'<w:r>{rpr}<w:{tag} w:id="{run[1]}"/></w:r>')
                continue
            text, style = run[0], run[1]
            href = run[2] if len(run) > 2 else None
            r = (f'<w:r>{rpr_xml(style)}<w:t xml:space="preserve">'
                 f"{esc(text)}</w:t></w:r>")
            if href:
                if href.startswith("#"):
                    r = f'<w:hyperlink w:anchor="{esc(href[1:])}">{r}</w:hyperlink>'
                else:
                    hyperlinks.append(href)
                    rid = f"rIdH{len(hyperlinks)}"
                    r = f'<w:hyperlink r:id="{rid}">{r}</w:hyperlink>'
            out.append(r)
        return "".join(out)

    parts = []
    has_list = False
    for b in blocks:
        kind, payload = b
        if kind == "table":
            trs = "".join(
                "<w:tr>" + "".join(
                    f"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">{esc(c)}"
                    "</w:t></w:r></w:p></w:tc>" for c in row
                ) + "</w:tr>"
                for row in payload
            )
            parts.append(f"<w:tbl>{trs}</w:tbl>")
            continue
        if kind == "img":
            src, alt = payload if isinstance(payload, tuple) else (payload,
                                                                   None)
            hyperlinks.append(src)
            rid = f"rIdH{len(hyperlinks)}"
            descr = f' descr="{esc(alt)}"' if alt else ""
            parts.append(
                '<w:p><w:drawing xmlns:wp="http://schemas.openxmlformats.'
                'org/drawingml/2006/wordprocessingDrawing" xmlns:a="http://'
                'schemas.openxmlformats.org/drawingml/2006/main">'
                f'<wp:docPr id="1" name="img"{descr}/>'
                f'<a:blip r:embed="{rid}"/></w:drawing></w:p>'
            )
            continue
        if kind in ("ol", "ul"):
            has_list = True
            num_id = 1 if kind == "ol" else 2
            for item in payload:
                # item = text_or_runs at ilvl 0, or (ilvl, text_or_runs)
                if (isinstance(item, tuple) and len(item) == 2
                        and isinstance(item[0], int)):
                    ilvl, content = item
                else:
                    ilvl, content = 0, item
                parts.append(
                    f"<w:p><w:pPr><w:numPr><w:ilvl w:val=\"{ilvl}\"/>"
                    f"<w:numId w:val=\"{num_id}\"/></w:numPr></w:pPr>"
                    f"{runs_xml(content)}</w:p>"
                )
            continue
        ppr = ""
        if kind.startswith("h") and kind[1:].isdigit():
            ppr = f'<w:pPr><w:pStyle w:val="Heading{kind[1:]}"/></w:pPr>'
        elif kind == "quote":
            ppr = '<w:pPr><w:pStyle w:val="Quote"/></w:pPr>'
        parts.append(f"<w:p>{ppr}{runs_xml(payload)}</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}" xmlns:r="{_R_NS}"><w:body>'
        + "".join(parts) + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        def write(name: str, content: str) -> None:
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)

        write("[Content_Types].xml",
              '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
              'content-types">'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Default Extension="rels" ContentType="application/'
              'vnd.openxmlformats-package.relationships+xml"/>'
              '<Override PartName="/word/document.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.'
              'wordprocessingml.document.main+xml"/></Types>')
        write("_rels/.rels",
              '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              f'<Relationships xmlns="{_NS["rel"]}">'
              '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
              'org/officeDocument/2006/relationships/officeDocument" '
              'Target="word/document.xml"/></Relationships>')
        write("word/document.xml", document)
        if has_list:
            # numId 1 → decimal (ordered), numId 2 → bullet (unordered)
            abstracts = "".join(
                f'<w:abstractNum w:abstractNumId="{aid}">' + "".join(
                    f'<w:lvl w:ilvl="{lv}"><w:numFmt w:val="{fmt}"/></w:lvl>'
                    for lv in range(4)
                ) + "</w:abstractNum>"
                for aid, fmt in ((0, "decimal"), (1, "bullet"))
            )
            nums = "".join(
                f'<w:num w:numId="{nid}">'
                f'<w:abstractNumId w:val="{aid}"/></w:num>'
                for nid, aid in ((1, 0), (2, 1))
            )
            write("word/numbering.xml",
                  '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  f'<w:numbering xmlns:w="{_W}">{abstracts}{nums}'
                  "</w:numbering>")
        doc_rels = []
        if has_list:
            doc_rels.append(
                '<Relationship Id="rId10" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                'numbering" Target="numbering.xml"/>')
        for i, href in enumerate(hyperlinks, start=1):
            doc_rels.append(
                f'<Relationship Id="rIdH{i}" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                f'hyperlink" Target="{esc(href)}" TargetMode="External"/>')
        if doc_rels:
            write("word/_rels/document.xml.rels",
                  '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  f'<Relationships xmlns="{_NS["rel"]}">'
                  + "".join(doc_rels) + "</Relationships>")
        if title is not None or author is not None:
            meta_parts = []
            if title is not None:
                meta_parts.append(f"<dc:title>{esc(title)}</dc:title>")
            if author is not None:
                meta_parts.append(f"<dc:creator>{esc(author)}</dc:creator>")
            write("docProps/core.xml",
                  '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  '<cp:coreProperties xmlns:cp="http://schemas.'
                  'openxmlformats.org/package/2006/metadata/core-'
                  'properties" xmlns:dc="http://purl.org/dc/elements/1.1/">'
                  + "".join(meta_parts) + "</cp:coreProperties>")
        for part, tag, notes in (("footnotes", "footnote", footnotes),
                                 ("endnotes", "endnote", endnotes)):
            if not notes:
                continue
            # Word always ships separator pseudo-notes (ids -1/0); readers
            # must skip them (docx.rs:1022-1026)
            items = [
                f'<w:{tag} w:type="separator" w:id="-1"><w:p><w:r>'
                f"<w:separator/></w:r></w:p></w:{tag}>",
                f'<w:{tag} w:type="continuationSeparator" w:id="0"><w:p>'
                f"<w:r><w:continuationSeparator/></w:r></w:p></w:{tag}>",
            ]
            for nid, paras in notes.items():
                body = "".join(f"<w:p>{runs_xml(p)}</w:p>" for p in paras)
                items.append(f'<w:{tag} w:id="{nid}">{body}</w:{tag}>')
            write(f"word/{part}.xml",
                  '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  f'<w:{part} xmlns:w="{_W}">' + "".join(items)
                  + f"</w:{part}>")
        if comments:
            items = []
            for cid, author, initials, paras in comments:
                attrs = f' w:id="{cid}"'
                if author is not None:
                    attrs += f' w:author="{esc(author)}"'
                if initials is not None:
                    attrs += f' w:initials="{esc(initials)}"'
                body = "".join(f"<w:p>{runs_xml(p)}</w:p>" for p in paras)
                items.append(f"<w:comment{attrs}>{body}</w:comment>")
            write("word/comments.xml",
                  '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  f'<w:comments xmlns:w="{_W}">' + "".join(items)
                  + "</w:comments>")
    return buf.getvalue()


# --- odt provider (useful-slice subset of providers/odt.rs) -----------------

_ODT_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODT_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_ODT_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_ODT_STYLE = "urn:oasis:names:tc:opendocument:xmlns:style:1.0"
_ODT_FO = "urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0"


def _odt_heading_from_name(style_name: str) -> int | None:
    """odt.rs:425-440 parse_odt_heading_level: '_20_'/'_' → spaces;
    'title' → 1; digits after 'heading' → clamped 1-6."""
    normalized = style_name.replace("_20_", " ").replace("_", " ")
    lower = normalized.lower()
    if "title" in lower:
        return 1
    idx = lower.find("heading")
    if idx < 0:
        return None
    digits = "".join(ch for ch in lower[idx + len("heading"):]
                     if ch.isdigit())
    if digits:
        return max(1, min(int(digits), 6))
    return None


def _odt_text_props(tp: ET.Element) -> tuple:
    """(bold, italic, strike, vert, code) from a style:text-properties
    element (odt.rs:174-203 + font-name courier/mono → code,
    odt.rs:135-142)."""
    bold = (tp.get(f"{{{_ODT_FO}}}font-weight") or "").lower() == "bold"
    italic = (tp.get(f"{{{_ODT_FO}}}font-style") or "").lower() == "italic"
    lt = (_attr_local(tp, "text-line-through-type")
          or _attr_local(tp, "text-line-through-style"))
    strike = lt is not None and lt != "none"
    pos = (_attr_local(tp, "text-position") or "").lower()
    vert = ("sup" if ("sup" in pos or "super" in pos)
            else "sub" if "sub" in pos else None)
    font = (_attr_local(tp, "font-name") or "").lower()
    code = "courier" in font or "mono" in font
    return (bold, italic, strike, vert, code)


class _OdtStyles:
    """Style info harvested from BOTH styles.xml and content.xml
    (odt.rs:88-173 read_styles/harvest_styles_from_doc)."""

    def __init__(self) -> None:
        # text-family styles: name → (b, i, s, vert, code)
        self.text: dict[str, tuple] = {}
        # paragraph-family styles' text props (the inline base)
        self.para: dict[str, tuple] = {}
        # paragraph style → heading level (own outline-level, else the
        # parent-style-name's 'Heading N'/'Title')
        self.para_heading: dict[str, int] = {}
        self.para_declared: set[str] = set()
        self.list_ordered: dict[str, bool] = {}

    def harvest(self, root: ET.Element) -> None:
        for st in root.iter(f"{{{_ODT_STYLE}}}style"):
            family = st.get(f"{{{_ODT_STYLE}}}family")
            name = st.get(f"{{{_ODT_STYLE}}}name") or ""
            if not name:
                continue
            tp = st.find(f"{{{_ODT_STYLE}}}text-properties")
            if family == "text":
                if tp is not None:
                    self.text[name] = _odt_text_props(tp)
            elif family == "paragraph":
                self.para_declared.add(name)
                ppr = st.find(f"{{{_ODT_STYLE}}}paragraph-properties")
                lvl = None
                if ppr is not None:
                    v = _attr_local(ppr, "outline-level")
                    if v and v.isdigit():
                        lvl = min(int(v), 6)
                if lvl is None:
                    parent = _attr_local(st, "parent-style-name")
                    if parent:
                        lvl = _odt_heading_from_name(parent)
                if lvl is not None:
                    self.para_heading[name] = lvl
                if tp is not None:
                    self.para[name] = _odt_text_props(tp)
            elif family == "list":
                self.list_ordered[name] = any(
                    _lname(ch.tag) == "list-level-style-number"
                    for ch in st)
        for ls in root.iter(f"{{{_ODT_TEXT}}}list-style"):
            name = ls.get(f"{{{_ODT_STYLE}}}name") or ""
            self.list_ordered[name] = any(
                ch.tag == f"{{{_ODT_TEXT}}}list-level-style-number"
                for ch in ls)

    def span_props(self, name: str) -> tuple:
        """Effective text-style props for a span's style-name: declared
        props, plus code when the NAME contains 'code'
        (odt.rs:590-603)."""
        b, i, s, v, c = self.text.get(name, (False, False, False, None,
                                             False))
        if "code" in name.lower():
            c = True
        return (b, i, s, v, c)


def _odt_styles(zf: zipfile.ZipFile, content_root: ET.Element) -> _OdtStyles:
    out = _OdtStyles()
    try:
        out.harvest(ET.fromstring(zf.read("styles.xml")))
    except (KeyError, ET.ParseError):
        pass
    out.harvest(content_root)
    return out


_XLINK = "http://www.w3.org/1999/xlink"


def _odt_inlines(el: ET.Element, styles: "_OdtStyles",
                 doc: Document | None = None) -> list[Inline]:
    """Styled runs of a text container: spans resolve their text style
    (bold/italic/strike/sup/sub/code — code also via 'code' in the style
    name or a courier/mono font), nesting ORs the flags (odt.rs:600-609);
    the paragraph's own paragraph-style text props are the base
    (odt.rs:445-449 paragraph_text_props); <text:a xlink:href> carries its
    href onto contained runs (odt.rs:477-484); <text:line-break> → br,
    <text:bookmark-start> → bookmark anchor (odt.rs:487-499); tail text
    carries the parent's context. <text:note> bodies and
    <office:annotation> contents collect into ``doc`` (odt.rs:500-566),
    leaving a ref inline in the flow — they never leak into the paragraph
    text. Adjacent same-context fragments merge into one run (span
    granularity, matching the reference's per-span inlines)."""
    runs: list[Inline] = []

    def add(text: str, st: tuple, href: str | None) -> None:
        if not text:
            return
        bold, italic, strike, vert, code = st
        if (runs and runs[-1].kind == "text" and runs[-1].bold == bold
                and runs[-1].italic == italic and runs[-1].href == href
                and runs[-1].strike == strike and runs[-1].vert == vert
                and runs[-1].code == code):
            runs[-1].text += text
        else:
            runs.append(Inline(text=text, bold=bold, italic=italic,
                               strike=strike, vert=vert, code=code,
                               href=href))

    def handle_note(node: ET.Element) -> None:
        kind = ("endnote"
                if _attr_local(node, "note-class") == "endnote"
                else "footnote")
        sink = doc.endnotes if kind == "endnote" else doc.footnotes
        nid = (_attr_local(node, "id")
               or f"odt-note-{len(doc.footnotes) + len(doc.endnotes) + 1}")
        body = next((ch for ch in node
                     if _lname(ch.tag) == "note-body"), None)
        blocks: list[Block] = []
        if body is not None:
            for p in body:
                if _lname(p.tag) == "p":
                    inl = _odt_inlines(p, styles, doc)
                    if inl:
                        blocks.append(Block(
                            kind="paragraph", text=_odt_text_of(p),
                            inlines=_runs_styled(inl) or inl))
        sink.append((nid, blocks))
        runs.append(Inline(
            text=nid,
            kind="endnote_ref" if kind == "endnote" else "footnote_ref"))

    def handle_annotation(node: ET.Element) -> None:
        cid = f"odt-comment-{len(doc.comments) + 1}"
        author = initials = None
        for d in node.iter():
            name = _lname(d.tag)
            if name == "creator" and d.text and d.text.strip():
                author = author or d.text
            elif name == "initials" and d.text and d.text.strip():
                initials = initials or d.text
        blocks = []
        for p in node:
            if _lname(p.tag) == "p":
                inl = _odt_inlines(p, styles, doc)
                if inl:
                    blocks.append(Block(kind="paragraph",
                                        text=_odt_text_of(p),
                                        inlines=_runs_styled(inl) or inl))
        doc.comments.append((cid, author, initials, blocks))
        runs.append(Inline(text=cid, kind="comment_ref"))

    def walk(node: ET.Element, st: tuple, href: str | None) -> None:
        tag = node.tag
        if tag == f"{{{_ODT_TEXT}}}span":
            b2, i2, s2, v2, c2 = styles.span_props(
                node.get(f"{{{_ODT_TEXT}}}style-name") or "")
            st = (st[0] or b2, st[1] or i2, st[2] or s2, st[3] or v2,
                  st[4] or c2)
        elif tag == f"{{{_ODT_TEXT}}}a":
            href = node.get(f"{{{_XLINK}}}href") or href
        elif tag == f"{{{_ODT_TEXT}}}s":
            add(" " * int(node.get(f"{{{_ODT_TEXT}}}c", "1") or 1), st, href)
        elif tag == f"{{{_ODT_TEXT}}}tab":
            add("\t", st, href)
        elif tag == f"{{{_ODT_TEXT}}}line-break":
            runs.append(Inline(kind="br", bold=st[0], italic=st[1],
                               strike=st[2], vert=st[3], href=href))
        elif tag == f"{{{_ODT_TEXT}}}bookmark-start":
            name = _attr_local(node, "name")
            if name:
                runs.append(Inline(text=name, kind="bookmark"))
        elif tag == f"{{{_ODT_TEXT}}}note":
            if doc is not None:
                handle_note(node)
            return  # body handled above; never inline its text
        elif _lname(tag) == "annotation":
            if doc is not None:
                handle_annotation(node)
            return
        if node.text:
            add(node.text, st, href)
        for ch in node:
            walk(ch, st, href)
            if ch.tail:
                add(ch.tail, st, href)

    # the containing paragraph's style supplies the base props
    st0 = styles.para.get(el.get(f"{{{_ODT_TEXT}}}style-name") or "",
                          (False, False, False, None, False))
    if el.text:
        add(el.text, st0, None)
    for ch in el:
        walk(ch, st0, None)
        if ch.tail:
            add(ch.tail, st0, None)
    return runs


def _odt_text_of(el: ET.Element) -> str:
    """Flatten an OpenDocument text container: nested spans/links keep their
    text; <text:s> expands to spaces; <text:tab> to a tab. Note bodies and
    annotation contents are NOT part of the flow text (they collect into
    the document's notes/comments)."""
    parts = []

    def walk(node: ET.Element) -> None:
        if (node.tag == f"{{{_ODT_TEXT}}}note"
                or _lname(node.tag) == "annotation"):
            return
        if node.tag == f"{{{_ODT_TEXT}}}s":
            parts.append(" " * int(node.get(f"{{{_ODT_TEXT}}}c", "1") or 1))
        elif node.tag == f"{{{_ODT_TEXT}}}tab":
            parts.append("\t")
        if node.text:
            parts.append(node.text)
        for ch in node:
            walk(ch)
            if ch.tail:
                parts.append(ch.tail)

    if el.text:
        parts.append(el.text)
    for ch in el:
        walk(ch)
        if ch.tail:
            parts.append(ch.tail)
    return "".join(parts)


def _odt_list(node: ET.Element, styles: "_OdtStyles",
              doc: Document | None = None) -> Block:
    """<text:list> → list block; list-items collect their paragraphs'
    styled runs and recurse into nested <text:list> children (odt.rs
    parse_list_with_inherit: the nested list inherits ordered-ness from its
    own style, falling back to the parent's)."""
    style = node.get(f"{{{_ODT_TEXT}}}style-name") or ""
    ordered = styles.list_ordered.get(style, False)
    block = Block(kind="list", ordered=ordered)
    for li in node.findall(f"{{{_ODT_TEXT}}}list-item"):
        runs: list[Inline] = []
        subs: list[Block] = []
        for ch in li:
            if ch.tag == f"{{{_ODT_TEXT}}}p":
                runs.extend(_odt_inlines(ch, styles, doc))
            elif ch.tag == f"{{{_ODT_TEXT}}}list":
                inner_style = ch.get(f"{{{_ODT_TEXT}}}style-name") or ""
                sub = _odt_list(ch, styles, doc)
                if inner_style not in styles.list_ordered:
                    sub.ordered = ordered  # inherit from parent
                if sub.items:
                    subs.append(sub)
        has_text = any(r.text.strip() for r in runs)
        if has_text or subs:
            block.items.append(ListItem(
                inlines=runs if has_text else [], sublists=subs))
    return block


def odt_to_document(data: bytes) -> Document:
    """Useful-slice ODT provider (providers/odt.rs subset): body headings
    (<text:h> with outline-level), paragraphs (<text:p>) with styled spans
    (bold/italic via text styles, odt.rs:177-186), lists (<text:list>, nested
    via list-items' child lists; ordered iff the list style has a number
    level, odt.rs:154-169), and
    tables (cells flattened to their paragraph text), footnotes/endnotes
    (<text:note>, odt.rs:500-530) and annotations (<office:annotation> →
    comments with dc:creator author, odt.rs:531-566). Styles harvest from
    BOTH styles.xml and content.xml (odt.rs:88-173): paragraph styles
    carry heading levels (own outline-level or 'Heading N' parent), quote
    detection, and text-prop bases; code via style name / courier+mono
    fonts. Frames are out of this subset — same seam note as the docx
    provider."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    root = ET.fromstring(zf.read("content.xml"))
    styles = _odt_styles(zf, root)
    body = root.find(f"{{{_ODT_OFFICE}}}body")
    doc = Document()
    doc.title, doc.author = _ooxml_core_meta(zf, "meta.xml")
    if body is None:
        return doc
    office_text = body.find(f"{{{_ODT_OFFICE}}}text")
    if office_text is None:
        return doc
    for node in office_text:
        if node.tag == f"{{{_ODT_TEXT}}}h":
            lvl = node.get(f"{{{_ODT_TEXT}}}outline-level", "1")
            text = _odt_text_of(node)
            if text.strip():
                doc.blocks.append(Block(
                    kind="heading",
                    level=min(int(lvl) if lvl.isdigit() else 1, 6),
                    text=text,
                ))
        elif node.tag == f"{{{_ODT_TEXT}}}p":
            # image paragraph first (odt.rs:296-301,745-758: a p holding a
            # draw:image with an EXTERNAL http(s) href → Image block)
            img = next((n for n in node.iter() if _lname(n.tag) == "image"),
                       None)
            if img is not None:
                href = _attr_local(img, "href") or ""
                if href.startswith(("http://", "https://")):
                    doc.blocks.append(Block(kind="image", src=href))
                    continue
            runs = _odt_inlines(node, styles, doc)
            text = _odt_text_of(node)
            if not text.strip() and not any(r.kind != "text" for r in runs):
                continue
            # paragraph kind from the paragraph STYLE (odt.rs:397-423:
            # style outline-level / parent 'Heading N' → heading; a
            # declared style whose name contains 'quote' → blockquote)
            sname = node.get(f"{{{_ODT_TEXT}}}style-name") or ""
            kind, level = "paragraph", 2
            if sname in styles.para_heading:
                kind, level = "heading", styles.para_heading[sname]
            elif sname in styles.para_declared and "quote" in sname.lower():
                kind = "blockquote"
            doc.blocks.append(Block(kind=kind, level=level, text=text,
                                    inlines=_runs_styled(runs)))
        elif node.tag == f"{{{_ODT_TEXT}}}list":
            block = _odt_list(node, styles, doc)
            if block.items:
                doc.blocks.append(block)
        elif node.tag == f"{{{_ODT_TABLE}}}table":
            rows = [
                [_odt_text_of(tc)
                 for tc in tr.findall(f"{{{_ODT_TABLE}}}table-cell")]
                for tr in node.findall(f"{{{_ODT_TABLE}}}table-row")
            ]
            doc.blocks.append(Block(kind="table", rows=rows))
    return doc


def odt_to_html(data: bytes) -> str:
    return render_document_html(odt_to_document(data))


def build_odt(blocks: list[tuple], title: str | None = None,
              author: str | None = None) -> bytes:
    """Deterministic minimal ODT writer for tests/synthetic corpora.
    blocks: ("p"|"h1".."h6", text_or_runs), ("table", rows), or
    ("ol"|"ul", [item_text_or_runs, ...]); runs are (text, style[, href])
    with style ⊆ {"b","i","s","^","_"} (bold, italic, strike, sup, sub) —
    styled runs emit text:span referencing a fixed automatic style named
    "T" + sorted letters. Special runs: ("#br",) line break, ("#fn", kind,
    body_text) footnote/endnote (kind "footnote"|"endnote"), ("#ann",
    author, initials, body_text) annotation."""
    def esc(t: str) -> str:
        return (t.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    note_seq = [0]

    def runs_xml(payload) -> str:
        if isinstance(payload, str):
            return esc(payload)
        out = []
        for run in payload:
            if run[0] == "#br":
                out.append("<text:line-break/>")
                continue
            if run[0] == "#fn":
                note_seq[0] += 1
                out.append(
                    f'<text:note text:id="ftn{note_seq[0]}" '
                    f'text:note-class="{run[1]}">'
                    f"<text:note-citation>{note_seq[0]}</text:note-citation>"
                    f"<text:note-body><text:p>{esc(run[2])}</text:p>"
                    "</text:note-body></text:note>")
                continue
            if run[0] == "#ann":
                author = (f"<dc:creator>{esc(run[1])}</dc:creator>"
                          if run[1] else "")
                initials = (f"<officeooo:initials>{esc(run[2])}"
                            "</officeooo:initials>" if run[2] else "")
                out.append(
                    f"<office:annotation>{author}{initials}"
                    f"<text:p>{esc(run[3])}</text:p></office:annotation>")
                continue
            text, style = run[0], run[1]
            href = run[2] if len(run) > 2 else None
            if style:
                name = "T" + "".join(sorted(
                    {"^": "P", "_": "Q"}.get(ch, ch.upper())
                    for ch in style))
                used_styles.add(name)
                s = (f'<text:span text:style-name="{name}">'
                     f"{esc(text)}</text:span>")
            else:
                s = esc(text)
            if href:
                s = f'<text:a xlink:href="{esc(href)}">{s}</text:a>'
            out.append(s)
        return "".join(out)

    used_styles: set[str] = set()

    parts = []
    for kind, payload in blocks:
        if kind == "table":
            trs = "".join(
                "<table:table-row>" + "".join(
                    f"<table:table-cell><text:p>{esc(c)}</text:p>"
                    "</table:table-cell>" for c in row
                ) + "</table:table-row>"
                for row in payload
            )
            parts.append(f"<table:table>{trs}</table:table>")
        elif kind == "img":
            parts.append(
                '<text:p><draw:image '
                f'xlink:href="{esc(payload)}"/></text:p>')
        elif kind in ("ol", "ul"):
            def list_xml(lkind, litems) -> str:
                style = "LNUM" if lkind == "ol" else "LBUL"
                out = [f'<text:list text:style-name="{style}">']
                for item in litems:
                    nested = ""
                    content = item
                    # (content, ("ol"|"ul", subitems)) → nested list
                    if (isinstance(item, tuple) and len(item) == 2
                            and isinstance(item[1], tuple) and item[1]
                            and item[1][0] in ("ol", "ul")):
                        content, (nk, ni) = item
                        nested = list_xml(nk, ni)
                    body = (f"<text:p>{runs_xml(content)}</text:p>"
                            if content else "")
                    out.append(f"<text:list-item>{body}{nested}"
                               "</text:list-item>")
                out.append("</text:list>")
                return "".join(out)

            parts.append(list_xml(kind, payload))
        elif kind.startswith("h") and kind[1:].isdigit():
            parts.append(f'<text:h text:outline-level="{kind[1:]}">'
                         f"{esc(payload)}</text:h>")
        else:
            parts.append(f"<text:p>{runs_xml(payload)}</text:p>")
    style_defs = []
    for name in sorted(used_styles | {"TB", "TI", "TBI"}):
        props = []
        if "B" in name[1:]:
            props.append('fo:font-weight="bold"')
        if "I" in name[1:]:
            props.append('fo:font-style="italic"')
        if "S" in name[1:]:
            props.append('style:text-line-through-style="solid"')
        if "P" in name[1:]:
            props.append('style:text-position="super 58%"')
        if "Q" in name[1:]:
            props.append('style:text-position="sub 58%"')
        style_defs.append(
            f'<style:style style:name="{name}" style:family="text">'
            f'<style:text-properties {" ".join(props)}/></style:style>')
    auto_styles = (
        "<office:automatic-styles>"
        + "".join(style_defs) +
        '<text:list-style style:name="LNUM">'
        '<text:list-level-style-number text:level="1"/></text:list-style>'
        '<text:list-style style:name="LBUL">'
        '<text:list-level-style-bullet text:level="1"/></text:list-style>'
        "</office:automatic-styles>"
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODT_OFFICE}" '
        f'xmlns:text="{_ODT_TEXT}" xmlns:table="{_ODT_TABLE}" '
        f'xmlns:style="{_ODT_STYLE}" xmlns:fo="{_ODT_FO}" '
        f'xmlns:xlink="{_XLINK}" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" '
        'xmlns:officeooo="http://openoffice.org/2009/office" '
        'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0">'
        + auto_styles
        + "<office:body><office:text>" + "".join(parts)
        + "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        mt = zipfile.ZipInfo("mimetype", date_time=(2020, 1, 1, 0, 0, 0))
        mt.compress_type = zipfile.ZIP_STORED
        zf.writestr(mt, "application/vnd.oasis.opendocument.text")
        zi = zipfile.ZipInfo("content.xml", date_time=(2020, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_DEFLATED
        zf.writestr(zi, content)
        if title is not None or author is not None:
            meta_parts = []
            if title is not None:
                meta_parts.append(f"<dc:title>{esc(title)}</dc:title>")
            if author is not None:
                meta_parts.append(
                    f"<meta:initial-creator>{esc(author)}"
                    "</meta:initial-creator>")
            meta_xml = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<office:document-meta xmlns:office="' + _ODT_OFFICE + '" '
                'xmlns:dc="http://purl.org/dc/elements/1.1/" '
                'xmlns:meta="urn:oasis:names:tc:opendocument:xmlns:'
                'meta:1.0"><office:meta>' + "".join(meta_parts)
                + "</office:meta></office:document-meta>")
            mi = zipfile.ZipInfo("meta.xml", date_time=(2020, 1, 1, 0, 0, 0))
            mi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(mi, meta_xml)
    return buf.getvalue()


# --- rtf provider (useful-slice subset of providers/rtf.rs) -----------------

_RTF_SKIP_DESTS = {b"fonttbl", b"colortbl", b"stylesheet", b"info",
                   b"pict", b"header", b"footer", b"generator"}


def rtf_to_document(data: bytes) -> Document:
    """Useful-slice RTF provider (providers/rtf.rs:211+ subset, built from
    the public RTF 1.9 spec): paragraph text split on \\par, simple tables
    (\\trowd … \\cell … \\row), destination groups ({\\* …}, fonttbl,
    colortbl, stylesheet, info, pict) skipped, \\'hh and \\uN escapes
    decoded, and \\b/\\i character styling (toggles with optional 0 arg,
    group-scoped via the brace stack — rtf.rs:518-525,340-356). List
    numbering and nested tables are out of this subset."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("not an RTF document")
    doc = Document()
    runs: list[Inline] = []
    table_rows: list[list[str]] = []
    row: list[str] = []
    in_table = False
    skip_depth = 0   # >0 → inside a skipped destination group
    depth = 0
    i, n = 0, len(data)
    uc_skip = 1      # \ucN: bytes to skip after \u
    bold = italic = strike = False
    vert: str | None = None
    style_stack: list[tuple[bool, bool, bool, str | None]] = []

    def emit(text: str) -> None:
        if not text:
            return
        if (runs and runs[-1].bold == bold and runs[-1].italic == italic
                and runs[-1].strike == strike and runs[-1].vert == vert):
            runs[-1].text += text
        else:
            runs.append(Inline(text=text, bold=bold, italic=italic,
                               strike=strike, vert=vert))

    def buf_text() -> str:
        return "".join(r.text for r in runs)

    def flush_par() -> None:
        text = buf_text().strip()
        styled = None
        if text and any(r.bold or r.italic or r.strike or r.vert
                        for r in runs):
            # trim whitespace at the edges without disturbing run styling
            trimmed = [Inline(r.text, r.bold, r.italic, strike=r.strike,
                              vert=r.vert) for r in runs]
            trimmed[0].text = trimmed[0].text.lstrip()
            trimmed[-1].text = trimmed[-1].text.rstrip()
            styled = [r for r in trimmed if r.text]
        runs.clear()
        if text:
            doc.blocks.append(Block(kind="paragraph", text=text,
                                    inlines=styled))

    def flush_table() -> None:
        nonlocal in_table
        if table_rows:
            doc.blocks.append(Block(kind="table",
                                    rows=[list(r) for r in table_rows]))
            table_rows.clear()
        in_table = False

    while i < n:
        c = data[i:i + 1]
        if c == b"{":
            depth += 1
            style_stack.append((bold, italic, strike, vert))
            if skip_depth:
                skip_depth += 1
            elif data[i + 1:i + 3] == b"\\*":
                skip_depth = 1
            i += 1
        elif c == b"}":
            depth -= 1
            if style_stack:
                bold, italic, strike, vert = style_stack.pop()
            if skip_depth:
                skip_depth -= 1
            i += 1
        elif c == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in (b"\\", b"{", b"}"):
                if not skip_depth:
                    emit(nxt.decode())
                i += 2
            elif nxt == b"'":
                if not skip_depth:
                    try:
                        emit(bytes([int(data[i + 2:i + 4], 16)])
                             .decode("cp1252", errors="replace"))
                    except ValueError:
                        pass
                i += 4
            elif nxt == b"~":
                if not skip_depth:
                    emit("\u00a0")
                i += 2
            else:
                m = re.match(rb"\\([a-zA-Z]+)(-?\d+)? ?", data[i:i + 32])
                if not m:
                    i += 1
                    continue
                word, num = m.group(1), m.group(2)
                i += m.end()
                if skip_depth:
                    continue
                if word in _RTF_SKIP_DESTS:
                    skip_depth = 1
                elif word == b"par":
                    if in_table and row:
                        emit("\n")   # paragraph break inside a cell
                    else:
                        if in_table:
                            flush_table()  # \par after \row ends the table
                        flush_par()
                elif word in (b"tab",):
                    emit("\t")
                elif word in (b"line",):
                    emit("\n")
                elif word == b"b":
                    bold = num != b"0"
                elif word == b"i":
                    italic = num != b"0"
                elif word in (b"strike", b"striked", b"striked1"):
                    strike = num != b"0"
                elif word == b"super":
                    # rtf.rs:530-543: \super / \sub are mutually exclusive
                    vert = "sup" if num != b"0" else (
                        None if vert == "sup" else vert)
                elif word == b"sub":
                    vert = "sub" if num != b"0" else (
                        None if vert == "sub" else vert)
                elif word == b"nosupersub":
                    vert = None
                elif word == b"plain":
                    bold = italic = strike = False
                    vert = None
                elif word == b"uc":
                    uc_skip = int(num or 1)
                elif word == b"u":
                    cp = int(num or 0)
                    emit(chr(cp + 65536 if cp < 0 else cp))
                    # skip uc_skip fallback CHARACTERS (not bytes): a
                    # fallback is commonly a multi-byte escape — \'hh (4
                    # bytes) or an escaped delimiter (2 bytes) — and the
                    # skip never crosses a group boundary (RTF 1.9 §\uc)
                    skipped = 0
                    while skipped < uc_skip and i < n:
                        if data[i:i + 2] == b"\\'":
                            i += 4
                        elif (data[i:i + 1] == b"\\"
                              and data[i + 1:i + 2] in (b"\\", b"{", b"}",
                                                        b"~")):
                            i += 2
                        elif data[i:i + 1] in (b"{", b"}"):
                            break
                        else:
                            i += 1
                        skipped += 1
                elif word == b"trowd":
                    if not in_table:
                        flush_par()
                        in_table = True
                elif word == b"cell":
                    row.append(buf_text().strip())
                    runs.clear()
                elif word == b"row":
                    if row:
                        table_rows.append(list(row))
                        row.clear()
                # all other control words (formatting) are ignored
        else:
            j = i
            while j < n and data[j:j + 1] not in (b"\\", b"{", b"}"):
                j += 1
            if not skip_depth:
                chunk = data[i:j].replace(b"\r", b"").replace(b"\n", b"")
                if chunk:
                    emit(chunk.decode("cp1252", errors="replace"))
            i = j
    if in_table:
        flush_table()
    flush_par()
    return doc


def rtf_to_html(data: bytes) -> str:
    return render_document_html(rtf_to_document(data))


# --- renderer (maud-equivalent output, html.rs:11-237) ----------------------

def _esc(t: str) -> str:
    """maud's escape set: & < > " (not ')."""
    return (t.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _render_one(run: Inline) -> str:
    """One run's markup: special kinds first (html.rs:218-236 — br, note/
    comment refs, bookmarks), then the style nest del→em→strong→sup/sub
    (ResolvedRunStyle::apply order, docx.rs:520-536; the style wrap also
    applies to special inlines, e.g. Word's superscripted footnote ref run
    renders <sup><sup><a …>…)."""
    if run.kind == "br":
        s = "<br>"
    elif run.kind == "footnote_ref":
        rid = _esc(run.text)
        s = f'<sup><a href="#footnote-{rid}">{rid}</a></sup>'
    elif run.kind == "endnote_ref":
        rid = _esc(run.text)
        s = f'<sup><a href="#endnote-{rid}">{rid}</a></sup>'
    elif run.kind == "comment_ref":
        s = f'<a href="#comment-{_esc(run.text)}">\U0001f4ac</a>'
    elif run.kind == "bookmark":
        s = f'<a id="{_esc(run.text)}"></a>'
    elif run.code:
        # code replaces the run's other styling (docx.rs:618-630)
        return f"<code>{_esc(run.text)}</code>"
    else:
        s = _esc(run.text)
    if run.strike:
        s = f"<del>{s}</del>"
    if run.italic:
        s = f"<em>{s}</em>"
    if run.bold:
        s = f"<strong>{s}</strong>"
    if run.vert == "sup":
        s = f"<sup>{s}</sup>"
    elif run.vert == "sub":
        s = f"<sub>{s}</sub>"
    return s


def _render_inlines(inlines: list[Inline]) -> str:
    """Per-run markup (style nest per _render_one); consecutive runs with
    the same href render as the children of ONE <a> (html.rs:218-220
    Link wraps its styled children)."""
    parts: list[str] = []
    i = 0
    while i < len(inlines):
        run = inlines[i]
        if run.href is not None:
            j = i
            inner = []
            while j < len(inlines) and inlines[j].href == run.href:
                inner.append(_render_one(inlines[j]))
                j += 1
            parts.append(f'<a href="{_esc(run.href)}">' + "".join(inner)
                         + "</a>")
            i = j
            continue
        parts.append(_render_one(run))
        i += 1
    return "".join(parts)


def _render_list(b: Block) -> str:
    """html.rs:191-200 + render_blocks_inline (html.rs:100-110): a lone
    normal paragraph renders bare inlines; paragraph + nested lists render
    as blocks (<p> then <ol>/<ul>); nested lists alone render bare."""
    tag = "ol" if b.ordered else "ul"
    parts = [f"<{tag}>"]
    for item in b.items:
        if isinstance(item, ListItem):
            subs = "".join(_render_list(s) for s in item.sublists)
            if item.inlines and item.sublists:
                inner = f"<p>{_render_inlines(item.inlines)}</p>{subs}"
            elif item.sublists:
                inner = subs
            else:
                inner = _render_inlines(item.inlines)
        else:
            inner = _render_inlines(item)
        parts.append(f"<li>{inner}</li>")
    parts.append(f"</{tag}>")
    return "".join(parts)


def _block_inner(b: Block) -> str:
    return (_render_inlines(b.inlines) if b.inlines is not None
            else _esc(b.text))


def _render_blocks(blocks: list[Block]) -> str:
    """render_blocks (html.rs:89-98): the block loop shared by the main
    body and the footnote/endnote/comment sections."""
    parts: list[str] = []
    for b in blocks:
        if b.kind == "heading":
            lvl = min(max(b.level, 1), 6)
            parts.append(f"<h{lvl}>{_block_inner(b)}</h{lvl}>")
        elif b.kind == "paragraph":
            parts.append(f"<p>{_block_inner(b)}</p>")
        elif b.kind == "blockquote":
            parts.append(f"<blockquote><p>{_block_inner(b)}</p></blockquote>")
        elif b.kind == "list":
            parts.append(_render_list(b))
        elif b.kind == "image":
            alt = f' alt="{_esc(b.alt)}"' if b.alt is not None else ""
            parts.append(f'<img src="{_esc(b.src)}"{alt}>')
        elif b.kind == "table":
            parts.append("<table><tbody>")
            for row in b.rows:
                # cells hold one normal paragraph (or nothing) →
                # render_blocks_inline emits bare inlines (html.rs:104-115)
                parts.append("<tr>" + "".join(
                    f"<td>{_esc(cell)}</td>" if cell.strip() else "<td></td>"
                    for cell in row
                ) + "</tr>")
            parts.append("</tbody></table>")
    return "".join(parts)


def render_document_html(doc: Document) -> str:
    parts = [
        "<!DOCTYPE html>",
        '<html lang="en"><head><meta charset="UTF-8">',
        '<meta name="viewport" content="width=device-width, initial-scale=1.0">',
        f"<title>{_esc(doc.title or 'Document')}</title>"
        + (f'<meta name="author" content="{_esc(doc.author)}">'
           if doc.author is not None else "")
        + "</head><body><main>",
        _render_blocks(doc.blocks),
        "</main>",
    ]
    # html.rs:41-80: end-of-body note/comment sections (only if non-empty)
    for sec, notes in (("footnotes", doc.footnotes),
                       ("endnotes", doc.endnotes)):
        if notes:
            parts.append(f'<section id="{sec}"><h2>{sec.capitalize()}</h2>')
            for nid, blocks in notes:
                parts.append(f'<div id="{sec[:-1]}-{_esc(nid)}">'
                             + _render_blocks(blocks) + "</div>")
            parts.append("</section>")
    if doc.comments:
        parts.append('<section id="comments"><h2>Comments</h2>')
        for cid, author, initials, blocks in doc.comments:
            parts.append(f'<article id="comment-{_esc(cid)}">')
            if author is not None:
                head = _esc(author)
                if initials is not None:
                    head += f" ({_esc(initials)})"
                parts.append(f"<header>{head}</header>")
            parts.append(_render_blocks(blocks) + "</article>")
        parts.append("</section>")
    parts.append("</body></html>")
    return "".join(parts)


def xlsx_to_html(data: bytes) -> str:
    return render_document_html(xlsx_to_document(data))


def convert_document(data: bytes) -> str | None:
    """Provider dispatch (the S5 'document' engine body): sniff the OOXML
    package for the workbook/word part. Unknown format → None (the engine
    reports a failed conversion, like an unsupported provider)."""
    if data[:5] == b"{\\rtf":
        try:
            return rtf_to_html(data)
        except Exception:
            return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
    except zipfile.BadZipFile:
        return None
    if "xl/workbook.xml" in names:
        return xlsx_to_html(data)
    if "word/document.xml" in names:
        return docx_to_html(data)
    if "content.xml" in names:
        return odt_to_html(data)
    return None


# --- deterministic writer ----------------------------------------------------

def _col_name(c: int) -> str:
    name = ""
    c += 1
    while c:
        c, rem = divmod(c - 1, 26)
        name = chr(65 + rem) + name
    return name


def build_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """Minimal deterministic xlsx writer (fixed timestamps, inline strings;
    numbers as n, bools as b) for tests and synthetic corpora."""
    buf = io.BytesIO()

    def esc_xml(t: str) -> str:
        return (t.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;"))

    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        def write(name: str, content: str) -> None:
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)

        n = len(sheets)
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(1, n + 1)
        )
        write("[Content_Types].xml",
              '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
              'content-types">'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Default Extension="rels" ContentType="application/'
              'vnd.openxmlformats-package.relationships+xml"/>'
              '<Override PartName="/xl/workbook.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
              'sheet.main+xml"/>' + overrides + "</Types>")
        write("_rels/.rels",
              '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              f'<Relationships xmlns="{_NS["rel"]}">'
              '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
              'org/officeDocument/2006/relationships/officeDocument" '
              'Target="xl/workbook.xml"/></Relationships>')
        sheet_els = "".join(
            f'<sheet name="{esc_xml(name)}" sheetId="{i}" r:id="rId{i}"/>'
            for i, name in enumerate(sheets, start=1)
        )
        write("xl/workbook.xml",
              '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              f'<workbook xmlns="{_NS["m"]}" xmlns:r="{_NS["r"]}">'
              f"<sheets>{sheet_els}</sheets></workbook>")
        rel_els = "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1)
        )
        write("xl/_rels/workbook.xml.rels",
              '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              f'<Relationships xmlns="{_NS["rel"]}">{rel_els}</Relationships>')
        for i, (name, rows) in enumerate(sheets.items(), start=1):
            row_els = []
            for rnum, row in enumerate(rows, start=1):
                cell_els = []
                for cnum, val in enumerate(row):
                    ref = f"{_col_name(cnum)}{rnum}"
                    if val is None or val == "":
                        continue
                    if isinstance(val, bool):
                        cell_els.append(
                            f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>')
                    elif isinstance(val, (int, float)):
                        cell_els.append(
                            f'<c r="{ref}"><v>{val}</v></c>')
                    else:
                        cell_els.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space='
                            f'"preserve">{esc_xml(str(val))}</t></is></c>')
                row_els.append(f'<row r="{rnum}">' + "".join(cell_els)
                               + "</row>")
            write(f"xl/worksheets/sheet{i}.xml",
                  '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  f'<worksheet xmlns="{_NS["m"]}">'
                  "<sheetData>" + "".join(row_els) + "</sheetData>"
                  "</worksheet>")
    return buf.getvalue()
