"""HTML extraction kernel: base-href, transform/clean (X1), links (L1/L2),
images (L3), metadata (M1), charset re-decode (U5), visible text.

Semantics transcribed from the reference (paths under /root/reference/):

- extract_base_href      — packages/firecrawl-rs/src/html.rs:19-59
- extract_links          — packages/firecrawl-rs/src/html.rs:62-103 (raw
  hrefs with http:/ → http:// fixes), resolved per apps/WebCrawl/src/scraper/
  scrapeURL/lib/extractLinks.ts:9-65 (keep absolute/mailto, drop bare '#',
  urljoin others, dedupe first-seen order)
- transform_html         — packages/firecrawl-rs/src/html.rs:379-614:
  include_tags rebuild; strip head/meta/noscript/style/script; exclude_tags;
  onlyMainContent boilerplate removal (42 selectors, 13 force-include);
  srcset→best src; absolutize img[src] and a[href]
- extract_images         — packages/firecrawl-rs/src/html.rs:737-899 (HashSet
  in the reference → order nondeterministic; we return sorted for stable
  Spark output, compare-as-set in parity tests)
- extract_metadata       — packages/firecrawl-rs/src/html.rs:143-296
- decode_html            — apps/WebCrawl/src/scraper/scrapeURL/engines/fetch/
  index.ts:67-81 (utf-8 decode, <meta charset> sniff, re-decode)
- visible text           — apps/WebCrawl/src/scraper/scrapeURL/
  gatekeeper.ts:136-142
"""

from __future__ import annotations

import re

from .dom import Comment, Document, Element, Text, parse_html
from .dom import _matches_chain, _parsed_groups
from .urlkit import URLParseError, join_url, parse_url

__all__ = [
    "transform_document",
    "extract_base_href",
    "extract_raw_links",
    "extract_links",
    "extract_images",
    "extract_metadata",
    "transform_html",
    "decode_html",
    "visible_text",
    "get_inner_text",
    "EXCLUDE_NON_MAIN_TAGS",
    "FORCE_INCLUDE_MAIN_TAGS",
]

# html.rs:318-361
EXCLUDE_NON_MAIN_TAGS = (
    "header", "footer", "nav", "aside", ".header", ".top", ".navbar",
    "#header", ".footer", ".bottom", "#footer", ".sidebar", ".side",
    ".aside", "#sidebar", ".modal", ".popup", "#modal", ".overlay", ".ad",
    ".ads", ".advert", "#ad", ".lang-selector", ".language",
    "#language-selector", ".social", ".social-media", ".social-links",
    "#social", ".menu", ".navigation", "#nav", ".breadcrumbs",
    "#breadcrumbs", ".share", "#share", ".widget", "#widget", ".cookie",
    "#cookie", ".fc-decoration",
)

# html.rs:363-377
FORCE_INCLUDE_MAIN_TAGS = (
    "#main", ".swoogo-cols", ".swoogo-text", ".swoogo-table-div",
    ".swoogo-space", ".swoogo-alert", ".swoogo-sponsors", ".swoogo-title",
    ".swoogo-tabs", ".swoogo-logo", ".swoogo-image", ".swoogo-button",
    ".swoogo-agenda",
)

# html.rs:14-15
_STYLE_URL_RE = re.compile(r"""url\(['"]?([^'")]+)['"]?\)""")

_CHARSET_RE = re.compile(
    r"""<meta[^>]+charset\s*=\s*["']?\s*([\w-]+)""", re.IGNORECASE
)

_STRIP_TAGS = frozenset({"head", "meta", "noscript", "style", "script"})

# pre-split EXCLUDE_NON_MAIN_TAGS (all simple selectors) for one-pass match
_BOILER_TAGS = frozenset(s for s in EXCLUDE_NON_MAIN_TAGS if s[0] not in ".#")
_BOILER_CLASSES = frozenset(s[1:] for s in EXCLUDE_NON_MAIN_TAGS if s[0] == ".")
_BOILER_IDS = frozenset(s[1:] for s in EXCLUDE_NON_MAIN_TAGS if s[0] == "#")
_FORCE_CLASSES = frozenset(s[1:] for s in FORCE_INCLUDE_MAIN_TAGS if s[0] == ".")
_FORCE_IDS = frozenset(s[1:] for s in FORCE_INCLUDE_MAIN_TAGS if s[0] == "#")


def _walk_elements(root: Element, visit) -> None:
    """DFS over elements; ``visit`` returns True when it detached the node
    (its subtree is then skipped, matching per-selector re-selection)."""
    stack = [c for c in reversed(root.children) if isinstance(c, Element)]
    while stack:
        node = stack.pop()
        if not visit(node) and node.children:
            stack.extend(c for c in reversed(node.children)
                         if isinstance(c, Element))


def _is_boiler(el: Element) -> bool:
    if el.tag in _BOILER_TAGS:
        return True
    el_id = el.attrs.get("id")
    if el_id is not None and el_id in _BOILER_IDS:
        return True
    cls = el.attrs.get("class")
    if cls and not _BOILER_CLASSES.isdisjoint(cls.split()):
        return True
    return False


def _contains_force_include(el: Element) -> bool:
    """Any *descendant* matching FORCE_INCLUDE_MAIN_TAGS (html.rs:499-504 —
    kuchikiki select searches descendants)."""
    for d in el.descendants():
        if isinstance(d, Element):
            if d.attrs.get("id") in _FORCE_IDS:
                return True
            cls = d.attrs.get("class")
            if cls and not _FORCE_CLASSES.isdisjoint(cls.split()):
                return True
    return False


def _base_href_from_document(doc: Document, page_url: str) -> str:
    """html.rs:19-35 — <base href> joined against page URL, else page URL."""
    url = parse_url(page_url)  # propagates URLParseError like the Rust path
    base_el = doc.select_first("base[href]")
    if base_el is not None:
        href = base_el.get("href") or ""
        try:
            return str(join_url(str(url), href))
        except URLParseError:
            pass
    return str(url)


def extract_base_href(html: str, page_url: str) -> str:
    return _base_href_from_document(parse_html(html), page_url)


def _fix_scheme_slash(href: str) -> str:
    """html.rs:85-89 — http:/x → http://x."""
    if href.startswith("http:/") and not href.startswith("http://"):
        return "http://" + href[6:]
    if href.startswith("https:/") and not href.startswith("https://"):
        return "https://" + href[7:]
    return href


def extract_raw_links(html: str) -> list[str]:
    """html.rs:62-103 — a[href] values, scheme-slash fixed, document order."""
    doc = parse_html(html)
    out: list[str] = []
    for a in doc.select("a[href]"):
        href = a.get("href")
        if href is None:
            continue
        out.append(_fix_scheme_slash(href))
    return out


def _resolve_with_base_href(href: str, base_url: str, base_href: str) -> str:
    """extractLinks.ts:9-46."""
    resolution_base = base_url
    if base_href:
        try:
            parse_url(base_href)
            resolution_base = base_href
        except URLParseError:
            try:
                resolution_base = str(join_url(base_url, base_href))
            except URLParseError:
                resolution_base = base_url
    try:
        if href.startswith(("http://", "https://")):
            return href
        if href.startswith("mailto:"):
            return href
        if href.startswith("#"):
            return ""
        return str(join_url(resolution_base, href))
    except URLParseError:
        return ""


def extract_links(html: str, base_url: str) -> list[str]:
    """extractLinks.ts:48-65 — resolve + dedupe preserving first-seen order."""
    try:
        base_href = extract_base_href(html, base_url)
    except URLParseError:
        return []
    links: list[str] = []
    seen: set[str] = set()
    for href in extract_raw_links(html):
        href = href.strip()
        resolved = _resolve_with_base_href(href, base_url, base_href)
        if resolved and resolved not in seen:
            seen.add(resolved)
            links.append(resolved)
    return links


def extract_anchors(html: str, base_url: str) -> list[tuple[str, str]]:
    """(resolved href, anchor text) per <a> occurrence, document order.

    Same href resolution path as extract_links (extractLinks.ts:48-65
    semantics: base-href aware, scheme-slash fixed, fragments dropped),
    but NO dedup — an anchor-text index wants every occurrence, because
    occurrence counts carry the signal. Text is the anchor's visible text
    contents, whitespace-collapsed; empty-text anchors (image links) keep
    an empty string so link counts still aggregate."""
    try:
        base_href = extract_base_href(html, base_url)
    except URLParseError:
        return []
    doc = parse_html(html)
    out: list[tuple[str, str]] = []
    for a in doc.select("a[href]"):
        href = a.get("href")
        if href is None:
            continue
        resolved = _resolve_with_base_href(
            _fix_scheme_slash(href).strip(), base_url, base_href)
        if resolved:
            out.append((resolved, " ".join(a.text_contents().split())))
    return out


# --- transform (X1) -------------------------------------------------------

def transform_html(
    html: str,
    url: str,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    only_main_content: bool = True,
) -> str:
    """html.rs:398-614. Returns the serialized transformed document."""
    return transform_document(
        html, url, include_tags=include_tags, exclude_tags=exclude_tags,
        only_main_content=only_main_content,
    ).serialize()


def node_signature(el: "Element", mode: str = "struct") -> str:
    """Element signature for OMCE matching, format ``v:mode:hash`` (the
    shape html.rs:449 splits on ':'). STAND-IN algorithm: the reference's
    nodesig crate is an unvendored external git dependency
    (firecrawl-rs/Cargo.toml:19), so byte parity is unverifiable; this
    hashes (tag, sorted class list, whitespace-collapsed text) — enough
    for signature-set round trips within this engine. The service never
    passes signatures (SURVEY.md §2.7 X1 step 4), so this path is
    effectively reference-off."""
    import zlib

    text = " ".join(el.text_contents().split())
    cls = " ".join(sorted((el.attrs.get("class") or "").split()))
    payload = f"{el.tag}\x1f{cls}\x1f{text}".encode()
    return f"1:{mode}:{zlib.crc32(payload):08x}"


def _omce_drop(doc: "Element", signatures: list[str]) -> None:
    """html.rs:443-484: group signatures by their mode token, compute each
    non-empty element's signature per mode in a post-order traversal, and
    detach every match (children considered before parents, matching the
    NodeEdge::End walk)."""
    modes = {s.split(":")[1] for s in signatures if s.count(":") >= 2}
    to_drop: list[Element] = []
    for mode in sorted(modes):
        matcher = f":{mode}:"
        sigset = {s for s in signatures if matcher in s}

        def post(el: "Element") -> None:
            for ch in el.children:
                if isinstance(ch, Element):
                    post(ch)
            if not el.text_contents().strip():
                return
            if node_signature(el, mode) in sigset:
                to_drop.append(el)

        for ch in doc.children:
            if isinstance(ch, Element):
                post(ch)
    for el in to_drop:
        el.detach()


def transform_document(
    html: str,
    url: str,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    only_main_content: bool = True,
    omce_signatures: list[str] | None = None,
) -> Document:
    """transform_html returning the DOM (serialize↔reparse verified
    round-trip-identical on the corpus; the markdown path consumes the tree
    directly to skip a full reparse).

    omce_signatures drive the reference's OMCE node-dropping
    (html.rs:443-484) with the stand-in ``node_signature`` — see its
    docstring; the service never passes signatures, so the default path
    is unchanged."""
    include_tags = include_tags or []
    exclude_tags = exclude_tags or []
    doc = parse_html(html)
    base = parse_url(_base_href_from_document(doc, url))

    if include_tags:
        # html.rs:407-424 — build a new doc of matching subtrees under <div>
        new_doc = parse_html("<div></div>")
        root = new_doc.select_first("div")
        assert root is not None
        for sel in include_tags:
            for tag in doc.select(sel):
                root.append(tag)
        doc = new_doc

    # Pass A — html.rs:426-440 head/meta/noscript/style/script strip, then
    # html.rs:486-490 exclude_tags (fused single walk; detached subtrees are
    # skipped exactly as per-selector re-selection would skip them)
    exclude_groups = [_parsed_groups(sel) for sel in exclude_tags]

    def _strip_only(el: Element) -> bool:
        if el.tag in _STRIP_TAGS:
            el.detach()
            return True
        return False

    def _exclude_only(el: Element) -> bool:
        for groups in exclude_groups:
            for chain in groups:
                if _matches_chain(el, chain, scope=doc):
                    el.detach()
                    return True
        return False

    def _pass_a(el: Element) -> bool:
        return _strip_only(el) or _exclude_only(el)

    if only_main_content and omce_signatures:
        # reference pass order (html.rs:426-490): strip, then OMCE against
        # the pre-exclude tree (signatures hash text the excludes would
        # remove), then exclude_tags
        _walk_elements(doc, _strip_only)
        _omce_drop(doc, omce_signatures)
        _walk_elements(doc, _exclude_only)
    else:
        _walk_elements(doc, _pass_a)

    # Pass B — html.rs:492-509 boilerplate removal with force-include
    if only_main_content:
        def _pass_b(el: Element) -> bool:
            if not _is_boiler(el):
                return False
            if _contains_force_include(el):
                return False
            el.detach()
            return True

        _walk_elements(doc, _pass_b)

    # html.rs:511-576 — srcset → biggest source into src
    for img in doc.select("img[srcset]"):
        srcset = img.get("srcset") or ""
        sizes: list[tuple[str, float, bool]] = []  # (url, size, is_x)
        for part in srcset.split(","):
            tok = part.strip().split(" ")
            last = tok[-1]
            if len(tok) > 1 and last and (last.endswith("x") or last.endswith("w")):
                used, last_tok = True, last
            else:
                used, last_tok = False, "1x"
            try:
                parsed_size = float(last_tok[:-1])
            except ValueError:
                continue
            src_url = " ".join(tok[:-1]) if used else " ".join(tok)
            sizes.append((src_url, parsed_size, last_tok.endswith("x")))
        if sizes and all(is_x for _, _, is_x in sizes):
            src = img.get("src")
            if src is not None:
                sizes.append((src, 1.0, True))
        # stable sort descending by size (Rust sort_by is stable)
        sizes.sort(key=lambda t: -t[1])
        if sizes:
            img.attrs["src"] = sizes[0][0]

    # html.rs:578-611 — absolutize img[src] and a[href]
    for sel, attr in (("img[src]", "src"), ("a[href]", "href")):
        for el in doc.select(sel):
            old = el.get(attr)
            if old is None:
                continue
            try:
                el.attrs[attr] = str(join_url(str(base), old))
            except URLParseError:
                pass

    return doc


# --- images (L3) -----------------------------------------------------------

def extract_images(html: str, base_url: str) -> list[str]:
    """html.rs:737-899. Reference accumulates into a HashSet (order
    nondeterministic); we return a *sorted* list for deterministic Spark
    output — parity tests compare as sets."""
    doc = parse_html(html)
    base = parse_url(base_url)
    base_href = _base_href_from_document(doc, base_url)
    base_href_url = parse_url(base_href)
    images: set[str] = set()

    def resolve(src: str) -> str | None:
        if src.startswith(("data:", "blob:")):
            return src
        if src.startswith(("http://", "https://")):
            return src
        try:
            if src.startswith("//"):
                return str(join_url(str(base), src))
            return str(join_url(str(base_href_url), src))
        except URLParseError:
            return None

    def add(src: str | None) -> None:
        if src:
            resolved = resolve(src)
            if resolved:
                images.add(resolved)

    for img in doc.select("img"):
        add(img.get("src"))
        add(img.get("data-src"))
        srcset = img.get("srcset")
        if srcset:
            for part in srcset.split(","):
                toks = part.split()
                if toks:
                    add(toks[0])

    for source in doc.select("picture source"):
        srcset = source.get("srcset")
        if srcset:
            for part in srcset.split(","):
                toks = part.split()
                if toks:
                    add(toks[0])

    for sel in (
        'meta[property="og:image"]', 'meta[property="og:image:url"]',
        'meta[property="og:image:secure_url"]', 'meta[name="twitter:image"]',
        'meta[name="twitter:image:src"]', 'meta[itemprop="image"]',
    ):
        for el in doc.select(sel):
            add(el.get("content"))

    for sel in ('link[rel*="icon"]', 'link[rel*="apple-touch-icon"]',
                'link[rel*="image_src"]'):
        for el in doc.select(sel):
            add(el.get("href"))

    for video in doc.select("video[poster]"):
        add(video.get("poster"))

    for el in doc.select('[style*="background"]'):
        style = el.get("style") or ""
        for m in _STYLE_URL_RE.finditer(style):
            add(m.group(1).strip())

    def keep(u: str) -> bool:
        if not u or u.lower().startswith("javascript:"):
            return False
        if u.startswith(("data:", "blob:")):
            return True
        try:
            parse_url(u)
            return True
        except URLParseError:
            return False

    return sorted(u for u in images if keep(u))


# --- metadata (M1) ----------------------------------------------------------

def extract_metadata(html: str) -> dict[str, object]:
    """html.rs:143-296 — values are str or list[str] (reference uses JSON
    values; arrays arise from repeated non-description metas)."""
    doc = parse_html(html)
    out: dict[str, object] = {}

    head = doc.select_first("head")
    search_root: Element = head if head is not None else doc

    title = search_root.select_first("title")
    if title is not None:
        out["title"] = title.text_contents()

    favicon = None
    el = search_root.select_first('link[rel="icon"]')
    if el is not None:
        favicon = el.get("href")
    if favicon is None:
        el = search_root.select_first('link[rel*="icon"]')
        if el is not None:
            favicon = el.get("href")
    if favicon is not None:
        out["favicon"] = favicon

    html_el = doc.select_first("html[lang]")
    if html_el is not None:
        lang = html_el.get("lang")
        if lang is not None:
            out["language"] = lang

    def insert_first(root: Element, attr: str, meta_name: str, out_name: str) -> None:
        found = root.select_first(f'meta[{attr}="{meta_name}"]')
        if found is not None:
            content = found.get("content")
            if content is not None:
                out[out_name] = content

    insert_first(search_root, "property", "og:title", "ogTitle")
    insert_first(search_root, "property", "og:description", "ogDescription")
    insert_first(search_root, "property", "og:url", "ogUrl")
    insert_first(search_root, "property", "og:image", "ogImage")
    insert_first(search_root, "property", "og:audio", "ogAudio")
    insert_first(search_root, "property", "og:determiner", "ogDeterminer")
    insert_first(search_root, "property", "og:locale", "ogLocale")

    for meta in search_root.select('meta[property="og:locale:alternate"]'):
        content = meta.get("content")
        if content is not None:
            existing = out.setdefault("ogLocaleAlternate", [])
            assert isinstance(existing, list)
            existing.append(content)

    insert_first(doc, "property", "og:site_name", "ogSiteName")
    insert_first(doc, "property", "og:video", "ogVideo")
    insert_first(doc, "name", "article:section", "articleSection")
    insert_first(doc, "name", "article:tag", "articleTag")
    insert_first(doc, "property", "article:published_time", "publishedTime")
    insert_first(doc, "property", "article:modified_time", "modifiedTime")
    insert_first(doc, "name", "dcterms.keywords", "dcTermsKeywords")
    insert_first(doc, "name", "dc.description", "dcDescription")
    insert_first(doc, "name", "dc.subject", "dcSubject")
    insert_first(doc, "name", "dcterms.subject", "dcTermsSubject")
    insert_first(doc, "name", "dcterms.audience", "dcTermsAudience")
    insert_first(doc, "name", "dc.type", "dcType")
    insert_first(doc, "name", "dcterms.type", "dcTermsType")
    insert_first(doc, "name", "dc.date", "dcDate")
    insert_first(doc, "name", "dc.date.created", "dcDateCreated")
    insert_first(doc, "name", "dcterms.created", "dcTermsCreated")

    # generic sweep — html.rs:237-293
    for meta in doc.select("meta"):
        name = meta.get("name") or meta.get("property") or meta.get("itemprop")
        if not name:
            continue
        content = meta.get("content")
        if content is None:
            continue
        existing = out.get(name)
        if existing is None:
            out[name] = content
        elif isinstance(existing, str):
            if name == "description":
                out[name] = f"{existing}, {content}"
            elif name != "title":
                out[name] = [existing, content]
        elif isinstance(existing, list):
            if name == "description":
                out[name] = ", ".join([*existing, content])
            else:
                existing.append(content)
    return out


# --- decode (U5) ------------------------------------------------------------

def decode_html(raw: bytes) -> str:
    """fetch/index.ts:67-81 — decode utf-8 (lossy), sniff <meta charset>,
    re-decode with the declared charset if it differs."""
    text = raw.decode("utf-8", errors="replace")
    m = _CHARSET_RE.search(text[:4096])
    if m:
        charset = m.group(1).strip().lower()
        if charset not in ("utf-8", "utf8"):
            try:
                return raw.decode(charset, errors="replace")
            except LookupError:
                pass
    return text


# --- visible text (gatekeeper support) ---------------------------------------

_WS_RE = re.compile(r"\s+")


def visible_text(html: str) -> tuple[str, int]:
    """gatekeeper.ts:136-142 — text with script/style/noscript removed and
    whitespace collapsed; main-content chars = len(text of main/article
    subtrees) or full text length when no main/article."""
    doc = parse_html(html)
    for sel in ("script", "style", "noscript"):
        for el in doc.select(sel):
            el.detach()
    text = _WS_RE.sub(" ", doc.text_contents()).strip()
    main_els = doc.select("main, article")
    main = _WS_RE.sub(" ", "".join(e.text_contents() for e in main_els)).strip()
    return text, (len(main) if main else len(text))


def get_inner_text(html: str) -> str:
    """html.rs:631-648 (get_inner_json) — body text contents."""
    doc = parse_html(html)
    body = doc.body
    return body.text_contents() if body is not None else ""


def extract_attributes(
    html: str, selectors: list[tuple[str, str]]
) -> list[dict]:
    """U4 — html.rs:671-717: generic {selector, attribute} extraction with a
    ``data-`` fallback; invalid selectors yield empty value lists."""
    doc = parse_html(html)
    results = []
    for selector, attribute in selectors:
        values: list[str] = []
        try:
            elements = doc.select(selector)
        except Exception:
            elements = []
        for el in elements:
            value = el.get(attribute)
            if value is not None:
                values.append(value)
                continue
            if not attribute.startswith("data-"):
                value = el.get(f"data-{attribute}")
                if value is not None:
                    values.append(value)
        results.append({"selector": selector, "attribute": attribute,
                        "values": values})
    return results
