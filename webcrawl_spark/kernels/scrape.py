"""Scrape kernel: assemble a full Document row from (url, html bytes,
status), fusing the extraction stages the reference runs per URL:

decode (U5) → clean (X1, onlyMainContent with empty retry X4) → markdown
(X2+X3) → links (L1) → images (L3) → metadata (M1) → gatekeeper (G1) →
usability (G2).

Pipeline order per apps/WebCrawl/src/scraper/scrapeURL/index.ts:158-335 and
transformers/index.ts:10-65. With static page content the reference's
retry/fallback machinery is idempotent, so usability collapses to pure
classification columns (SURVEY.md §2.7 G2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .gatekeeper import GatekeeperResult, Thresholds, evaluate_gatekeeper
from .htmlkit import (
    decode_html,
    extract_images,
    extract_links,
    extract_metadata,
    transform_document,
    transform_html,
)
from .markdown import markdown_from_dom, post_process_markdown
from .urlkit import URLParseError

__all__ = ["ScrapeOptions", "ScrapedDocument", "scrape_page", "markdown_for_page"]


@dataclass(frozen=True)
class ScrapeOptions:
    """apps/WebCrawl/src/types.ts:29-53 (zod defaults)."""

    formats: tuple[str, ...] = ("markdown",)
    include_tags: tuple[str, ...] = ()
    exclude_tags: tuple[str, ...] = ()
    only_main_content: bool = True
    thresholds: Thresholds = Thresholds()


@dataclass
class ScrapedDocument:
    url: str
    markdown: str | None = None
    html: str | None = None  # cleaned html (format "html")
    raw_html: str | None = None
    links: list[str] = field(default_factory=list)
    images: list[str] = field(default_factory=list)
    metadata: dict[str, object] = field(default_factory=dict)
    status_code: int = 200
    content_status: str = "usable"
    block_class: str = "none"
    usable: bool = True
    quality: GatekeeperResult | None = None


def markdown_for_page(
    html: str,
    url: str,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    only_main_content: bool = True,
) -> str:
    """X1+X2+X3 with the X4 empty-retry: build at onlyMainContent, and if
    the result trims to empty rebuild with onlyMainContent=False
    (scrapeURL/index.ts:174-198).

    Consumes the transformed DOM directly (serialize→reparse verified
    round-trip-identical on the corpus — tests/test_htmlkit.py)."""

    def _build(main_only: bool) -> str:
        doc = transform_document(
            html, url, include_tags=include_tags, exclude_tags=exclude_tags,
            only_main_content=main_only,
        )
        body = doc.body
        if body is None:
            return ""
        return post_process_markdown(markdown_from_dom(body))

    md = _build(only_main_content)
    if only_main_content and not md.strip():
        md = _build(False)
    return md


def scrape_page(
    url: str,
    html_bytes: bytes | None,
    status_code: int = 200,
    options: ScrapeOptions = ScrapeOptions(),
) -> ScrapedDocument:
    """One page through the full extraction pipeline. Deterministic, pure."""
    doc = ScrapedDocument(url=url, status_code=status_code)
    if not html_bytes:
        doc.usable = False
        doc.content_status = "thin"
        doc.block_class = "thin"
        return doc
    raw_html = decode_html(html_bytes)
    doc.raw_html = raw_html if "rawHtml" in options.formats else None

    try:
        metadata = extract_metadata(raw_html)
    except Exception:
        metadata = {}
    doc.metadata = metadata
    title = metadata.get("title")
    title_str = title if isinstance(title, str) else ""

    if "markdown" in options.formats:
        try:
            doc.markdown = markdown_for_page(
                raw_html, url,
                include_tags=list(options.include_tags),
                exclude_tags=list(options.exclude_tags),
                only_main_content=options.only_main_content,
            )
        except URLParseError:
            doc.markdown = ""
    if "html" in options.formats:
        try:
            doc.html = transform_html(
                raw_html, url,
                include_tags=list(options.include_tags),
                exclude_tags=list(options.exclude_tags),
                only_main_content=options.only_main_content,
            )
        except URLParseError:
            doc.html = None
    if "links" in options.formats:
        doc.links = extract_links(raw_html, url)
    if "images" in options.formats:
        try:
            doc.images = extract_images(raw_html, url)
        except URLParseError:
            doc.images = []

    quality = evaluate_gatekeeper(
        url, status_code, raw_html, title=title_str,
        thresholds=options.thresholds,
    )
    doc.quality = quality
    doc.content_status = quality.content_status
    doc.block_class = quality.block_class
    # usability — scrapeURL/index.ts:219-241
    doc.usable = quality.content_status == "usable" or (
        not (200 <= status_code < 300 or status_code == 304)
        and quality.block_class != "challenge"
    )
    return doc
