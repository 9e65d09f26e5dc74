"""Crawl-path link extraction (L2): the in-page pipeline the reference runs
for every fetched page — raw hrefs (html.rs:62-103) → per-href filterURL F2
(crawler.rs:396-557) → absolutize → dedupe preserving first-seen order
(crawler.ts:471-545)."""

from __future__ import annotations

from .classify import FilterOptions, filter_url
from .htmlkit import extract_raw_links
from .urlkit import URLParseError, join_url

__all__ = ["page_links"]


def page_links(html: str, page_url: str, opts: FilterOptions) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for href in extract_raw_links(html):
        ok, resolved, _ = filter_url(href, page_url, opts)
        if ok and resolved:
            try:
                normalized = str(join_url(page_url, resolved))
            except URLParseError:
                continue
            if normalized not in seen:
                seen.add(normalized)
                out.append(normalized)
    return out
