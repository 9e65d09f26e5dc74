"""URL rewrite — "fake redirects" (F5).

Transcribed from apps/WebCrawl/src/scraper/scrapeURL/lib/rewriteUrl.ts:3-51:
Google Docs/Slides/Sheets/Drive URLs become their export/download
equivalents; published (/d/e/) variants are left alone."""

from __future__ import annotations

import re

__all__ = ["rewrite_url"]

_DOC_ID = re.compile(r"/document/d/([-\w]+)")
_PRES_ID = re.compile(r"/presentation/d/([-\w]+)")
_FILE_ID = re.compile(r"/file/d/([-\w]+)")
_SHEET_ID = re.compile(r"/spreadsheets/d/([-\w]+)")


def rewrite_url(url: str) -> str | None:
    """Returns the rewritten URL or None when no rewrite applies."""
    if url.startswith(("https://docs.google.com/document/d/",
                       "http://docs.google.com/document/d/")):
        if "/document/d/e/" in url:
            return None
        m = _DOC_ID.search(url)
        if m:
            return f"https://docs.google.com/document/d/{m.group(1)}/export?format=pdf"
    elif url.startswith(("https://docs.google.com/presentation/d/",
                         "http://docs.google.com/presentation/d/")):
        if "/presentation/d/e/" in url:
            return None
        m = _PRES_ID.search(url)
        if m:
            return (f"https://docs.google.com/presentation/d/{m.group(1)}"
                    "/export?format=pdf")
    elif url.startswith(("https://drive.google.com/file/d/",
                         "http://drive.google.com/file/d/")):
        m = _FILE_ID.search(url)
        if m:
            return f"https://drive.google.com/uc?export=download&id={m.group(1)}"
    elif url.startswith(("https://docs.google.com/spreadsheets/d/",
                         "http://docs.google.com/spreadsheets/d/")):
        if "/spreadsheets/d/e/" in url:
            return None
        m = _SHEET_ID.search(url)
        if m:
            return (f"https://docs.google.com/spreadsheets/d/{m.group(1)}"
                    "/gviz/tq?tqx=out:html")
    return None
