"""URL kernel: WHATWG-ish parse/join, canonicalization, depth, normalize.

Semantics re-derived from the reference (all paths under /root/reference/):

- URL resolution / serialization mirrors the Rust ``url`` crate (WHATWG) as
  used by packages/firecrawl-rs/src/crawler.rs:239-277 — notably an empty path
  on an http(s) URL serializes as "/", hosts are lowercased, and default ports
  are dropped.
- ``get_url_depth``: packages/firecrawl-rs/src/crawler.rs:137-142 — count of
  non-empty path segments excluding ``index.php``/``index.html``.
- ``normalize_sitemap_url``: apps/WebCrawl/src/scraper/WebScraper/
  crawler.ts:368-374 — strip scheme, leading ``www.``, trailing ``/``.
- ``canonicalize_url`` is new (mandated by BASELINE.json north_star):
  lowercase host, strip fragment and default ports, sort query params.

Pure Python, no third-party deps; exercised at scale only through Arrow
pandas UDFs (webcrawl_spark.functions).
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import quote, urljoin, urlsplit

__all__ = [
    "URLParseError",
    "WUrl",
    "parse_url",
    "join_url",
    "get_url_depth",
    "canonicalize_url",
    "normalize_sitemap_url",
    "url_host",
    "url_path",
]

# Schemes the WHATWG spec calls "special" — they get a netloc and a non-empty
# path on serialization.
_SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}


class URLParseError(ValueError):
    """Raised when a URL cannot be parsed (maps to URL_PARSE_ERROR)."""


@dataclass(frozen=True)
class WUrl:
    """A parsed, normalized absolute URL (WHATWG-flavored serialization)."""

    scheme: str
    userinfo: str
    host: str
    port: int | None
    path: str
    query: str | None
    fragment: str | None

    def __str__(self) -> str:  # serialization == Rust url::Url::as_str()
        if self.scheme in _SPECIAL_SCHEMES or self.host:
            netloc = self.host
            if self.userinfo:
                netloc = f"{self.userinfo}@{netloc}"
            if self.port is not None:
                netloc = f"{netloc}:{self.port}"
            out = f"{self.scheme}://{netloc}{self.path}"
        else:
            # opaque path (mailto:, tel:, data:, javascript: ...)
            out = f"{self.scheme}:{self.path}"
        if self.query is not None:
            out += f"?{self.query}"
        if self.fragment is not None:
            out += f"#{self.fragment}"
        return out


def _normalize_path(path: str, scheme: str, has_host: bool) -> str:
    if scheme in _SPECIAL_SCHEMES or has_host:
        if not path:
            return "/"
        if not path.startswith("/"):
            return "/" + path
    return path


def parse_url(url: str) -> WUrl:
    """Parse an absolute URL string. Raises URLParseError like url::Url::parse."""
    url = url.strip()
    if not url:
        raise URLParseError("empty url")
    parts = urlsplit(url)
    if not parts.scheme:
        raise URLParseError(f"relative URL without a base: {url!r}")
    scheme = parts.scheme.lower()
    if parts.netloc:
        host = (parts.hostname or "").lower()
        if not host and scheme in _SPECIAL_SCHEMES:
            raise URLParseError(f"empty host: {url!r}")
        try:
            port = parts.port
        except ValueError as e:  # invalid port
            raise URLParseError(str(e)) from e
        if port is not None and port == _SPECIAL_SCHEMES.get(scheme):
            port = None
        userinfo = ""
        if parts.username is not None:
            userinfo = parts.username
            if parts.password is not None:
                userinfo += f":{parts.password}"
        path = _normalize_path(parts.path, scheme, True)
    else:
        if scheme in _SPECIAL_SCHEMES:
            raise URLParseError(f"special scheme without host: {url!r}")
        host, port, userinfo = "", None, ""
        path = parts.path
    # WHATWG percent-encodes a handful of characters; keep existing escapes.
    if host:
        path = quote(path, safe="/%:@!$&'()*+,;=~.-_[]")
    query = parts.query if ("?" in url.split("#", 1)[0]) else None
    fragment = parts.fragment if "#" in url else None
    return WUrl(scheme, userinfo, host, port, path, query, fragment)


def join_url(base: str, link: str) -> WUrl:
    """base.join(link) per WHATWG — crawler.rs:271 ``base_url.join(&link)``."""
    base_parsed = parse_url(base)  # raises if base itself is bad
    link = link.strip()
    # WHATWG: an absolute special-scheme link with an empty authority
    # ("https://") is a parse error; Python's urljoin would silently inherit
    # the base netloc instead.
    lp = urlsplit(link)
    if lp.scheme in _SPECIAL_SCHEMES and link.startswith(f"{lp.scheme}://") and not lp.netloc:
        raise URLParseError(f"empty host: {link!r}")
    # urljoin treats unknown schemes as opaque and returns them untouched,
    # matching url::Url::join for mailto:/tel:/javascript: targets.
    joined = urljoin(str(base_parsed), link)
    return parse_url(joined)


def url_host(url: str) -> str:
    """Lowercased host of an absolute URL ('' on parse failure)."""
    try:
        return parse_url(url).host
    except URLParseError:
        return ""


def url_path(url: str) -> str:
    """Path component ('' on parse failure)."""
    try:
        return parse_url(url).path
    except URLParseError:
        return ""


def get_url_depth(path: str) -> int:
    """Path depth — crawler.rs:137-142 (and maxDepthUtils.ts:1-15, which
    passes a full URL through ``new URL(...).pathname`` first; callers here
    must pass the *path*)."""
    return sum(
        1
        for segment in path.split("/")
        if segment and segment not in ("index.php", "index.html")
    )


def canonicalize_url(url: str) -> str:
    """North-rule canonical form: lowercase host, strip fragment and default
    ports, sort query params (BASELINE.json north_star). Unparseable input
    canonicalizes to '' so downstream filters drop it."""
    try:
        u = parse_url(url)
    except URLParseError:
        return ""
    query = u.query
    if query:
        # sort key=value pairs byte-wise; keep duplicates
        query = "&".join(sorted(query.split("&")))
    elif query == "":
        query = None  # drop bare '?'
    return str(WUrl(u.scheme, u.userinfo, u.host, u.port, u.path, query, None))


def normalize_sitemap_url(url: str) -> str:
    """Sitemap-dedup normalization — crawler.ts:368-374."""
    out = url
    for prefix in ("https://", "http://"):
        if out.startswith(prefix):
            out = out[len(prefix):]
            break
    if out.startswith("www."):
        out = out[4:]
    if out.endswith("/"):
        out = out[:-1]
    return out
