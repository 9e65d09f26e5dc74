"""Sitemap seeding — tryGetSitemap semantics (apps/WebCrawl/src/scraper/
WebScraper/crawler.ts:356-456 + sitemap.ts) as a deterministic seed-list
computation shared by the oracle AND the Spark engine (sitemaps are capped
at 25 per crawl, so seeding is inherently driver-scale; the DataFrame-level
bulk path for sitemap corpora lives in sources/sitemap.py).

Per handler batch (crawler.ts:376-405): dedupe the batch, F1-filter with
the running ``leftOfLimit`` budget, dedupe on the normalized URL against
``sitemapSeen``, then emit in order. Handler order is deterministic level
order (the reference's Promise.all recursion is made sequential)."""

from __future__ import annotations

import re
from collections.abc import Callable

from ..kernels.classify import filter_links
from ..kernels.urlkit import URLParseError, normalize_sitemap_url, parse_url
from .sitemap import SITEMAP_LIMIT, process_sitemap

__all__ = ["sitemap_seed_batches", "sitemap_seed_list"]

FetchSitemap = Callable[[str], str | None]  # sitemap url -> xml body

_IPV4_RE = re.compile(r"^(\d{1,3}\.){3}\d{1,3}$")


def _host_of(url: str) -> str | None:
    try:
        return parse_url(url).host
    except URLParseError:
        return None


def sitemap_seed_batches(
    fetch_sitemap: FetchSitemap,
    seed_url: str,
    limit: int = SITEMAP_LIMIT,
) -> list[list[str]]:
    """Recursive sitemap walk → page-URL batches in handler order, with the
    reference's fallback candidates (crawler.ts:606-698):

    1. the seed's own sitemap (seed url itself when it is already .xml,
       else seed/sitemap.xml);
    2. when the seed host is a subdomain (≥3 labels, not www., not an IP):
       the main domain's /sitemap.xml, results filtered to links whose
       hostname endsWith the seed hostname (plain string suffix, matching
       the reference's `linkUrl.hostname.endsWith(hostname)`);
    3. if nothing was contributed yet: baseUrl/sitemap.xml as a last resort
       (crawler.ts:672-698, gated on sitemapCount === 0).
    """
    hit: set[str] = set()
    batches: list[list[str]] = []

    def walk(start: str, url_filter=None) -> int:
        contributed = 0
        todo = [start]
        while todo and len(hit) < limit:
            sm_url = todo.pop(0)
            if sm_url in hit:
                continue
            hit.add(sm_url)
            body = fetch_sitemap(sm_url)
            if body is None:
                continue
            try:
                result = process_sitemap(body)
            except ValueError:
                continue
            for ins in result["instructions"]:
                if ins["action"] == "recurse":
                    todo.extend(u for u in ins["urls"] if u not in hit)
                else:
                    urls = list(ins["urls"])
                    if url_filter is not None:
                        urls = [u for u in urls if url_filter(u)]
                    batches.append(urls)
                    contributed += len(urls)
        return contributed

    start = seed_url if seed_url.lower().endswith((".xml", ".xml.gz")) else (
        seed_url.rstrip("/") + "/sitemap.xml"
    )
    count = walk(start)

    # subdomain → main-domain sitemap, filtered back to the subdomain
    host = _host_of(seed_url)
    if host and not _IPV4_RE.match(host) and ":" not in host:
        parts = host.split(".")
        if len(parts) > 2 and parts[0] != "www":
            main_domain = ".".join(parts[-2:])
            scheme = seed_url.split("://", 1)[0]
            count += walk(
                f"{scheme}://{main_domain}/sitemap.xml",
                url_filter=lambda u: (_host_of(u) or "").endswith(host),
            )

    # nothing found yet → baseUrl/sitemap.xml last resort
    if count == 0 and host:
        u = parse_url(seed_url)
        base = f"{u.scheme}://{u.host}" + (f":{u.port}" if u.port else "")
        walk(base + "/sitemap.xml")
    return batches


def sitemap_seed_list(fetch_sitemap: FetchSitemap, cfg) -> list[str]:
    """The ordered URL list the sitemap contributes to the frontier seed
    (before the BFS loop). ``cfg`` is a frontier CrawlConfig."""
    batches = sitemap_seed_batches(fetch_sitemap, cfg.seed_url)
    left_of_limit = cfg.limit if cfg.limit is not None else None
    sitemap_seen: set[str] = set()
    out: list[str] = []
    for batch in batches:
        # [...new Set(urls)] — crawler.ts:382
        deduped = list(dict.fromkeys(batch))
        opts = cfg.filter_options()
        opts.limit = left_of_limit
        accepted, _ = filter_links(deduped, opts)
        if left_of_limit is not None:
            left_of_limit -= len(accepted)
        for url in accepted:
            norm = normalize_sitemap_url(url)
            if norm not in sitemap_seen:
                sitemap_seen.add(norm)
                out.append(url)
    return out
