"""In-memory crawl oracles over the same kernels — the ground truth the
Spark engine's ordering/seen-set must match (FIXTURES.md §6).

``reference_crawl`` is a faithful reimplementation of the reference's
sequential BFS loop (apps/WebCrawl/src/services/crawlService.ts:57-134):
FIFO queue.shift(), discovered-set dedup on the *exact resolved URL string*,
per-page filterLinks with ``remaining = limit - discovered.size``, links
admitted only when relativeDepth < maxDepth.

``round_crawl`` generalizes the same semantics to scheduling rounds with a
per-host politeness budget (north rule). With budget=None it emits exactly
``reference_crawl``'s order (BFS FIFO ≡ level-order with discovery-order
levels), which is asserted in tests.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from ..kernels.classify import FilterOptions, filter_links
from ..kernels.crawl import page_links
from ..kernels.urlkit import URLParseError, get_url_depth, parse_url, url_path

__all__ = ["CrawlConfig", "CrawlTrace", "reference_crawl", "round_crawl"]

FetchFn = Callable[[str], str | None]  # url -> html text (None = fetch error)


@dataclass(frozen=True)
class CrawlConfig:
    """CrawlOptions (types.ts:85-98) + north-rule politeness knobs."""

    seed_url: str
    limit: int | None = 100
    max_depth: int = 2
    includes: tuple[str, ...] = ()
    excludes: tuple[str, ...] = ()
    allow_backward_crawling: bool = False
    allow_external_content_links: bool = False
    allow_subdomains: bool = False
    regex_on_full_url: bool = False
    host_budget: int | None = None       # per-round refill per host (None = ∞)
    budget_capacity: int | None = None   # token-bucket cap (None = no carry,
    #                                      i.e. plain per-round budget)
    host_budget_overrides: dict[str, int] = field(default_factory=dict)
    enforce_robots: bool = False          # north rule ON; reference OFF
    robots: dict[str, str] = field(default_factory=dict)  # host -> robots.txt
    use_sitemap: bool = False            # tryGetSitemap pre-seeding
    sitemaps: dict[str, str] = field(default_factory=dict)  # sitemap url -> xml
    priority_mode: bool = False          # north star: priority = depth+host-rank
    host_rank: dict[str, int] = field(default_factory=dict)

    def priority_of(self, url: str) -> int:
        """north_star priority = url depth + host rank (0 in FIFO mode)."""
        if not self.priority_mode:
            return 0
        host = _host_of(url)
        return get_url_depth(url_path(url)) + self.host_rank.get(host, 0)

    def refill_for(self, host: str) -> int | None:
        if host in self.host_budget_overrides:
            return self.host_budget_overrides[host]
        return self.host_budget

    @property
    def base_url(self) -> str:
        u = parse_url(self.seed_url)
        return f"{u.scheme}://{u.host}" + (f":{u.port}" if u.port else "")

    def adjusted_max_depth(self) -> int:
        """getAdjustedMaxDepth (maxDepthUtils.ts:1-8)."""
        return self.max_depth + get_url_depth(url_path(self.seed_url))

    def base_depth(self) -> int:
        return get_url_depth(url_path(self.seed_url))

    def filter_options(self) -> FilterOptions:
        """Robots semantics mirror the reference's shape: one robots body per
        crawl, that of the seed's host (internal links are by definition on
        the base host — crawler.rs:144-158 — so per-candidate-host lookup
        collapses to this)."""
        base_host = parse_url(self.seed_url).host
        robots_txt = self.robots.get(base_host, "") if self.enforce_robots else ""
        return FilterOptions(
            base_url=self.base_url,
            initial_url=self.seed_url,
            max_depth=self.adjusted_max_depth(),
            includes=list(self.includes),
            excludes=list(self.excludes),
            regex_on_full_url=self.regex_on_full_url,
            allow_backward_crawling=self.allow_backward_crawling,
            allow_external_content_links=self.allow_external_content_links,
            allow_subdomains=self.allow_subdomains,
            ignore_robots_txt=not self.enforce_robots,
            robots_txt=robots_txt,
        )


@dataclass
class CrawlTrace:
    fetch_order: list[str] = field(default_factory=list)
    rounds: list[list[str]] = field(default_factory=list)
    discovered: list[str] = field(default_factory=list)  # enqueue order
    errors: list[str] = field(default_factory=list)


def _host_of(url: str) -> str:
    try:
        return parse_url(url).host
    except URLParseError:
        return ""


def _looks_like_html(html: str | None) -> bool:
    return bool(html) and html.strip().startswith("<")


def _seed(enqueue, cfg: CrawlConfig) -> None:
    """crawlService.ts:66-74: seed first, then sitemap batches."""
    enqueue(cfg.seed_url)
    if cfg.use_sitemap and cfg.sitemaps:
        from ..sources.seeding import sitemap_seed_list

        for url in sitemap_seed_list(cfg.sitemaps.get, cfg):
            enqueue(url)


def reference_crawl(fetch: FetchFn, cfg: CrawlConfig) -> CrawlTrace:
    """crawlService.ts:57-134, verbatim semantics."""
    trace = CrawlTrace()
    limit = cfg.limit if cfg.limit is not None else float("inf")
    discovered: set[str] = set()
    queue: list[str] = []

    def enqueue(target: str) -> None:
        if target in discovered or len(discovered) >= limit:
            return
        discovered.add(target)
        queue.append(target)
        trace.discovered.append(target)

    _seed(enqueue, cfg)
    base_depth = cfg.base_depth()
    processed = 0

    while queue and processed < limit:
        current = queue.pop(0)
        processed += 1
        html = fetch(current)
        if html is None:
            trace.errors.append(current)
            continue
        trace.fetch_order.append(current)
        if _looks_like_html(html):
            relative_depth = max(0, get_url_depth(url_path(current)) - base_depth)
            links = page_links(html, current, cfg.filter_options())
            remaining = max(0, limit - len(discovered))
            if remaining > 0 and relative_depth < cfg.max_depth:
                opts = cfg.filter_options()
                opts.limit = None if remaining == float("inf") else int(remaining)
                accepted, _ = filter_links(links, opts)
                for link in accepted:
                    enqueue(link)
    return trace


def round_crawl(fetch: FetchFn, cfg: CrawlConfig) -> CrawlTrace:
    """Round-scheduled variant: per round, take queued URLs in seq order
    admitting at most ``host_budget`` per host (over-budget URLs stay queued);
    fetch in seq order; expand links in fetch order. Matches
    ``reference_crawl`` exactly when host_budget is None."""
    trace = CrawlTrace()
    limit = cfg.limit if cfg.limit is not None else float("inf")
    discovered: set[str] = set()
    queue: list[str] = []  # (still-queued URLs in seq order)
    seq_of: dict[str, int] = {}

    def enqueue(target: str) -> None:
        if target in discovered or len(discovered) >= limit:
            return
        discovered.add(target)
        seq_of[target] = len(seq_of)
        queue.append(target)
        trace.discovered.append(target)

    _seed(enqueue, cfg)
    base_depth = cfg.base_depth()
    processed = 0
    tokens: dict[str, float] = {}  # token-bucket state (carry-over mode)
    use_bucket = cfg.budget_capacity is not None

    while queue and processed < limit:
        # --- selection order: (priority, seq) — FIFO when priority off ---
        if cfg.priority_mode:
            queue.sort(key=lambda u: (cfg.priority_of(u), seq_of[u]))
        # --- selection under politeness budget / token bucket ---
        if use_bucket:
            # refill each host with queued work once (accumulate up to cap;
            # idle hosts do not bank tokens)
            for h in {_host_of(url) for url in queue}:
                refill = cfg.refill_for(h)
                if refill is None:
                    tokens[h] = float("inf")
                else:
                    tokens[h] = min(cfg.budget_capacity,
                                    tokens.get(h, 0) + refill)
        per_host: dict[str, int] = {}
        selected: list[str] = []
        kept: list[str] = []
        for url in queue:
            if processed + len(selected) >= limit:
                kept.append(url)
                continue
            host = _host_of(url)
            used = per_host.get(host, 0)
            allowance = tokens.get(host) if use_bucket else cfg.refill_for(host)
            if allowance is not None and used >= allowance:
                kept.append(url)
                continue
            per_host[host] = used + 1
            selected.append(url)
        if use_bucket:
            for h, used in per_host.items():
                if tokens.get(h, 0) != float("inf"):
                    tokens[h] = tokens.get(h, 0) - used
        if not selected:
            break
        queue = kept
        trace.rounds.append(list(selected))

        # --- fetch + expand in seq order ---
        for current in selected:
            processed += 1
            html = fetch(current)
            if html is None:
                trace.errors.append(current)
                continue
            trace.fetch_order.append(current)
            if _looks_like_html(html):
                relative_depth = max(0, get_url_depth(url_path(current)) - base_depth)
                links = page_links(html, current, cfg.filter_options())
                remaining = max(0, limit - len(discovered))
                if remaining > 0 and relative_depth < cfg.max_depth:
                    opts = cfg.filter_options()
                    opts.limit = None if remaining == float("inf") else int(remaining)
                    accepted, _ = filter_links(links, opts)
                    for link in accepted:
                        enqueue(link)
    return trace
