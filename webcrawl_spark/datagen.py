"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-§5).

Generates a site graph over H hosts (with deliberately hot hosts for skew
tests), renders each page's HTML from a seeded construct corpus covering
every branch of the extraction kernels, and materializes the ``pages`` table
(url, warc_ts, html:binary, text, lang) whose ``text`` column is the golden
byte-identical markdown computed by the scrape kernel.

Everything is a pure function of (seed, url) — page content does not depend
on generation order, so distributed generation (mapInPandas over a url list)
produces identical bytes to local generation.
"""

from __future__ import annotations

import datetime as dt
import gzip
import random
from dataclasses import dataclass, field

from .kernels.scrape import markdown_for_page

__all__ = ["SiteSpec", "build_site", "render_page_html", "page_row", "pages_rows"]

_EPOCH = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "crawl frontier spark shuffle partition parquet vector arrow schema "
    "catalyst codegen broadcast salt skew bloom cuckoo robots sitemap host "
    "politeness budget token bucket lineage metric checkpoint resume round "
    "markdown extract link image metadata quality threshold content page"
).split()


@dataclass
class PageSpec:
    url: str
    depth: int
    child_links: list[str] = field(default_factory=list)  # in-document order


@dataclass
class SiteSpec:
    seed: int
    hosts: list[str]
    pages: dict[str, PageSpec]
    robots: dict[str, str]          # host -> robots.txt body
    sitemaps: dict[str, str]        # sitemap url -> xml
    sitemaps_gz: dict[str, bytes] = field(default_factory=dict)
    density: int = 1                # body-size multiplier (≈ real-web KB scale)

    def urls(self) -> list[str]:
        return sorted(self.pages)


def _rng_for(seed: int, key: str) -> random.Random:
    return random.Random(f"{seed}:{key}")


def build_site(
    seed: int = 42,
    n_hosts: int = 20,
    pages_per_host: int = 100,
    n_hot_hosts: int = 2,
    hot_factor: int = 6,
    density: int = 1,
) -> SiteSpec:
    """Site graph: per host a path tree /sec{i}/art{j}; hot hosts get
    ``hot_factor``× the pages (skew fixture, FIXTURES.md §1)."""
    hosts = [f"host{i}.example.com" for i in range(n_hosts)]
    pages: dict[str, PageSpec] = {}
    robots: dict[str, str] = {}
    sitemaps: dict[str, str] = {}

    for hi, host in enumerate(hosts):
        n_pages = pages_per_host * (hot_factor if hi < n_hot_hosts else 1)
        base = f"https://{host}"
        rng = _rng_for(seed, host)
        # tree shape: root → sections → articles
        n_sections = max(2, n_pages // 12)
        section_urls = [f"{base}/sec{i}" for i in range(n_sections)]
        article_urls: dict[str, list[str]] = {s: [] for s in section_urls}
        remaining = n_pages - 1 - n_sections
        for j in range(max(0, remaining)):
            sec = section_urls[j % n_sections]
            article_urls[sec].append(f"{sec}/art{j // n_sections}")

        root = PageSpec(url=f"{base}/", depth=0, child_links=list(section_urls))
        pages[root.url] = root
        for s in section_urls:
            pages[s] = PageSpec(url=s, depth=1, child_links=list(article_urls[s]))
            for a in article_urls[s]:
                # leaf pages occasionally link cross-host: to another host's
                # root (denied as external main page unless subdomains) and
                # to a non-main section page (admissible when
                # allow_external_content_links is set — crawler.rs:345-351)
                extra: list[str] = []
                if rng.random() < 0.3:
                    other = hosts[rng.randrange(len(hosts))]
                    extra.append(f"https://{other}/")
                if rng.random() < 0.35:
                    other = hosts[rng.randrange(len(hosts))]
                    extra.append(f"https://{other}/sec0")
                pages[a] = PageSpec(url=a, depth=2, child_links=extra)

        # robots: every third host disallows a section
        if hi % 3 == 0 and len(section_urls) > 1:
            blocked_path = section_urls[1][len(base):]
            robots[host] = (
                f"User-agent: *\nDisallow: {blocked_path}\nCrawl-delay: 1\n"
            )
        else:
            robots[host] = "User-agent: *\nDisallow:\n"

        # sitemap: index → per-section urlsets (plus file-ext noise entries)
        sub_sitemaps = []
        for i, s in enumerate(section_urls[:3]):
            sm_url = f"{base}/sitemap-{i}.xml"
            locs = "".join(
                f"  <url>\n    <loc>{u}</loc>\n  </url>\n"
                for u in [s, *article_urls[s][:5]]
            )
            noise = f"  <url>\n    <loc>{base}/logo.png</loc>\n  </url>\n"
            sitemaps[sm_url] = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                + locs + noise + "</urlset>"
            )
            sub_sitemaps.append(sm_url)
        index_entries = "".join(
            f"  <sitemap>\n    <loc>{u}</loc>\n  </sitemap>\n"
            for u in sub_sitemaps
        )
        sitemaps[f"{base}/sitemap.xml"] = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + index_entries + "</sitemapindex>"
        )

    spec = SiteSpec(seed=seed, hosts=hosts, pages=pages, robots=robots,
                    sitemaps=sitemaps, density=density)
    # one gzipped sitemap fixture
    first = f"https://{hosts[0]}/sitemap-0.xml"
    if first in sitemaps:
        spec.sitemaps_gz[first + ".gz"] = gzip.compress(
            sitemaps[first].encode(), mtime=0
        )
    return spec


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def render_page_html(spec: SiteSpec, url: str) -> str:
    """Pure function of (spec.seed, url): seeded subset of the HTML construct
    corpus (FIXTURES.md §2) with the page's graph links embedded in order."""
    page = spec.pages[url]
    rng = _rng_for(spec.seed, url)
    lang = rng.choice(["en", "en", "en", "de", "fr", "es"])
    title = f"Page {url.split('/')[-1] or 'home'} — {_sentence(rng, 2)}"

    head = [f"<title>{title}</title>", '<meta charset="utf-8">']
    head.append(f'<meta name="description" content="{_sentence(rng, 8)}">')
    if rng.random() < 0.5:
        head.append(f'<meta property="og:title" content="{title}">')
        head.append(f'<meta property="og:image" content="{url.rstrip("/")}/og.png">')
    if rng.random() < 0.3:
        head.append('<link rel="icon" href="/favicon.ico">')
    if rng.random() < 0.2:
        head.append('<script type="application/ld+json">{"@type":"WebPage"}</script>')

    boiler = [
        "<header><nav><a href=\"/\">Home</a></nav></header>",
        '<div class="sidebar"><p>side content</p></div>',
    ]

    main: list[str] = [f"<h1>{title}</h1>"]
    # body paragraphs — enough text to clear thin thresholds on most pages;
    # density scales toward realistic 30-100 KB web pages for benchmarks
    n_paras = (rng.randint(1, 4) if rng.random() < 0.15
               else rng.randint(6, 12) * spec.density)
    for _ in range(n_paras):
        main.append(f"<p>{_sentence(rng, rng.randint(25, 60))}</p>")
    if rng.random() < 0.4:
        main.append("<h2>" + _sentence(rng, 3) + "</h2>")
        items = "".join(f"<li>{_sentence(rng, 4)}</li>" for _ in range(rng.randint(2, 5)))
        main.append(f"<ul>{items}</ul>")
    if rng.random() < 0.25:
        rows = "".join(
            f"<tr><td>{_sentence(rng, 2)}</td><td>{rng.randint(1, 999)}</td></tr>"
            for _ in range(rng.randint(2, 4))
        )
        main.append(
            "<table><thead><tr><th>Name</th><th>Count</th></tr></thead>"
            f"<tbody>{rows}</tbody></table>"
        )
    if rng.random() < 0.2:
        main.append(f"<pre><code>spark.read.parquet('{url}')\ndf.count()</code></pre>")
    if rng.random() < 0.2:
        main.append(f"<blockquote><p>{_sentence(rng, 10)}</p></blockquote>")
    if rng.random() < 0.3:
        main.append(f'<img src="img{rng.randint(0, 9)}.png" alt="{_sentence(rng, 2)}">')

    # graph links in document order + deterministic noise links
    for child in page.child_links:
        main.append(f'<a href="{child}">{_sentence(rng, 3)}</a>')
    if rng.random() < 0.4:
        main.append('<a href="mailto:team@example.com">mail us</a>')
    if rng.random() < 0.3:
        main.append('<a href="/assets/brochure.zip">download</a>')
    if rng.random() < 0.3:
        main.append('<a href="#section">jump</a>')
    if rng.random() < 0.2:
        main.append('<a href="https://twitter.com/acct">tweet</a>')

    body = "".join(boiler) + "<main>" + "".join(main) + "</main><footer><p>© example</p></footer>"
    return (
        f'<html lang="{lang}"><head>{"".join(head)}</head>'
        f"<body>{body}</body></html>"
    )


def page_row(spec: SiteSpec, url: str, index: int) -> tuple:
    """(url, warc_ts, html(bytes), text, lang) — text is the golden markdown
    from the scrape kernel (byte-identity contract anchor)."""
    html = render_page_html(spec, url)
    raw = html.encode("utf-8")
    text = markdown_for_page(html, url)
    lang = html.split('lang="', 1)[1].split('"', 1)[0]
    ts = _EPOCH + dt.timedelta(seconds=index)
    return (url, ts, raw, text, lang)


def pages_rows(spec: SiteSpec):
    for i, url in enumerate(spec.urls()):
        yield page_row(spec, url, i)
