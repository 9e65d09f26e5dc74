"""Priority-queue frontier (north star: priority = depth + host-rank):
shallow URLs are fetched before deep ones regardless of discovery order;
engine matches the oracle's priority schedule."""

import pytest

from webcrawl_spark.datagen import build_site, render_page_html
from webcrawl_spark.frontier.crawl import SparkCrawl
from webcrawl_spark.frontier.oracle import CrawlConfig, round_crawl


@pytest.fixture(scope="module")
def site():
    return build_site(seed=23, n_hosts=3, pages_per_host=30, n_hot_hosts=0)


@pytest.fixture(scope="module")
def fetch(site):
    def _fetch(url):
        return render_page_html(site, url) if url in site.pages else None
    return _fetch


def test_oracle_priority_orders_by_depth(site, fetch):
    seed = f"https://{site.hosts[0]}/"
    cfg = CrawlConfig(seed_url=seed, limit=None, max_depth=3,
                      allow_backward_crawling=True, host_budget=4,
                      priority_mode=True)
    trace = round_crawl(fetch, cfg)
    # within every round, priorities are non-decreasing
    for rnd in trace.rounds:
        prios = [cfg.priority_of(u) for u in rnd]
        assert prios == sorted(prios)


def test_host_rank_demotes_host(site, fetch):
    seed = f"https://{site.hosts[0]}/"
    demoted = site.hosts[1]
    cfg = CrawlConfig(seed_url=seed, limit=None, max_depth=3,
                      allow_backward_crawling=True,
                      allow_external_content_links=True, host_budget=50,
                      priority_mode=True, host_rank={demoted: 100})
    trace = round_crawl(fetch, cfg)
    flat = trace.fetch_order
    if any(demoted in u for u in flat):
        first_demoted = min(i for i, u in enumerate(flat) if demoted in u)
        same_round = None
        for rnd in trace.rounds:
            hosts = [u for u in rnd]
            if any(demoted in u for u in hosts):
                # demoted host fetches come after others in its round
                idx = [i for i, u in enumerate(hosts) if demoted in u]
                assert min(idx) >= len(hosts) - len(idx)
                break


def test_engine_priority_parity(spark, site, fetch, tmp_path):
    seed = f"https://{site.hosts[0]}/"
    cfg = CrawlConfig(seed_url=seed, limit=45, max_depth=3,
                      allow_backward_crawling=True, host_budget=5,
                      priority_mode=True)
    oracle = round_crawl(fetch, cfg)
    rows = [(u, fetch(u).encode()) for u in site.urls()]
    pages_df = spark.createDataFrame(rows, "url string, html binary")
    crawl = SparkCrawl(spark, pages_df, cfg, str(tmp_path / "prio"))
    crawl.run()
    assert crawl.fetch_order() == oracle.fetch_order
