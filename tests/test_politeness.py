"""Token-bucket politeness: oracle semantics and engine parity, including
per-host overrides and carry-over across rounds."""

import pytest

from webcrawl_spark.datagen import build_site, render_page_html
from webcrawl_spark.frontier.crawl import SparkCrawl
from webcrawl_spark.frontier.oracle import CrawlConfig, round_crawl


@pytest.fixture(scope="module")
def site():
    return build_site(seed=11, n_hosts=3, pages_per_host=36, n_hot_hosts=1,
                      hot_factor=2)


@pytest.fixture(scope="module")
def fetch(site):
    def _fetch(url):
        return render_page_html(site, url) if url in site.pages else None
    return _fetch


class TestOracleBucket:
    def test_carry_over_allows_burst(self, site, fetch):
        seed = f"https://{site.hosts[0]}/"
        fixed = round_crawl(fetch, CrawlConfig(
            seed_url=seed, limit=None, max_depth=3,
            allow_backward_crawling=True, host_budget=2))
        bucket = round_crawl(fetch, CrawlConfig(
            seed_url=seed, limit=None, max_depth=3,
            allow_backward_crawling=True, host_budget=2, budget_capacity=6))
        # same coverage, bucket mode can take bigger rounds after banking
        assert sorted(bucket.fetch_order) == sorted(fixed.fetch_order)
        assert max(len(r) for r in bucket.rounds) >= max(len(r) for r in fixed.rounds)
        assert len(bucket.rounds) <= len(fixed.rounds)

    def test_overrides(self, site, fetch):
        seed = f"https://{site.hosts[0]}/"
        host = site.hosts[0]
        trace = round_crawl(fetch, CrawlConfig(
            seed_url=seed, limit=None, max_depth=3,
            allow_backward_crawling=True, host_budget=100,
            host_budget_overrides={host: 1}))
        # throttled host: exactly one fetch of it per round
        for rnd in trace.rounds:
            assert sum(1 for u in rnd if f"//{host}/" in u or u.endswith(host + "/")) <= 1


class TestEngineBucketParity:
    def test_token_bucket_matches_oracle(self, spark, site, fetch, tmp_path):
        seed = f"https://{site.hosts[0]}/"
        cfg = CrawlConfig(
            seed_url=seed, limit=50, max_depth=3,
            allow_backward_crawling=True, host_budget=3, budget_capacity=9)
        oracle = round_crawl(fetch, cfg)
        rows = [(u, fetch(u).encode()) for u in site.urls()]
        pages_df = spark.createDataFrame(rows, "url string, html binary")
        crawl = SparkCrawl(spark, pages_df, cfg, str(tmp_path / "bucket"))
        crawl.run()
        assert crawl.fetch_order() == oracle.fetch_order
        assert [len(r) for r in oracle.rounds] == [
            r["fetched"] for r in crawl.metrics().orderBy("round").collect()
        ]

    def test_bucket_resume(self, spark, site, fetch, tmp_path):
        seed = f"https://{site.hosts[0]}/"
        cfg = CrawlConfig(
            seed_url=seed, limit=40, max_depth=3,
            allow_backward_crawling=True, host_budget=2, budget_capacity=8)
        rows = [(u, fetch(u).encode()) for u in site.urls()]
        pages_df = spark.createDataFrame(rows, "url string, html binary")
        full = SparkCrawl(spark, pages_df, cfg, str(tmp_path / "full"))
        full.run()
        part = SparkCrawl(spark, pages_df, cfg, str(tmp_path / "part"))
        part.run(max_rounds=3)
        resumed = SparkCrawl(spark, pages_df, cfg, str(tmp_path / "part"))
        resumed.run()
        assert resumed.fetch_order() == full.fetch_order()
