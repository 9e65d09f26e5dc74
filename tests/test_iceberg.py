"""Iceberg backend gate (the north rule names Iceberg for the frontier
tables).

The sandbox ships no iceberg-spark-runtime jar and has no network, so the
REAL-catalog parity tests below are skip-gated on ``iceberg_available``:
they are the executable definition of the 1:1 claim and run green on any
cluster with the jar + catalog confs from iceberg_io.py's header. What
always runs here: the backend factory contract (explicit fallback, no
silent behavior change), identifier hygiene, and availability detection
against a session without a catalog."""

import warnings

import pytest

from webcrawl_spark.sources.iceberg_io import (
    IcebergTableIO,
    _ident,
    iceberg_available,
    make_tableio,
)
from webcrawl_spark.sources.tableio import TableIO


class TestFactory:
    def test_default_is_parquet(self, spark, tmp_path):
        io = make_tableio(spark, str(tmp_path / "a"))
        assert isinstance(io, TableIO) and io.kind == "parquet"

    def test_unavailable_iceberg_falls_back_with_warning(self, spark,
                                                         tmp_path):
        assert iceberg_available(spark) is False  # no catalog conf/jar here
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            io = make_tableio(spark, str(tmp_path / "b"), backend="iceberg")
        assert isinstance(io, TableIO)
        assert any("iceberg" in str(x.message).lower() for x in w)

    def test_env_toggle(self, spark, tmp_path, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_TABLE_BACKEND", "parquet")
        assert make_tableio(spark, str(tmp_path / "c")).kind == "parquet"

    def test_ident_rejects_injection(self):
        with pytest.raises(ValueError):
            _ident("frontier; DROP TABLE x")
        with pytest.raises(ValueError):
            _ident("a.b")
        assert _ident("frontier_queued") == "frontier_queued"


requires_iceberg = pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="needs iceberg-spark-runtime jar + catalog conf (unavailable in "
           "this sandbox: no jar, no network); run with --run-iceberg on a "
           "session configured per iceberg_io.py header — these tests ARE "
           "the 1:1 binding gate",
)


@requires_iceberg
class TestIcebergParity:
    """The SAME parity contracts test_frontier/test_politeness assert for
    the parquet backend, on real Iceberg tables."""

    def _run(self, spark, tmp_path, monkeypatch, **eng_kw):
        from webcrawl_spark.datagen import build_site, render_page_html
        from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
        from webcrawl_spark.frontier.oracle import CrawlConfig, round_crawl

        monkeypatch.setenv("SPARK_GRAFT_TABLE_BACKEND", "iceberg")
        site = build_site(seed=7, n_hosts=3, pages_per_host=30,
                          n_hot_hosts=1, hot_factor=2)
        rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
        pages = spark.createDataFrame(rows, "url string, html binary")
        cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", limit=30,
                          max_depth=3, allow_backward_crawling=True,
                          host_budget=4)

        def fetch(url):
            return (render_page_html(site, url)
                    if url in site.pages else None)

        oracle = round_crawl(fetch, cfg)
        crawl = SparkCrawl(spark, pages, cfg, str(tmp_path / "ice"),
                           engine=EngineConfig(**eng_kw))
        assert isinstance(crawl.io, IcebergTableIO)
        crawl.run()
        return crawl, oracle

    def test_order_and_seen_set_parity(self, spark, tmp_path, monkeypatch):
        crawl, oracle = self._run(spark, tmp_path, monkeypatch)
        assert crawl.fetch_order() == oracle.fetch_order
        seen = {r["url"] for r in crawl.frontier().select("url").collect()}
        assert seen == set(oracle.discovered)

    def test_resume_parity(self, spark, tmp_path, monkeypatch):
        from webcrawl_spark.frontier.crawl import SparkCrawl
        crawl, oracle = self._run(spark, tmp_path, monkeypatch)
        resumed = SparkCrawl(spark, crawl.pages, crawl.cfg,
                             str(tmp_path / "ice"))
        resumed.run()  # no-op resume on a finished crawl
        assert resumed.fetch_order() == oracle.fetch_order
