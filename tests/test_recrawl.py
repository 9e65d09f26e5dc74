"""operators/recrawl.py — Cho & Garcia-Molina change-rate estimation and
the due-time schedule: formula vectors vs a python reference, change
detection off consecutive fingerprints, clamping, defaults, and the
url-partitioned (never global) window plan."""

import math

from pyspark.sql import functions as F

from webcrawl_spark.operators.recrawl import (
    recrawl_schedule,
    url_change_rates,
)


def _lam(n_intervals, x, span):
    return -n_intervals * math.log((n_intervals - x + 0.5)
                                   / (n_intervals + 0.5)) / span


def _history(spark):
    rows = []
    # u_daily: fetched 5 times a day apart, changes every time
    fps = ["a", "b", "c", "d", "e"]
    rows += [("u_daily", i * 86400, fps[i]) for i in range(5)]
    # u_static: fetched 4 times, never changes
    rows += [("u_static", i * 86400, "same") for i in range(4)]
    # u_half: 5 fetches, changes twice
    fps = ["x", "x", "y", "y", "z"]
    rows += [("u_half", i * 43200, fps[i]) for i in range(5)]
    # u_once: a single fetch — no estimate
    rows += [("u_once", 1000, "q")]
    return spark.createDataFrame(
        rows, "url string, fetch_ts long, fingerprint string")


class TestRates:
    def test_change_counts(self, spark):
        got = {r["url"]: (r["n_fetches"], r["n_changes"])
               for r in url_change_rates(_history(spark)).collect()}
        assert got == {"u_daily": (5, 4), "u_static": (4, 0),
                       "u_half": (5, 2), "u_once": (1, 0)}

    def test_lambda_formula(self, spark):
        got = {r["url"]: r["lam"]
               for r in url_change_rates(_history(spark)).collect()}
        assert abs(got["u_daily"] - _lam(4, 4, 4 * 86400)) < 1e-15
        assert abs(got["u_static"] - _lam(3, 0, 3 * 86400)) < 1e-15
        assert abs(got["u_half"] - _lam(4, 2, 4 * 43200)) < 1e-15
        assert got["u_once"] is None

    def test_out_of_order_history_is_sorted(self, spark):
        rows = [("u", 200, "b"), ("u", 100, "a"), ("u", 300, "b")]
        df = spark.createDataFrame(
            rows, "url string, fetch_ts long, fingerprint string")
        r = url_change_rates(df).first()
        assert r["n_changes"] == 1          # a→b→b: one change
        assert r["span"] == 200

    def test_window_is_url_partitioned(self, spark):
        plan = url_change_rates(_history(spark)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(url" in plan
        # a global (unpartitioned) sort window would show SinglePartition
        assert "SinglePartition" not in plan


class TestSchedule:
    def test_clamps_and_default(self, spark):
        sched = {r["url"]: r for r in recrawl_schedule(
            url_change_rates(_history(spark)), now=10 * 86400,
            min_interval=3600, max_interval=10 * 86400,
            default_interval=5 * 86400).collect()}
        # u_daily changes ~daily: interval ≈ 1/λ, inside the clamp range
        lam = _lam(4, 4, 4 * 86400)
        assert abs(sched["u_daily"]["interval"] - 1 / lam) < 1e-6
        # u_static: tiny λ → clamped to max
        assert sched["u_static"]["interval"] == 10 * 86400
        # u_once: no estimate → default
        assert sched["u_once"]["interval"] == 5 * 86400
        assert sched["u_once"]["due_now"] is True

    def test_due_flag_boundary(self, spark):
        df = spark.createDataFrame(
            [("u", 10, 0, 0, 1000, None)],
            "url string, n_fetches long, n_changes long, span long, "
            "last_ts long, lam double")
        r = recrawl_schedule(df, now=1100, default_interval=100).first()
        assert r["next_due"] == 1100.0 and r["due_now"] is True
        r2 = recrawl_schedule(df, now=1099, default_interval=100).first()
        assert r2["due_now"] is False


class TestFetchHistory:
    def test_crawl_results_to_history(self, spark):
        from webcrawl_spark.operators.recrawl import fetch_history

        # two crawl runs a day apart; p1 changed, p2 didn't
        rows = [("https://a.com/p1", "v1 text", 1000),
                ("https://a.com/p2", "same", 1000),
                ("https://a.com/p1", "v2 text", 1000 + 86400),
                ("https://a.com/p2", "same", 1000 + 86400)]
        res = spark.createDataFrame(
            rows, "url string, markdown string, crawl_ts long")
        hist = fetch_history(res)
        assert hist.columns == ["url", "fetch_ts", "fingerprint"]
        rates = {r["url"]: r for r in url_change_rates(hist).collect()}
        assert rates["https://a.com/p1"]["n_changes"] == 1
        assert rates["https://a.com/p2"]["n_changes"] == 0

    def test_fingerprint_is_jvm_side(self, spark):
        from webcrawl_spark.operators.recrawl import fetch_history

        res = spark.createDataFrame(
            [("u", "m", 1)], "url string, markdown string, crawl_ts long")
        plan = fetch_history(res) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan

    def test_end_to_end_with_engine_results(self, spark, tmp_path):
        """A real crawl's crawl_result feeds the scheduler: every fetched
        URL gets a default-interval due time after one observation."""
        from webcrawl_spark.datagen import build_site, render_page_html
        from webcrawl_spark.frontier.crawl import SparkCrawl
        from webcrawl_spark.frontier.oracle import CrawlConfig
        from webcrawl_spark.operators.recrawl import fetch_history

        site = build_site(seed=3, n_hosts=2, pages_per_host=6)
        pages = spark.createDataFrame(
            [(u, render_page_html(site, u).encode()) for u in site.urls()],
            "url string, html binary")
        cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/",
                          max_depth=2, allow_backward_crawling=True)
        crawl = SparkCrawl(spark, pages, cfg, str(tmp_path / "rc"))
        crawl.run()
        res = crawl.io.read("crawl_result") \
            .withColumn("crawl_ts", F.lit(5_000_000))
        sched = recrawl_schedule(
            url_change_rates(fetch_history(res)),
            now=5_000_000, default_interval=86400)
        rows = sched.collect()
        assert len(rows) == crawl.fetch_log().count() and len(rows) > 3
        assert all(r["interval"] == 86400.0 for r in rows)
        assert all(r["due_now"] is False for r in rows)
