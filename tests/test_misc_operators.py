"""F5 rewrite, U4 extract_attributes, A2 engpicker, S5 engine choice,
F3 blocklist, and sitemap-seeded crawl parity."""

import pytest
from pyspark.sql import functions as F

from webcrawl_spark.kernels.htmlkit import extract_attributes
from webcrawl_spark.kernels.rewrite import rewrite_url


class TestRewriteUrl:
    # rewriteUrl.ts:3-51
    def test_google_doc(self):
        assert rewrite_url(
            "https://docs.google.com/document/d/abc-123_X/edit"
        ) == "https://docs.google.com/document/d/abc-123_X/export?format=pdf"

    def test_published_doc_skipped(self):
        assert rewrite_url(
            "https://docs.google.com/document/d/e/2PACX-abc/pub"
        ) is None

    def test_presentation(self):
        assert rewrite_url(
            "http://docs.google.com/presentation/d/p1/edit"
        ) == "https://docs.google.com/presentation/d/p1/export?format=pdf"

    def test_drive_file(self):
        assert rewrite_url(
            "https://drive.google.com/file/d/FILE99/view"
        ) == "https://drive.google.com/uc?export=download&id=FILE99"

    def test_spreadsheet(self):
        assert rewrite_url(
            "https://docs.google.com/spreadsheets/d/s1/edit#gid=0"
        ) == "https://docs.google.com/spreadsheets/d/s1/gviz/tq?tqx=out:html"

    def test_other_urls_untouched(self):
        assert rewrite_url("https://example.com/page") is None


class TestExtractAttributes:
    # html.rs:671-717
    def test_basic_and_data_fallback(self):
        html = (
            '<div class="c" role="main">x</div>'
            '<div class="c" data-role="aside">y</div>'
            '<span id="s" data-val="7">z</span>'
        )
        out = extract_attributes(html, [(".c", "role"), ("#s", "val")])
        assert out[0]["values"] == ["main", "aside"]
        assert out[1]["values"] == ["7"]

    def test_data_prefix_no_double_fallback(self):
        html = '<div class="c" data-x="1">a</div>'
        out = extract_attributes(html, [(".c", "data-x"), (".c", "x")])
        assert out[0]["values"] == ["1"]
        assert out[1]["values"] == ["1"]  # fallback to data-x


class TestEngpicker:
    def test_verdict_tls_ok(self, spark):
        from webcrawl_spark.operators.engpicker import engpicker_verdict

        rows = [
            ("u1", "hello world content", "hello world content"),
            ("u2", "some long page text here", "some long page text her"),
            ("u3", None, "tls got something"),          # cdp failed
            ("u4", "cdp text ok", ""),                   # tls failed
        ]
        df = spark.createDataFrame(
            rows, "url string, cdp_markdown string, tls_markdown string"
        )
        v = engpicker_verdict(df, similarity_threshold=0.8,
                              success_rate_threshold=0.5,
                              cdp_failure_threshold=0.5).first()
        assert v["total_urls"] == 4
        assert v["cdp_failed_count"] == 1
        assert v["tls_client_ok_count"] == 2
        assert v["verdict"] == "TLS_CLIENT_OK"

    def test_verdict_uncertain_on_cdp_failures(self, spark):
        from webcrawl_spark.operators.engpicker import engpicker_verdict

        rows = [("u1", None, "x"), ("u2", None, "y"), ("u3", "a", "a")]
        df = spark.createDataFrame(
            rows, "url string, cdp_markdown string, tls_markdown string"
        )
        v = engpicker_verdict(df, cdp_failure_threshold=0.5).first()
        assert v["verdict"] == "UNCERTAIN"


class TestNativeHelpers:
    def test_engine_choice(self, spark):
        from webcrawl_spark.functions import engine_choice_col

        df = spark.createDataFrame(
            [("https://e.com/a.pdf",), ("https://e.com/d.docx",),
             ("https://e.com/page?x=1.pdf",), ("https://e.com/p",)],
            "url string",
        )
        rows = df.select(engine_choice_col(F.col("url")).alias("e")).collect()
        assert [r["e"] for r in rows] == ["pdf", "document", "fetch", "fetch"]

    def test_blocklist(self, spark):
        from webcrawl_spark.functions import blocklist_filter

        df = spark.createDataFrame(
            [("https://bad.com/x",), ("https://sub.bad.com/x",),
             ("https://good.com/x",), ("https://bad.com/jobs/listing",)],
            "url string",
        )
        keep = blocklist_filter(F.col("url"), ["bad.com"], ["jobs"])
        rows = df.select(keep.alias("k")).collect()
        assert [r["k"] for r in rows] == [False, False, True, True]

    def test_blocklist_empty_noop(self, spark):
        from webcrawl_spark.functions import blocklist_filter

        df = spark.createDataFrame([("https://any.com/x",)], "url string")
        assert df.filter(blocklist_filter(F.col("url"))).count() == 1

    def test_rewrite_udf(self, spark):
        from webcrawl_spark.functions import rewrite_url_udf

        df = spark.createDataFrame(
            [("https://drive.google.com/file/d/F/view",),
             ("https://plain.com/x",)], "url string",
        )
        rows = df.select(rewrite_url_udf()(F.col("url")).alias("r")).collect()
        assert rows[0]["r"] == "https://drive.google.com/uc?export=download&id=F"
        assert rows[1]["r"] == "https://plain.com/x"


class TestSitemapSeededCrawl:
    def test_seed_list_deterministic(self, small_site):
        from webcrawl_spark.frontier.oracle import CrawlConfig
        from webcrawl_spark.sources.seeding import sitemap_seed_list

        host = small_site.hosts[0]
        cfg = CrawlConfig(
            seed_url=f"https://{host}/", limit=50, max_depth=3,
            allow_backward_crawling=True,
            use_sitemap=True, sitemaps=dict(small_site.sitemaps),
        )
        a = sitemap_seed_list(cfg.sitemaps.get, cfg)
        b = sitemap_seed_list(cfg.sitemaps.get, cfg)
        assert a == b and len(a) > 0
        assert all(not u.endswith(".png") for u in a)

    def test_engine_matches_oracle_with_sitemap(self, spark, small_site,
                                                tmp_path):
        from webcrawl_spark.datagen import render_page_html
        from webcrawl_spark.frontier.crawl import SparkCrawl
        from webcrawl_spark.frontier.oracle import CrawlConfig, round_crawl

        host = small_site.hosts[0]
        cfg = CrawlConfig(
            seed_url=f"https://{host}/", limit=30, max_depth=3,
            allow_backward_crawling=True, host_budget=6,
            use_sitemap=True, sitemaps=dict(small_site.sitemaps),
        )

        def fetch(url):
            if url not in small_site.pages:
                return None
            return render_page_html(small_site, url)

        oracle = round_crawl(fetch, cfg)
        rows = [(u, fetch(u).encode()) for u in small_site.urls()]
        pages_df = spark.createDataFrame(rows, "url string, html binary")
        crawl = SparkCrawl(spark, pages_df, cfg, str(tmp_path / "smcrawl"))
        crawl.run()
        assert crawl.fetch_order() == oracle.fetch_order


class TestGetInnerText:
    """U3 — html.rs:631-648 get_inner_json: body text contents."""

    def test_body_text(self):
        from webcrawl_spark.kernels.htmlkit import get_inner_text

        assert get_inner_text(
            "<html><head><title>t</title></head>"
            "<body><p>a <b>b</b></p><div>c</div></body></html>"
        ) == "a bc"

    def test_no_body(self):
        from webcrawl_spark.kernels.htmlkit import get_inner_text

        assert get_inner_text("") == ""
