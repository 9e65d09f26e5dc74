"""operators/anchors.py + kernels/htmlkit.py extract_anchors — the
anchor-text index: kernel resolution parity with extract_links, no-dedup
occurrence semantics, aggregation + endorsing-host counts, deterministic
top-anchor selection."""

from pyspark.sql import functions as F

from webcrawl_spark.kernels.htmlkit import extract_anchors, extract_links
from webcrawl_spark.operators.anchors import (
    anchor_pairs,
    anchor_text_index,
    top_anchor_per_target,
)


class TestKernel:
    def test_resolution_matches_extract_links(self):
        html = (
            "<a href='https://b.com/x'>one</a>"
            "<a href='/rel'>two</a>"
            "<a href='#frag'>skip</a>"
            "<a href='https://b.com/x'>one again</a>"
        )
        anchors = extract_anchors(html, "https://a.com/d/")
        # same URLs extract_links resolves, occurrence-by-occurrence
        assert [h for h, _ in anchors] == [
            "https://b.com/x", "https://a.com/rel", "https://b.com/x"]
        assert set(extract_links(html, "https://a.com/d/")) == \
            {h for h, _ in anchors}

    def test_no_dedup_and_texts(self):
        html = ("<a href='https://b.com/'>  spaced   text </a>"
                "<a href='https://b.com/'><img src='x.png'></a>")
        got = extract_anchors(html, "https://a.com/")
        assert got == [("https://b.com/", "spaced text"),
                       ("https://b.com/", "")]

    def test_nested_markup_text_contents(self):
        html = "<a href='https://b.com/'><b>bold</b> and <i>italic</i></a>"
        assert extract_anchors(html, "https://a.com/") == [
            ("https://b.com/", "bold and italic")]

    def test_base_href_respected(self):
        html = ("<head><base href='https://cdn.example.com/root/'></head>"
                "<body><a href='p'>p</a></body>")
        assert extract_anchors(html, "https://a.com/")[0][0] == \
            "https://cdn.example.com/root/p"


PAGES = [
    # two hosts endorse b.com/x with the same anchor; a.com repeats it
    ("https://a.com/", "<a href='https://b.com/x'>great page</a>"
                       "<a href='https://b.com/x'>great page</a>"
                       "<a href='https://a.com/self'>nav</a>"),
    ("https://c.com/", "<a href='https://b.com/x'>great page</a>"
                       "<a href='https://b.com/x'>other words</a>"),
]


def _pages_df(spark):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in PAGES], "url string, html binary")


class TestOperator:
    def test_pairs_drop_intra_host(self, spark):
        got = {(r["src_host"], r["target"], r["anchor"])
               for r in anchor_pairs(_pages_df(spark)).collect()}
        assert ("a.com", "https://a.com/self", "nav") not in got
        assert ("a.com", "https://b.com/x", "great page") in got

    def test_index_counts_and_hosts(self, spark):
        idx = {(r["target"], r["anchor"]): (r["n"], r["n_hosts"])
               for r in anchor_text_index(_pages_df(spark)).collect()}
        assert idx[("https://b.com/x", "great page")] == (3, 2)
        assert idx[("https://b.com/x", "other words")] == (1, 1)

    def test_min_count_filters(self, spark):
        idx = anchor_text_index(_pages_df(spark), min_count=2)
        rows = idx.collect()
        assert {(r["target"], r["anchor"]) for r in rows} == {
            ("https://b.com/x", "great page")}

    def test_top_anchor_prefers_hosts_then_count(self, spark):
        idx = anchor_text_index(_pages_df(spark))
        top = {r["target"]: r["anchor"]
               for r in top_anchor_per_target(idx).collect()}
        assert top["https://b.com/x"] == "great page"

    def test_max_len_caps_shuffle_rows(self, spark):
        long_txt = "x" * 1000
        df = spark.createDataFrame(
            [("https://a.com/",
              f"<a href='https://b.com/'>{long_txt}</a>".encode())],
            "url string, html binary")
        row = anchor_pairs(df, max_len=64).first()
        assert len(row["anchor"]) == 64

    def test_html_pruned_before_shuffle(self, spark):
        """The aggregation's exchange must not carry the html column."""
        plan = anchor_text_index(_pages_df(spark)) \
            ._jdf.queryExecution().executedPlan().toString()
        ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
        assert ex and all("html" not in ln for ln in ex)
