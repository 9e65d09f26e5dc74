"""End-to-end Spark slice: pages → scrape → byte-identical markdown vs the
golden ``text`` column (input_hint invariant), plus classify/canonicalize
UDF round-trips."""

from pyspark.sql import functions as F

from webcrawl_spark.kernels.classify import FilterOptions
from webcrawl_spark.kernels.scrape import ScrapeOptions
from webcrawl_spark.operators.scrape import scrape


def test_markdown_byte_identical(spark, pages_df):
    out = scrape(pages_df, ScrapeOptions(formats=("markdown",)))
    mismatches = out.filter(F.col("markdown") != F.col("text")).count()
    assert mismatches == 0
    assert out.count() == pages_df.count()


def test_links_extracted(spark, pages_df, small_site):
    out = scrape(pages_df, ScrapeOptions(formats=("links",)))
    row = out.filter(F.col("url") == f"https://{small_site.hosts[0]}/").first()
    # graph child links must appear among extracted links (plus /Home nav)
    children = small_site.pages[f"https://{small_site.hosts[0]}/"].child_links
    for child in children:
        assert child in row["links"]


def test_quality_columns(spark, pages_df):
    out = scrape(pages_df, ScrapeOptions(formats=("markdown",)))
    stats = out.groupBy("quality.content_status").count().collect()
    statuses = {r[0] for r in stats}
    assert "usable" in statuses  # most synthetic pages clear the thresholds


def test_html_format_byte_identical_to_kernel(spark, pages_df):
    """Format "html" (cleaned transformHtml output, types.ts:3-16) wired
    through scrape() must match the kernel byte-for-byte (the kernel itself
    is golden-tested in test_htmlkit/test_goldens)."""
    from webcrawl_spark.kernels.htmlkit import decode_html, transform_html

    out = scrape(pages_df, ScrapeOptions(formats=("html",)))
    rows = out.select("url", "html", "html_clean").collect()
    assert rows
    for r in rows:
        expected = transform_html(decode_html(bytes(r["html"])), r["url"])
        assert r["html_clean"] == expected


def test_classify_udf_matches_kernel(spark, small_site):
    from webcrawl_spark.functions import classify_links_udf
    from webcrawl_spark.kernels.classify import classify_link

    base = f"https://{small_site.hosts[0]}"
    opts = FilterOptions(
        base_url=base, initial_url=base + "/", max_depth=3,
        allow_backward_crawling=True,
    )
    links = [
        f"{base}/sec0", f"{base}/x.png", "mailto:a@b.c",
        "https://twitter.com/x", f"{base}/a/b/c/d/e",
        f"https://other-host.org/page", f"{base}/page#frag",
    ]
    df = spark.createDataFrame([(l,) for l in links], "link string")
    out = df.withColumn("cls", classify_links_udf(opts)(F.col("link"))).collect()
    for row in out:
        ok, url, reason = classify_link(row["link"], opts)
        assert row["cls"]["allowed"] == ok
        assert row["cls"]["denial_reason"] == reason


def test_canonicalize_udf(spark):
    from webcrawl_spark.functions import canonicalize_url

    df = spark.createDataFrame(
        [("https://WWW.Ex.COM:443/p?b=2&a=1#f",), ("nonsense",)], "url string"
    )
    rows = df.withColumn("c", canonicalize_url("url")).collect()
    assert rows[0]["c"] == "https://www.ex.com/p?a=1&b=2"
    assert rows[1]["c"] == ""


def test_scrape_routed_mixed_corpus(spark, small_site):
    """S5 end-to-end: one DataFrame with html, pdf, xlsx, docx and junk
    payloads routed through the right engine, each producing the same
    output its dedicated path produces."""
    from webcrawl_spark.kernels.document import (
        build_docx, build_xlsx, convert_document, docx_to_html,
    )
    from webcrawl_spark.kernels.pdfkit import build_pdf, scrape_pdf_result
    from webcrawl_spark.kernels.scrape import markdown_for_page
    from webcrawl_spark.operators.scrape import scrape_routed

    html_page = b"<html><body><main><h1>Hi</h1><p>Body</p></main></body></html>"
    pdf = build_pdf(["pdf line one", "pdf line two"], title="P")
    xlsx = build_xlsx({"S": [["a", "b"]]})
    docx = build_docx([("h2", "Doc"), ("p", "text")])
    rows = [
        ("https://x.com/page", bytearray(html_page)),
        ("https://x.com/file.pdf", bytearray(pdf)),
        ("https://x.com/book.xlsx", bytearray(xlsx)),
        ("https://x.com/memo.docx", bytearray(docx)),
        ("https://x.com/broken.pdf", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r for r in scrape_routed(df).collect()}

    assert got["https://x.com/page"]["engine_choice"] == "fetch"
    assert got["https://x.com/page"]["scraped"]["markdown"] == \
        markdown_for_page(html_page.decode(), "https://x.com/page")

    pr = got["https://x.com/file.pdf"]["scraped"]
    expected_pdf = scrape_pdf_result(pdf)
    assert pr["markdown"] == expected_pdf["markdown"] == pr["html"]

    for u, payload in (("https://x.com/book.xlsx", xlsx),
                       ("https://x.com/memo.docx", docx)):
        r = got[u]["scraped"]
        conv = convert_document(payload)
        assert r["html"] == conv
        assert r["markdown"] == markdown_for_page(conv, u)

    bad = got["https://x.com/broken.pdf"]["scraped"]
    assert bad["ok"] is False and not bad["markdown"]


def test_scrape_plan_prunes_unused_formats(spark, pages_df):
    """Selecting only markdown must not evaluate the links/images UDFs."""
    out = scrape(
        pages_df,
        ScrapeOptions(formats=("markdown", "links", "images")),
    ).select("url", "markdown")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "links_udf" not in plan
    assert "images_udf" not in plan
