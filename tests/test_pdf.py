"""PDF engine (S3/U6): build→metadata→text round-trip vectors mirroring
pdf.rs:13-45 (page count, Info-title-first lookup) and
engines/pdf/index.ts:21-34 + 87-120 (escaped text as html AND markdown,
150 ms/page budget), plus the Spark operator path."""

import re

import pytest

from webcrawl_spark.kernels.pdfkit import (
    LINES_PER_PAGE,
    MILLISECONDS_PER_PAGE,
    build_pdf,
    escape_html,
    pdf_metadata,
    pdf_text,
    scrape_pdf_result,
)


class TestKernel:
    def test_single_page_roundtrip(self):
        lines = ["hello world", "second line"]
        pdf = build_pdf(lines, title="One Pager")
        assert pdf.startswith(b"%PDF-1.4")
        assert pdf_metadata(pdf) == (1, "One Pager")
        assert pdf_text(pdf) == "hello world\nsecond line"

    def test_multi_page_layout(self):
        lines = [f"line {i}" for i in range(LINES_PER_PAGE * 2 + 5)]
        pdf = build_pdf(lines, title="Big")
        num_pages, title = pdf_metadata(pdf)
        assert num_pages == 3
        expected = "\n\n".join(
            "\n".join(lines[i:i + LINES_PER_PAGE])
            for i in range(0, len(lines), LINES_PER_PAGE)
        )
        assert pdf_text(pdf) == expected

    def test_special_chars_and_escaping(self):
        lines = ['quotes " and \' apos', "tags <b> & amp", r"back\slash (parens)",
                 "ünïcödé ✓"]
        pdf = build_pdf(lines, title="T (x) \\ y")
        assert pdf_metadata(pdf)[1] == "T (x) \\ y"
        assert pdf_text(pdf) == "\n".join(lines)
        r = scrape_pdf_result(pdf)
        # escape-html entity set, applied to the extracted text
        assert r["html"] == r["markdown"] == escape_html("\n".join(lines))
        assert "&quot;" in r["html"] and "&#39;" in r["html"]
        assert "&lt;b&gt;" in r["html"] and "&amp;" in r["html"]

    def test_title_fallback_without_info(self):
        """pdf.rs:32-41: no trailer Info → first object carrying /Title."""
        pdf = build_pdf(["x"], title=None)
        assert pdf_metadata(pdf) == (1, None)
        # splice a /Title into the Page object (not referenced from Info)
        patched = pdf.replace(b"/Type /Page /Parent",
                              b"/Type /Page /Title (Fallback)  /Parent", 1)
        assert pdf_metadata(patched)[1] == "Fallback"

    def test_title_whitespace_trimmed(self):
        pdf = build_pdf(["x"], title="  padded  ")
        assert pdf_metadata(pdf)[1] == "padded"

    def test_time_budget(self):
        lines = [f"l{i}" for i in range(LINES_PER_PAGE * 4)]  # 4 pages
        pdf = build_pdf(lines)
        budget = 4 * MILLISECONDS_PER_PAGE
        ok = scrape_pdf_result(pdf, timeout_ms=budget)
        assert ok["ok"] and not ok["insufficient_time"]
        tight = scrape_pdf_result(pdf, timeout_ms=budget - 1)
        assert tight["insufficient_time"] and tight["markdown"] == ""
        # max_pages caps the effective count (index.ts:93-95)
        capped = scrape_pdf_result(pdf, max_pages=2, timeout_ms=budget - 1)
        assert capped["num_pages"] == 2 and not capped["insufficient_time"]

    def test_garbage_payloads(self):
        assert scrape_pdf_result(None)["ok"] is False
        assert scrape_pdf_result(b"")["ok"] is False
        r = scrape_pdf_result(b"%PDF-1.4 garbage with no objects")
        assert r["num_pages"] == 0 and r["markdown"] == ""
        # non-pdf content (e.g. an HTML error page) → failed engine result
        # (the reference refuses non-pdf content-types, index.ts:75-86)
        assert scrape_pdf_result(b"<html><body>hi</body></html>")["ok"] is False

    def test_xref_offsets_valid(self):
        """The writer's xref offsets must point at the 'N 0 obj' headers."""
        pdf = build_pdf(["a", "b"], title="X")
        m = re.search(rb"xref\n0 (\d+)\n(.*?)trailer", pdf, re.S)
        entries = m.group(2).splitlines()[1:]  # skip the free entry
        for i, entry in enumerate(entries, start=1):
            off = int(entry.split()[0])
            assert pdf[off:].startswith(b"%d 0 obj" % i)


class TestSparkOperator:
    def test_scrape_pdfs_matches_kernel(self, spark):
        from pyspark.sql import functions as F

        from webcrawl_spark.operators.pdf import (
            build_pdf_udf, pdf_lines_col, scrape_pdfs,
        )

        rows = [(i, f"doc body {i} " * (20 * (i + 1))) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        pdfs = df.select(
            "doc_id", "text",
            build_pdf_udf(40)(
                pdf_lines_col(F.col("text"), 50),
                F.concat(F.lit("t-"), F.col("doc_id").cast("string")),
            ).alias("payload"),
        )
        out = scrape_pdfs(pdfs, timeout_ms=60000).collect()
        for r in out:
            text = r["text"]
            lines = [text[i:i + 50] for i in range(0, max(1, len(text)), 50)]
            expected = scrape_pdf_result(
                build_pdf(lines, f"t-{r['doc_id']}"), timeout_ms=60000)
            assert r["pdf"]["ok"]
            assert r["pdf"]["num_pages"] == expected["num_pages"]
            assert r["pdf"]["title"] == f"t-{r['doc_id']}"
            assert r["pdf"]["markdown"] == expected["markdown"]

    def test_engine_routing_to_pdf(self, spark):
        """S5: .pdf URLs route to the pdf engine choice."""
        from pyspark.sql import functions as F

        from webcrawl_spark.functions import engine_choice_col

        df = spark.createDataFrame(
            [("https://a.com/x.pdf",), ("https://a.com/x.PDF?q=1",),
             ("https://a.com/x.html",), ("https://a.com/doc.docx",)],
            "url string",
        )
        rows = df.select("url", engine_choice_col(F.col("url")).alias("e")) \
                 .collect()
        assert [r["e"] for r in rows] == ["pdf", "pdf", "fetch", "document"]
