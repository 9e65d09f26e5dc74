"""Document converter (S4 xlsx slice) + engine-forcing (F4) + sitemap
fallback candidates (crawler.ts:606-698) vectors."""

from webcrawl_spark.kernels.document import (
    build_xlsx,
    render_document_html,
    xlsx_to_document,
    xlsx_to_html,
)

HTML_HEAD = (
    '<!DOCTYPE html><html lang="en"><head><meta charset="UTF-8">'
    '<meta name="viewport" content="width=device-width, initial-scale=1.0">'
    "<title>Document</title></head><body><main>"
)


class TestXlsxProvider:
    def test_sheet_to_table(self):
        """xlsx.rs:19-67: H2 per sheet + table of body rows."""
        x = build_xlsx({"Data": [["name", "value"], ["alpha", 3.0],
                                 ["beta", 2.5], ["flag", True]]})
        doc = xlsx_to_document(x)
        assert [b.kind for b in doc.blocks] == ["heading", "table"]
        assert doc.blocks[0].text == "Data"
        # calamine Data→string: Float(3.0) → "3" (Rust f64::to_string),
        # Bool(true) → "true"
        assert doc.blocks[1].rows == [["name", "value"], ["alpha", "3"],
                                      ["beta", "2.5"], ["flag", "true"]]

    def test_html_rendering_shape(self):
        """html.rs:11-237 maud output: compact, tbody-wrapped, single
        normal paragraph per cell rendered bare (render_blocks_inline)."""
        x = build_xlsx({"S": [["a", "b<c&d"]]})
        html = xlsx_to_html(x)
        assert html.startswith(HTML_HEAD)
        assert "<h2>S</h2><table><tbody><tr><td>a</td>" in html
        assert "<td>b&lt;c&amp;d</td></tr></tbody></table>" in html
        assert html.endswith("</main></body></html>")
        assert "<p>" not in html  # bare inlines, not wrapped paragraphs

    def test_empty_cells_and_sheets(self):
        x = build_xlsx({"A": [["x", "", "z"]], "Empty": []})
        html = xlsx_to_html(x)
        # empty cell (no blocks) → bare <td></td> (xlsx.rs:38-44)
        assert "<tr><td>x</td><td></td><td>z</td></tr>" in html
        assert "<h2>Empty</h2><table><tbody></tbody></table>" in html

    def test_multi_sheet_order(self):
        x = build_xlsx({"First": [["1"]], "Second": [["2"]]})
        html = xlsx_to_html(x)
        assert html.index("<h2>First</h2>") < html.index("<h2>Second</h2>")

    def test_spark_operator(self, spark):
        from pyspark.sql import functions as F

        from webcrawl_spark.operators.document import (
            build_xlsx_rows_udf, scrape_documents,
        )

        df = spark.createDataFrame(
            [(1, [["k", "v"], ["a", "1"]]), (2, [["only"]])],
            "id int, cells array<array<string>>",
        )
        pay = df.select(
            "id", "cells",
            build_xlsx_rows_udf("T")(F.col("cells")).alias("payload"))
        rows = scrape_documents(pay).orderBy("id").collect()
        for r in rows:
            expected = xlsx_to_html(
                build_xlsx({"T": [list(x) for x in r["cells"]]}))
            assert r["doc_html"] == expected

    def test_document_feeds_markdown_pipeline(self):
        """The rendered HTML goes through the normal markdown kernel."""
        from webcrawl_spark.kernels.scrape import markdown_for_page

        x = build_xlsx({"Report": [["metric", "value"], ["rows", 42.0]]})
        md = markdown_for_page(xlsx_to_html(x), "https://x.com/r.xlsx")
        assert "Report" in md
        assert "metric" in md and "42" in md


class TestDocxProvider:
    def test_paragraphs_headings_quotes(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([
            ("h1", "Title text"),
            ("p", "Plain body & <markup>"),
            ("quote", "Quoted line"),
            ("h3", "Sub"),
        ])
        html = docx_to_html(d)
        assert "<h1>Title text</h1>" in html
        assert "<p>Plain body &amp; &lt;markup&gt;</p>" in html
        assert "<blockquote><p>Quoted line</p></blockquote>" in html
        assert "<h3>Sub</h3>" in html
        assert html.startswith(HTML_HEAD)

    def test_tables(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("table", [["a", "b"], ["c", "d"]])])
        html = docx_to_html(d)
        assert ("<table><tbody><tr><td>a</td><td>b</td></tr>"
                "<tr><td>c</td><td>d</td></tr></tbody></table>") in html

    def test_outline_level_heading(self):
        """docx.rs:326-330: outlineLvl val v → Heading(v+1)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_document

        d = build_docx([("p", "X")])
        patched = d  # build a doc with outlineLvl manually
        import io as _io
        import zipfile as _zip
        zf = _zip.ZipFile(_io.BytesIO(d))
        doc_xml = zf.read("word/document.xml").decode()
        doc_xml = doc_xml.replace(
            "<w:p><w:r>",
            '<w:p><w:pPr><w:outlineLvl w:val="1"/></w:pPr><w:r>', 1)
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as out:
            for n in zf.namelist():
                out.writestr(n, doc_xml if n == "word/document.xml"
                             else zf.read(n))
        doc = docx_to_document(buf.getvalue())
        assert doc.blocks[0].kind == "heading" and doc.blocks[0].level == 2
        _ = patched

    def test_provider_dispatch(self):
        from webcrawl_spark.kernels.document import (
            build_docx, build_xlsx, convert_document,
        )

        assert "<h2>S</h2>" in convert_document(build_xlsx({"S": [["1"]]}))
        assert "<p>hi</p>" in convert_document(build_docx([("p", "hi")]))
        assert convert_document(b"not a zip") is None

    def test_docx_feeds_markdown_pipeline(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html
        from webcrawl_spark.kernels.scrape import markdown_for_page

        html = docx_to_html(build_docx([
            ("h1", "Report"), ("p", "Body paragraph."),
            ("table", [["k", "v"], ["rows", "42"]]),
        ]))
        md = markdown_for_page(html, "https://x.com/r.docx")
        assert "# Report" in md or "Report" in md
        assert "Body paragraph." in md


class TestOdtProvider:
    def test_paragraphs_headings_tables(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([
            ("h1", "ODT Title"),
            ("p", "Body & <stuff>"),
            ("table", [["a", "b"], ["c", "d"]]),
            ("h3", "Deep"),
        ])
        html = odt_to_html(d)
        assert html.startswith(HTML_HEAD)
        assert "<h1>ODT Title</h1>" in html
        assert "<p>Body &amp; &lt;stuff&gt;</p>" in html
        assert ("<table><tbody><tr><td>a</td><td>b</td></tr>"
                "<tr><td>c</td><td>d</td></tr></tbody></table>") in html
        assert "<h3>Deep</h3>" in html

    def test_text_s_expansion(self):
        """<text:s text:c='3'/> expands to three spaces."""
        from webcrawl_spark.kernels.document import build_odt, odt_to_document

        d = build_odt([("p", "x")])
        import io as _io
        import zipfile as _zip
        zf = _zip.ZipFile(_io.BytesIO(d))
        xml = zf.read("content.xml").decode().replace(
            "<text:p>x</text:p>",
            '<text:p>a<text:s text:c="3"/>b</text:p>')
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as out:
            for n in zf.namelist():
                out.writestr(n, xml if n == "content.xml" else zf.read(n))
        doc = odt_to_document(buf.getvalue())
        assert doc.blocks[0].text == "a   b"

    def test_dispatch_and_markdown(self):
        from webcrawl_spark.kernels.document import build_odt, convert_document
        from webcrawl_spark.kernels.scrape import markdown_for_page

        d = build_odt([("h2", "Notes"), ("p", "hello odt")])
        html = convert_document(d)
        assert html is not None and "<h2>Notes</h2>" in html
        md = markdown_for_page(html, "https://x.com/n.odt")
        assert "hello odt" in md


class TestRtfProvider:
    RTF = (b"{\\rtf1\\ansi{\\fonttbl{\\f0 Helvetica;}}{\\info{\\title Sec}}\n"
           b"Intro with \\'e9 accent and \\u21487 ? char.\\par\n"
           b"Second {\\b inner} text.\\par\n"
           b"\\trowd A1\\cell B1\\cell\\row\n"
           b"\\trowd A2\\cell B2\\cell\\row\n"
           b"\\par Tail \\{lit\\}.\\par}")

    def test_paragraphs_tables_escapes(self):
        from webcrawl_spark.kernels.document import rtf_to_document

        doc = rtf_to_document(self.RTF)
        kinds = [b.kind for b in doc.blocks]
        assert kinds == ["paragraph", "paragraph", "table", "paragraph"]
        assert doc.blocks[0].text == "Intro with é accent and 可 char."
        assert doc.blocks[1].text == "Second inner text."
        assert doc.blocks[2].rows == [["A1", "B1"], ["A2", "B2"]]
        assert doc.blocks[3].text == "Tail {lit}."

    def test_destination_groups_hidden(self):
        """fonttbl/info/stylesheet content must not leak into the text
        (rtf.rs skips destinations; same contract)."""
        from webcrawl_spark.kernels.document import rtf_to_html

        html = rtf_to_html(self.RTF)
        assert "Helvetica" not in html and "Sec" not in html.replace(
            "Second", "")

    def test_dispatch_and_garbage(self):
        from webcrawl_spark.kernels.document import convert_document

        assert "<p>Intro" in convert_document(self.RTF)
        assert convert_document(b"{\\rtfX") is not None or True  # no crash
        assert convert_document(b"plain text") is None


class TestDocxStylingAndLists:
    def test_bold_italic_runs(self):
        """docx.rs:548-556 rPr b/i → Strong/Em, em nested inside strong
        (ResolvedRunStyle.apply order, docx.rs:519-536)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("plain ", ""), ("bold", "b"), (" and ", ""),
                               ("both", "bi")])])
        html = docx_to_html(d)
        assert ("<p>plain <strong>bold</strong> and "
                "<strong><em>both</em></strong></p>") in html

    def test_unstyled_paragraph_unchanged(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", "just text")])
        assert "<p>just text</p>" in docx_to_html(d)

    def test_ordered_and_unordered_lists(self):
        """numPr + numbering.xml numFmt: decimal → <ol>, bullet → <ul>
        (docx.rs:742-757); items render bare inlines (html.rs:191-200)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([
            ("ol", ["first", "second"]),
            ("ul", [[("hot", "i")], "cold"]),
        ])
        html = docx_to_html(d)
        assert "<ol><li>first</li><li>second</li></ol>" in html
        assert "<ul><li><em>hot</em></li><li>cold</li></ul>" in html

    def test_adjacent_lists_split_on_numid(self):
        """Consecutive paragraphs with different numId start a NEW list
        (docx.rs parse_list break conditions)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("ol", ["a"]), ("ul", ["b"]), ("p", "after")])
        html = docx_to_html(d)
        assert "<ol><li>a</li></ol><ul><li>b</li></ul><p>after</p>" in html

    def test_read_on_off_semantics(self):
        """docx.rs:539-546: missing val → on; 0/false/off → off."""
        from xml.etree import ElementTree as ET

        from webcrawl_spark.kernels.document import _read_on_off, _W

        def el(attrs: str):
            return ET.fromstring(f'<w:b xmlns:w="{_W}" {attrs}/>')

        assert _read_on_off(None) is None
        assert _read_on_off(el("")) is True
        assert _read_on_off(el('w:val="0"')) is False
        assert _read_on_off(el('w:val="false"')) is False
        assert _read_on_off(el('w:val="off"')) is False
        assert _read_on_off(el('w:val="1"')) is True


class TestOdtStylingAndLists:
    def test_styled_spans(self):
        """odt.rs:177-186: fo:font-weight=bold / fo:font-style=italic on
        the span's text style."""
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([("p", [("plain ", ""), ("bold", "b"), (" mid ", ""),
                              ("it", "i"), ("both", "bi")])])
        html = odt_to_html(d)
        assert ("<p>plain <strong>bold</strong> mid <em>it</em>"
                "<strong><em>both</em></strong></p>") in html

    def test_lists_ordered_by_style(self):
        """odt.rs:154-169: list style with a list-level-style-number child
        → ordered; bullet style → unordered."""
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([("ol", ["one", "two"]), ("ul", [[("x", "b")]])])
        html = odt_to_html(d)
        assert "<ol><li>one</li><li>two</li></ol>" in html
        assert "<ul><li><strong>x</strong></li></ul>" in html


class TestHyperlinks:
    def test_docx_external_hyperlink(self):
        """docx.rs:634-653: w:hyperlink r:id resolves through document
        rels; link wraps the styled runs (html.rs:218-220)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("see ", ""),
                               ("the docs", "b", "https://ex.com/d?a=1&b=2"),
                               (" now", "")])])
        html = docx_to_html(d)
        assert ('<p>see <a href="https://ex.com/d?a=1&amp;b=2">'
                "<strong>the docs</strong></a> now</p>") in html

    def test_docx_anchor_hyperlink(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("jump", "", "#sec2")])])
        assert '<p><a href="#sec2">jump</a></p>' in docx_to_html(d)

    def test_odt_hyperlink_with_style(self):
        """odt.rs:477-484: text:a xlink:href; styled span inside keeps its
        strong/em inside the link."""
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([("p", [("go ", ""), ("here", "i", "https://x.io/")])])
        assert ('<p>go <a href="https://x.io/"><em>here</em></a></p>'
                in odt_to_html(d))

    def test_adjacent_runs_same_href_one_anchor(self):
        from webcrawl_spark.kernels.document import (
            Block, Document, Inline, render_document_html,
        )

        doc = Document(blocks=[Block(kind="paragraph", inlines=[
            Inline(text="a ", href="https://s.ame/"),
            Inline(text="b", bold=True, href="https://s.ame/"),
            Inline(text=" after"),
        ])])
        html = render_document_html(doc)
        assert ('<p><a href="https://s.ame/">a <strong>b</strong></a>'
                " after</p>") in html

    def test_hyperlink_in_list_item(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("ul", [[("l1", "", "https://l.ink/")]])])
        assert ('<ul><li><a href="https://l.ink/">l1</a></li></ul>'
                in docx_to_html(d))


class TestNestedLists:
    def test_docx_nested_sublist(self):
        """docx.rs:826-900: deeper-ilvl runs nest as sublists inside the
        preceding item; item with paragraph + sublist renders as blocks
        (<p> then the nested list, html.rs:100-110)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("ol", ["top1", (1, "sub-a"), (1, "sub-b"),
                                "top2"])])
        html = docx_to_html(d)
        assert ("<ol><li><p>top1</p><ol><li>sub-a</li><li>sub-b</li></ol>"
                "</li><li>top2</li></ol>") in html

    def test_docx_two_level_nesting(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("ul", ["a", (1, "b"), (2, "c")])])
        html = docx_to_html(d)
        assert ("<ul><li><p>a</p><ul><li><p>b</p><ul><li>c</li></ul></li>"
                "</ul></li></ul>") in html

    def test_odt_nested_sublist(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([("ul", ["plain",
                               ("holder", ("ul", ["n1", "n2"]))])])
        html = odt_to_html(d)
        assert ("<ul><li>plain</li><li><p>holder</p>"
                "<ul><li>n1</li><li>n2</li></ul></li></ul>") in html

    def test_odt_sublist_only_item(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([("ol", ["first", ("", ("ol", ["only-sub"]))])])
        html = odt_to_html(d)
        assert ("<ol><li>first</li><li><ol><li>only-sub</li></ol></li></ol>"
                in html)


class TestExternalImages:
    def test_docx_external_image(self):
        """docx.rs:925-990: text-free paragraph with a drawing blip whose
        rel target is http(s) → <img>; alt from docPr descr."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", "before"),
                        ("img", ("https://cdn.ex/pic.png", "a pic")),
                        ("p", "after")])
        html = docx_to_html(d)
        assert '<img src="https://cdn.ex/pic.png" alt="a pic">' in html
        assert "<p>before</p>" in html and "<p>after</p>" in html

    def test_docx_image_without_alt(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("img", "https://cdn.ex/x.jpg")])
        assert '<img src="https://cdn.ex/x.jpg">' in docx_to_html(d)

    def test_odt_external_image(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        d = build_odt([("img", "https://cdn.ex/o.png"), ("p", "text")])
        html = odt_to_html(d)
        assert '<img src="https://cdn.ex/o.png">' in html
        assert "<p>text</p>" in html


class TestRtfUnicodeFallback:
    def test_hex_escape_fallback_skipped_whole(self):
        r"""\u233\'e9 — the fallback is a 4-byte \'hh escape and must be
        skipped as ONE character (previously only the backslash was
        skipped, leaving literal 'e9 in the text)."""
        from webcrawl_spark.kernels.document import rtf_to_document

        doc = rtf_to_document(b"{\\rtf1 caf\\u233\\'e9 time\\par}")
        assert doc.blocks[0].text == "café time"

    def test_uc2_skips_two_fallback_chars(self):
        from webcrawl_spark.kernels.document import rtf_to_document

        doc = rtf_to_document(b"{\\rtf1\\uc2 x\\u26085\\'93\\'fa y\\par}")
        assert doc.blocks[0].text == "x日 y"

    def test_fallback_stops_at_group_boundary(self):
        from webcrawl_spark.kernels.document import rtf_to_document

        doc = rtf_to_document(b"{\\rtf1\\uc4 {\\u233}after\\par}")
        assert doc.blocks[0].text == "éafter"


class TestRtfStyling:
    def test_group_scoped_bold(self):
        """rtf.rs:518-525: {\\b inner} styles only the group's text; the
        brace stack restores state (rtf.rs:340-356)."""
        from webcrawl_spark.kernels.document import rtf_to_html

        html = rtf_to_html(b"{\\rtf1 Second {\\b inner} text.\\par}")
        assert "<p>Second <strong>inner</strong> text.</p>" in html

    def test_toggle_with_zero_arg(self):
        from webcrawl_spark.kernels.document import rtf_to_html

        html = rtf_to_html(b"{\\rtf1 \\b on\\b0 off \\i it\\i0 done\\par}")
        assert ("<p><strong>on</strong>off <em>it</em>done</p>") in html

    def test_plain_resets(self):
        from webcrawl_spark.kernels.document import rtf_to_html

        html = rtf_to_html(b"{\\rtf1 \\b\\i x\\plain y\\par}")
        assert "<p><strong><em>x</em></strong>y</p>" in html

    def test_unstyled_paragraph_has_no_inline_markup(self):
        from webcrawl_spark.kernels.document import rtf_to_document

        doc = rtf_to_document(b"{\\rtf1 just words\\par}")
        assert doc.blocks[0].inlines is None
        assert doc.blocks[0].text == "just words"


class TestXlsxFloatFormat:
    def test_no_exponent_notation(self):
        """Rust f64::to_string (xlsx.rs:79) never emits exponents."""
        from webcrawl_spark.kernels.document import _fmt_float

        assert _fmt_float(3.0) == "3"
        assert _fmt_float(2.5) == "2.5"
        assert _fmt_float(1e16) == "10000000000000000"
        assert _fmt_float(0.00001) == "0.00001"
        assert _fmt_float(1.5e-7) == "0.00000015"
        assert _fmt_float(-1e16) == "-10000000000000000"

    def test_in_cell_rendering(self):
        from webcrawl_spark.kernels.document import build_xlsx, xlsx_to_html

        html = xlsx_to_html(build_xlsx({"S": [[1e16, 0.00001]]}))
        assert "<td>10000000000000000</td>" in html
        assert "<td>0.00001</td>" in html


class TestEngineForcing:
    """engine-forcing.test.ts:8-105 vectors."""

    MAPPINGS = {
        "example.com": "playwright",
        "test.com": "fetch",
        "*.subdomain.com": "fire-engine;chrome-cdp",
        "google.com": ["fire-engine;chrome-cdp", "playwright"],
    }

    def _forced(self, spark, urls, mappings=None):
        from pyspark.sql import functions as F

        from webcrawl_spark.functions import forced_engine_col

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        rows = df.select(
            forced_engine_col(F.col("url"),
                              self.MAPPINGS if mappings is None else mappings)
            .alias("e")).collect()
        return [r["e"] for r in rows]

    def test_exact_and_subdomain_match(self, spark):
        got = self._forced(spark, [
            "https://example.com", "https://test.com",
            "https://www.example.com", "https://api.example.com",
        ])
        assert got == ["playwright", "fetch", "playwright", "playwright"]

    def test_wildcard_strict_subdomains(self, spark):
        got = self._forced(spark, [
            "https://api.subdomain.com", "https://www.subdomain.com",
            "https://subdomain.com",   # wildcard must NOT match base
        ])
        assert got == ["fire-engine;chrome-cdp", "fire-engine;chrome-cdp",
                       None]

    def test_engine_list_case_and_garbage(self, spark):
        got = self._forced(spark, [
            "https://google.com", "https://EXAMPLE.COM",
            "https://Example.Com/path?q=1", "not-a-url", "",
            "https://nomatch.com",
        ])
        assert got == ["fire-engine;chrome-cdp;;playwright", "playwright",
                       "playwright", None, None, None]

    def test_empty_mappings_noop(self, spark):
        assert self._forced(spark, ["https://example.com"], mappings={}) \
            == [None]

    def test_feeds_engine_choice(self, spark):
        from pyspark.sql import functions as F

        from webcrawl_spark.functions import engine_choice_col

        df = spark.createDataFrame(
            [("https://example.com/a.pdf",), ("https://other.com/a.pdf",)],
            "url string")
        rows = df.select(
            engine_choice_col(F.col("url"), self.MAPPINGS).alias("e")
        ).collect()
        # forced map wins over the extension routing; unforced falls through
        assert [r["e"] for r in rows] == ["playwright", "pdf"]


class TestSitemapFallbacks:
    SM = "https://{h}/sitemap.xml"

    @staticmethod
    def _xml(urls):
        items = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        return ('<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org'
                f'/schemas/sitemap/0.9">{items}</urlset>')

    def test_subdomain_tries_main_domain_filtered(self):
        """crawler.ts:606-659: subdomain seed also walks the main domain's
        sitemap, keeping only links whose hostname endsWith the seed host."""
        from webcrawl_spark.sources.seeding import sitemap_seed_batches

        sub_urls = ["https://docs.example.com/a"]
        main_urls = [
            "https://example.com/root",               # filtered out
            "https://docs.example.com/from-main",     # kept
            "https://api.example.com/other",          # filtered out
        ]
        sitemaps = {
            "https://docs.example.com/sitemap.xml": self._xml(sub_urls),
            "https://example.com/sitemap.xml": self._xml(main_urls),
        }
        batches = sitemap_seed_batches(sitemaps.get,
                                       "https://docs.example.com/")
        assert batches == [sub_urls, ["https://docs.example.com/from-main"]]

    def test_www_and_bare_domains_skip_main_domain(self):
        from webcrawl_spark.sources.seeding import sitemap_seed_batches

        calls = []

        def fetch(u):
            calls.append(u)
            return None

        sitemap_seed_batches(fetch, "https://www.example.com/")
        sitemap_seed_batches(fetch, "https://example.com/")
        # only the seed sitemap and the baseUrl fallback (same url, deduped)
        assert all("example.com/sitemap.xml" in c for c in calls)
        assert not any(c.startswith("https://com/") for c in calls)

    def test_base_url_last_resort_only_when_empty(self):
        """crawler.ts:672-698: baseUrl/sitemap.xml only when nothing was
        contributed yet."""
        from webcrawl_spark.sources.seeding import sitemap_seed_batches

        # seed is a .xml url that yields nothing → falls back to
        # host/sitemap.xml
        fallback = ["https://h.com/x"]
        sitemaps = {"https://h.com/sitemap.xml": self._xml(fallback)}
        batches = sitemap_seed_batches(sitemaps.get,
                                       "https://h.com/weird/map.xml")
        assert batches == [fallback]

        # seed sitemap DID contribute → no fallback fetch
        calls = []

        def fetch(u):
            calls.append(u)
            return self._xml(["https://h.com/a"]) \
                if u == "https://h.com/deep/map.xml" else None

        batches = sitemap_seed_batches(fetch, "https://h.com/deep/map.xml")
        assert batches == [["https://h.com/a"]]
        assert calls == ["https://h.com/deep/map.xml"]

    def test_ip_seed_skips_subdomain_logic(self):
        from webcrawl_spark.sources.seeding import sitemap_seed_batches

        calls = []

        def fetch(u):
            calls.append(u)
            return None

        sitemap_seed_batches(fetch, "https://192.168.0.1/")
        assert calls == ["https://192.168.0.1/sitemap.xml"]


class TestStylesXmlHeadings:
    """docx.rs:180-245 + 317-379: pStyle ids resolve through styles.xml —
    a style whose definition carries outlineLvl, or whose display NAME says
    'heading N', is a heading even when the id is opaque."""

    def _docx_with_styles(self, styles_xml: str, body_p: str) -> bytes:
        import io
        import zipfile

        from webcrawl_spark.kernels.document import _W, _NS, build_docx

        base = build_docx([("p", "seed")])
        out = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(base)) as zin, \
                zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zout:
            for name in zin.namelist():
                data = zin.read(name)
                if name == "word/document.xml":
                    data = (
                        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                        f'<w:document xmlns:w="{_W}"><w:body>{body_p}'
                        "</w:body></w:document>"
                    ).encode()
                zout.writestr(name, data)
            zout.writestr(
                "word/styles.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<w:styles xmlns:w="{_W}">{styles_xml}</w:styles>')
        return out.getvalue()

    def test_opaque_style_id_with_outline_level(self):
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx_with_styles(
            '<w:style w:styleId="S7"><w:name w:val="Fancy"/>'
            '<w:pPr><w:outlineLvl w:val="2"/></w:pPr></w:style>',
            '<w:p><w:pPr><w:pStyle w:val="S7"/></w:pPr>'
            '<w:r><w:t>deep</w:t></w:r></w:p>')
        assert "<h3>deep</h3>" in docx_to_html(d)

    def test_opaque_style_id_with_heading_name(self):
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx_with_styles(
            '<w:style w:styleId="X1"><w:name w:val="Heading 4"/></w:style>',
            '<w:p><w:pPr><w:pStyle w:val="X1"/></w:pPr>'
            '<w:r><w:t>named</w:t></w:r></w:p>')
        assert "<h4>named</h4>" in docx_to_html(d)

    def test_quote_name_fallback(self):
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx_with_styles(
            '<w:style w:styleId="Q9"><w:name w:val="Intense Quote"/></w:style>',
            '<w:p><w:pPr><w:pStyle w:val="Q9"/></w:pPr>'
            '<w:r><w:t>quoted</w:t></w:r></w:p>')
        assert "<blockquote><p>quoted</p></blockquote>" in docx_to_html(d)

    def test_parse_heading_level_dashes(self):
        from webcrawl_spark.kernels.document import _parse_heading_level

        assert _parse_heading_level("heading-3") == 3
        assert _parse_heading_level("Heading 12") == 6  # capped
        assert _parse_heading_level("heading") is None
        assert _parse_heading_level("subheading 0") is None


class TestRunStyling:
    """docx.rs:547-577 run_style_from_rpr: strike, code rStyle, vertAlign;
    docx.rs:594-617 run children (br, tab, note refs); odt.rs:174-203
    text-properties line-through / text-position."""

    def test_docx_strike_code_sup_sub(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("gone", "s"), (" f()", "c"), (" x", ""),
                               ("2", "^"), (" H", ""), ("2", "_")])])
        html = docx_to_html(d)
        assert "<del>gone</del>" in html
        assert "<code> f()</code>" in html
        assert "x<sup>2</sup>" in html
        assert "H<sub>2</sub>" in html

    def test_docx_style_nest_order(self):
        """apply order del->em->strong->sup (docx.rs:520-536)."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("all", "bis^")])])
        assert ("<sup><strong><em><del>all</del></em></strong></sup>"
                in docx_to_html(d))

    def test_docx_code_collapses_styling(self):
        """docx.rs:618-630: a code run returns ONLY Inline::Code of its
        concatenated text, dropping other styling."""
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("styled_code", "bc")])])
        html = docx_to_html(d)
        assert "<code>styled_code</code>" in html
        assert "<strong><code>" not in html

    def test_docx_line_break_and_tab(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        d = build_docx([("p", [("one", ""), ("#br",), ("two", "")])])
        assert "one<br>two" in docx_to_html(d)

    def test_odt_strike_sup_sub_linebreak(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        od = build_odt([("p", [("gone", "s"), (" mc", ""), ("2", "^"),
                               (" H", ""), ("2", "_"),
                               ("#br",), ("next line", "")])])
        html = odt_to_html(od)
        assert "<del>gone</del>" in html
        assert "mc<sup>2</sup>" in html
        assert "H<sub>2</sub>" in html
        assert "<br>next line" in html


class TestDocxNotes:
    """docx.rs:42-81,995-1075: footnotes.xml/endnotes.xml/comments.xml ->
    end-of-body sections (html.rs:41-80) with in-text refs
    (html.rs:229-235)."""

    def _doc(self):
        from webcrawl_spark.kernels.document import build_docx

        return build_docx(
            [("p", [("text", ""), ("#fn", "2"), ("#en", "1"),
                    ("#cm", "0")])],
            footnotes={"2": ["Footnote body", [("styled note", "b")]]},
            endnotes={"1": ["Endnote body"]},
            comments=[("0", "Ada L", "AL", ["Comment body"])],
        )

    def test_sections_render_after_main(self):
        from webcrawl_spark.kernels.document import docx_to_html

        html = docx_to_html(self._doc())
        main_end = html.index("</main>")
        assert html.index('<section id="footnotes"><h2>Footnotes</h2>') \
            > main_end
        assert '<div id="footnote-2"><p>Footnote body</p>' \
               "<p><strong>styled note</strong></p></div>" in html
        assert '<section id="endnotes"><h2>Endnotes</h2>' \
               '<div id="endnote-1"><p>Endnote body</p></div></section>' \
               in html
        assert ('<article id="comment-0"><header>Ada L (AL)</header>'
                "<p>Comment body</p></article>") in html

    def test_refs_superscripted_like_word(self):
        """The Word-typical reference run (rStyle FootnoteReference +
        vertAlign superscript) nests the style wrap OVER the ref markup
        (Sup([FootnoteRef]) composition)."""
        from webcrawl_spark.kernels.document import docx_to_html

        html = docx_to_html(self._doc())
        assert '<sup><sup><a href="#footnote-2">2</a></sup></sup>' in html
        assert '<sup><sup><a href="#endnote-1">1</a></sup></sup>' in html
        assert '<a href="#comment-0">\U0001f4ac</a>' in html

    def test_separator_notes_skipped(self):
        """docx.rs:1022-1026: separator / continuationSeparator
        pseudo-notes never become document notes."""
        from webcrawl_spark.kernels.document import docx_to_document

        doc = docx_to_document(self._doc())
        assert [nid for nid, _ in doc.footnotes] == ["2"]
        assert [nid for nid, _ in doc.endnotes] == ["1"]

    def test_no_notes_no_sections(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        html = docx_to_html(build_docx([("p", "plain")]))
        assert "<section" not in html
        assert "</main></body></html>" in html


class TestOdtNotes:
    """odt.rs:500-566: text:note bodies and office:annotation contents
    collect into notes/comments and never leak into paragraph text."""

    def test_notes_and_annotation(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        od = build_odt([
            ("p", [("before", ""), ("#fn", "footnote", "Note body"),
                   ("#ann", "Bob", "BB", "Annot body"), ("after", "")]),
        ])
        html = odt_to_html(od)
        main = html.split("<main>")[1].split("</main>")[0]
        assert "Note body" not in main and "Annot body" not in main
        assert '<sup><a href="#footnote-ftn1">ftn1</a></sup>' in main
        assert '<a href="#comment-odt-comment-1">\U0001f4ac</a>' in main
        assert '<div id="footnote-ftn1"><p>Note body</p></div>' in html
        assert ("<article id=\"comment-odt-comment-1\">"
                "<header>Bob (BB)</header><p>Annot body</p>") in html

    def test_endnote_class(self):
        from webcrawl_spark.kernels.document import (build_odt,
                                                     odt_to_document)

        od = build_odt([("p", [("x", ""), ("#fn", "endnote", "E body")])])
        doc = odt_to_document(od)
        assert doc.footnotes == []
        assert len(doc.endnotes) == 1
        assert doc.endnotes[0][1][0].text == "E body"

    def test_table_cell_text_excludes_notes(self):
        """_odt_text_of skips note bodies (flow text only)."""
        from webcrawl_spark.kernels.document import _odt_text_of
        from xml.etree import ElementTree as ET

        t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
        el = ET.fromstring(
            f'<text:p xmlns:text="{t}">cell<text:note text:id="f1">'
            "<text:note-body><text:p>hidden</text:p></text:note-body>"
            "</text:note> tail</text:p>")
        assert _odt_text_of(el) == "cell tail"


class TestRtfSupSubStrike:
    """rtf.rs:526-548: \\strike / \\super / \\sub / \\nosupersub state,
    group-scoped, reset by \\plain."""

    def test_strike_super_sub(self):
        from webcrawl_spark.kernels.document import rtf_to_html

        rtf = (rb"{\rtf1 normal \strike struck\strike0  \super 2"
               rb"\nosupersub  \sub low\nosupersub  end\par}")
        h = rtf_to_html(rtf)
        assert "<del>struck</del>" in h
        assert "<sup>2</sup>" in h
        assert "<sub>low</sub>" in h

    def test_super_sub_mutually_exclusive(self):
        from webcrawl_spark.kernels.document import rtf_to_html

        h = rtf_to_html(rb"{\rtf1 \super up \sub down\par}")
        assert "<sup>up </sup>" in h
        assert "<sub>down</sub>" in h

    def test_plain_resets_all(self):
        from webcrawl_spark.kernels.document import rtf_to_html

        h = rtf_to_html(rb"{\rtf1 \b\strike\super x\plain y\par}")
        assert "<sup><strong><del>x</del></strong></sup>" in h
        assert ">y" in h or "y</p>" in h

    def test_group_scope_restores(self):
        from webcrawl_spark.kernels.document import rtf_to_html

        h = rtf_to_html(rb"{\rtf1 {\strike in} out\par}")
        assert "<del>in</del>" in h
        assert "<del> out" not in h


class TestDocxParagraphBaseStyle:
    """docx.rs:288-298 paragraph_run_style + 505-517 resolve_with: the
    paragraph's pPr/rPr is the base; run-local Option fields override;
    hyperlink rPr merges over the base for its runs (docx.rs:640-646)."""

    def _docx(self, body_xml: bytes) -> bytes:
        import io
        import zipfile

        from webcrawl_spark.kernels.document import build_docx

        base = build_docx([("p", "placeholder")])
        zf = zipfile.ZipFile(io.BytesIO(base))
        names = {n: zf.read(n) for n in zf.namelist()}
        names["word/document.xml"] = (
            b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
            b'wordprocessingml/2006/main"><w:body>' + body_xml
            + b"</w:body></w:document>")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for n, c in names.items():
                z.writestr(n, c)
        return buf.getvalue()

    def test_base_inherited_and_locally_overridden(self):
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx(
            b'<w:p><w:pPr><w:rPr><w:b/></w:rPr></w:pPr>'
            b'<w:r><w:t>inherits</w:t></w:r>'
            b'<w:r><w:rPr><w:b w:val="0"/></w:rPr><w:t> off</w:t></w:r>'
            b'<w:r><w:rPr><w:i/></w:rPr><w:t> both</w:t></w:r></w:p>')
        h = docx_to_html(d)
        assert "<strong>inherits</strong>" in h
        assert "<strong> off</strong>" not in h
        assert "<strong><em> both</em></strong>" in h

    def test_pstyle_alone_is_not_a_run_base(self):
        """Only the paragraph's OWN pPr/rPr is the base (the reference
        resolves no styles.xml run chain)."""
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx(
            b'<w:p><w:pPr><w:pStyle w:val="Normal"/></w:pPr>'
            b'<w:r><w:t>plain</w:t></w:r></w:p>')
        assert "<p>plain</p>" in docx_to_html(d)


class TestDocxSizeBuckets:
    """docx.rs:425-466 + 367-377: within one heading/title style, the
    distinct effective font sizes used in the document form a descending
    bucket list; a paragraph at bucket index i renders i levels deeper."""

    def _docx(self, styles_xml: bytes, body_xml: bytes) -> bytes:
        import io
        import zipfile

        from webcrawl_spark.kernels.document import build_docx

        base = build_docx([("p", "x")])
        zf = zipfile.ZipFile(io.BytesIO(base))
        names = {n: zf.read(n) for n in zf.namelist()}
        W = (b"http://schemas.openxmlformats.org/wordprocessingml/2006/"
             b"main")
        names["word/styles.xml"] = (
            b'<?xml version="1.0"?><w:styles xmlns:w="' + W + b'">'
            + styles_xml + b"</w:styles>")
        names["word/document.xml"] = (
            b'<?xml version="1.0"?><w:document xmlns:w="' + W
            + b'"><w:body>' + body_xml + b"</w:body></w:document>")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for n, c in names.items():
                z.writestr(n, c)
        return buf.getvalue()

    def test_smaller_size_demotes_level(self):
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx(
            b'<w:style w:type="paragraph" w:styleId="H1x">'
            b'<w:name w:val="Heading 1"/></w:style>',
            b'<w:p><w:pPr><w:pStyle w:val="H1x"/>'
            b'<w:rPr><w:sz w:val="48"/></w:rPr></w:pPr>'
            b"<w:r><w:t>big</w:t></w:r></w:p>"
            b'<w:p><w:pPr><w:pStyle w:val="H1x"/>'
            b'<w:rPr><w:sz w:val="32"/></w:rPr></w:pPr>'
            b"<w:r><w:t>small</w:t></w:r></w:p>",
        )
        h = docx_to_html(d)
        assert "<h1>big</h1>" in h
        assert "<h2>small</h2>" in h

    def test_single_size_no_demotion(self):
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx(
            b'<w:style w:type="paragraph" w:styleId="H2y">'
            b'<w:name w:val="Heading 2"/></w:style>',
            b'<w:p><w:pPr><w:pStyle w:val="H2y"/>'
            b'<w:rPr><w:sz w:val="40"/></w:rPr></w:pPr>'
            b"<w:r><w:t>only</w:t></w:r></w:p>",
        )
        assert "<h2>only</h2>" in docx_to_html(d)

    def test_style_default_size_counts(self):
        """Paragraphs without their own sz use the style's rPr/sz default
        (paragraph_effective_size fallback)."""
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx(
            b'<w:style w:type="paragraph" w:styleId="T1">'
            b'<w:name w:val="Title"/>'
            b'<w:rPr><w:sz w:val="56"/></w:rPr></w:style>',
            b'<w:p><w:pPr><w:pStyle w:val="T1"/></w:pPr>'
            b"<w:r><w:t>title default</w:t></w:r></w:p>"
            b'<w:p><w:pPr><w:pStyle w:val="T1"/>'
            b'<w:rPr><w:sz w:val="28"/></w:rPr></w:pPr>'
            b"<w:r><w:t>small title</w:t></w:r></w:p>",
        )
        h = docx_to_html(d)
        assert "<h1>title default</h1>" in h
        assert "<h2>small title</h2>" in h

    def test_run_size_max_wins(self):
        """Effective size = max over pPr/rPr and run rPr sizes
        (docx.rs:399-423)."""
        from webcrawl_spark.kernels.document import docx_to_html

        d = self._docx(
            b'<w:style w:type="paragraph" w:styleId="H1z">'
            b'<w:name w:val="Heading 1"/></w:style>',
            b'<w:p><w:pPr><w:pStyle w:val="H1z"/></w:pPr>'
            b'<w:r><w:rPr><w:sz w:val="48"/></w:rPr>'
            b"<w:t>peak</w:t></w:r></w:p>"
            b'<w:p><w:pPr><w:pStyle w:val="H1z"/></w:pPr>'
            b'<w:r><w:rPr><w:sz w:val="24"/></w:rPr>'
            b"<w:t>valley</w:t></w:r></w:p>",
        )
        h = docx_to_html(d)
        assert "<h1>peak</h1>" in h
        assert "<h2>valley</h2>" in h


class TestDocumentMetadata:
    """docx.rs:133-171 read_core_properties / odt.rs:205-236 read_meta →
    <title> and <meta name="author"> in the rendered head
    (html.rs:28-37); 'unknown' authors are dropped."""

    def test_docx_core_properties(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        h = docx_to_html(build_docx([("p", "x")], title="My Doc",
                                    author="Jo Writer"))
        assert "<title>My Doc</title>" in h
        assert '<meta name="author" content="Jo Writer">' in h
        assert h.index("</title>") < h.index('name="author"')

    def test_unknown_author_dropped(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        h = docx_to_html(build_docx([("p", "x")], author="Unknown"))
        assert 'name="author"' not in h

    def test_odt_meta_initial_creator_fallback(self):
        from webcrawl_spark.kernels.document import build_odt, odt_to_html

        h = odt_to_html(build_odt([("p", "y")], title="ODT T",
                                  author="Ann"))
        assert "<title>ODT T</title>" in h
        assert '<meta name="author" content="Ann">' in h

    def test_no_meta_defaults(self):
        from webcrawl_spark.kernels.document import build_docx, docx_to_html

        h = docx_to_html(build_docx([("p", "z")]))
        assert "<title>Document</title>" in h
        assert 'name="author"' not in h


class TestOdtStylesXml:
    """odt.rs:88-173: styles harvested from BOTH styles.xml and
    content.xml; paragraph styles carry heading levels (own outline-level
    or 'Heading N' parent), quote names, and text-prop bases; code via
    style name or courier/mono font."""

    def _odt(self, styles_xml: str, content_body: str) -> bytes:
        import io
        import zipfile

        T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
        S = "urn:oasis:names:tc:opendocument:xmlns:style:1.0"
        O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        FO = "urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0"
        content = (
            '<?xml version="1.0"?>'
            f'<office:document-content xmlns:office="{O}" '
            f'xmlns:text="{T}" xmlns:style="{S}" xmlns:fo="{FO}">'
            "<office:body><office:text>" + content_body
            + "</office:text></office:body></office:document-content>")
        sx = (
            '<?xml version="1.0"?>'
            f'<office:document-styles xmlns:office="{O}" xmlns:text="{T}" '
            f'xmlns:style="{S}" xmlns:fo="{FO}">' + styles_xml
            + "</office:document-styles>")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
            zf.writestr("content.xml", content)
            zf.writestr("styles.xml", sx)
        return buf.getvalue()

    def test_paragraph_style_heading_from_styles_xml(self):
        from webcrawl_spark.kernels.document import odt_to_html

        d = self._odt(
            '<style:style style:family="paragraph" style:name="H2S">'
            '<style:paragraph-properties style:outline-level="2"/>'
            "</style:style>",
            '<text:p text:style-name="H2S">styled heading</text:p>')
        assert "<h2>styled heading</h2>" in odt_to_html(d)

    def test_heading_via_parent_style_name(self):
        from webcrawl_spark.kernels.document import odt_to_html

        d = self._odt(
            '<style:style style:family="paragraph" style:name="P7" '
            'style:parent-style-name="Heading_20_3"/>',
            '<text:p text:style-name="P7">via parent</text:p>')
        assert "<h3>via parent</h3>" in odt_to_html(d)

    def test_quote_style_name(self):
        from webcrawl_spark.kernels.document import odt_to_html

        d = self._odt(
            '<style:style style:family="paragraph" style:name="BlockQuote"/>',
            '<text:p text:style-name="BlockQuote">quoted</text:p>')
        assert "<blockquote><p>quoted</p></blockquote>" in odt_to_html(d)

    def test_paragraph_text_props_as_base(self):
        from webcrawl_spark.kernels.document import odt_to_html

        d = self._odt(
            '<style:style style:family="paragraph" style:name="BoldPara">'
            '<style:text-properties fo:font-weight="bold"/></style:style>',
            '<text:p text:style-name="BoldPara">all bold</text:p>')
        assert "<p><strong>all bold</strong></p>" in odt_to_html(d)

    def test_code_by_font_and_by_name(self):
        from webcrawl_spark.kernels.document import odt_to_html

        d = self._odt(
            '<style:style style:family="text" style:name="Mono">'
            '<style:text-properties style:font-name="Courier New"/>'
            "</style:style>",
            '<text:p>x <text:span text:style-name="Mono">f()</text:span>'
            ' y <text:span text:style-name="SourceCode">g()</text:span>'
            "</text:p>")
        h = odt_to_html(d)
        assert "<code>f()</code>" in h
        assert "<code>g()</code>" in h

    def test_text_style_from_styles_xml(self):
        """Named text styles commonly live in styles.xml, not content.xml."""
        from webcrawl_spark.kernels.document import odt_to_html

        d = self._odt(
            '<style:style style:family="text" style:name="Strong_20_Emphasis">'
            '<style:text-properties fo:font-weight="bold"/></style:style>',
            '<text:p>a <text:span text:style-name="Strong_20_Emphasis">'
            "b</text:span></text:p>")
        assert "a <strong>b</strong>" in odt_to_html(d)
