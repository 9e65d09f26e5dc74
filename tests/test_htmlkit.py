"""HTML extraction kernel tests — semantics per packages/firecrawl-rs/src/
html.rs (clean/links/images/metadata) and the TS wrappers."""

from webcrawl_spark.kernels.gatekeeper import Thresholds, evaluate_gatekeeper
from webcrawl_spark.kernels.htmlkit import (
    decode_html,
    extract_base_href,
    extract_images,
    extract_links,
    extract_metadata,
    extract_raw_links,
    transform_html,
    visible_text,
)
from webcrawl_spark.kernels.scrape import ScrapeOptions, scrape_page


class TestBaseHref:
    def test_no_base_returns_url(self):
        assert extract_base_href("<p>x</p>", "https://e.com/a") == "https://e.com/a"

    def test_relative_base_joined(self):
        html = '<head><base href="/sub/"></head><p>x</p>'
        assert extract_base_href(html, "https://e.com/a/b") == "https://e.com/sub/"

    def test_absolute_base(self):
        html = '<base href="https://cdn.e.com/x/">'
        assert extract_base_href(html, "https://e.com/") == "https://cdn.e.com/x/"


class TestExtractLinks:
    def test_scheme_slash_fix(self):
        # html.rs:85-89
        html = '<a href="http:/e.com/a">x</a><a href="https:/e.com/b">y</a>'
        assert extract_raw_links(html) == ["http://e.com/a", "https://e.com/b"]

    def test_resolution_rules(self):
        # extractLinks.ts:29-45: keep absolute + mailto, drop '#', join rest
        html = (
            '<a href="https://other.com/abs">a</a>'
            '<a href="mailto:x@y.z">m</a>'
            '<a href="#frag">f</a>'
            '<a href="rel/page">r</a>'
        )
        assert extract_links(html, "https://e.com/dir/") == [
            "https://other.com/abs",
            "mailto:x@y.z",
            "https://e.com/dir/rel/page",
        ]

    def test_dedupe_first_seen(self):
        html = '<a href="/a">1</a><a href="/b">2</a><a href="/a">3</a>'
        assert extract_links(html, "https://e.com/") == [
            "https://e.com/a", "https://e.com/b",
        ]

    def test_base_href_changes_resolution(self):
        html = '<base href="https://cdn.e.com/"><a href="x">l</a>'
        assert extract_links(html, "https://e.com/") == ["https://cdn.e.com/x"]


class TestTransformHtml:
    def test_strips_head_script_style(self):
        html = (
            "<html><head><title>T</title></head><body>"
            "<script>var x;</script><style>.a{}</style><noscript>ns</noscript>"
            "<p>keep</p></body></html>"
        )
        out = transform_html(html, "https://e.com/")
        assert "<p>keep</p>" in out
        for bad in ("script", "style", "noscript", "title"):
            assert f"<{bad}" not in out

    def test_only_main_content_removes_boilerplate(self):
        html = (
            "<body><header>H</header><nav>N</nav>"
            '<div class="sidebar">S</div><main><p>content</p></main>'
            "<footer>F</footer></body>"
        )
        out = transform_html(html, "https://e.com/")
        assert "content" in out
        for bad in ("<header>", "<nav>", "sidebar", "<footer>"):
            assert bad not in out

    def test_force_include_protects(self):
        # html.rs:492-509: excluded node kept if it contains #main
        html = '<body><header><div id="main">keep me</div></header></body>'
        out = transform_html(html, "https://e.com/")
        assert "keep me" in out

    def test_only_main_content_false_keeps_boilerplate(self):
        html = "<body><header>H</header><p>c</p></body>"
        out = transform_html(html, "https://e.com/", only_main_content=False)
        assert "<header>H</header>" in out

    def test_exclude_tags(self):
        html = '<body><div class="x">drop</div><p>keep</p></body>'
        out = transform_html(html, "https://e.com/", exclude_tags=[".x"])
        assert "drop" not in out and "keep" in out

    def test_include_tags(self):
        html = "<body><article><p>inside</p></article><p>outside</p></body>"
        out = transform_html(html, "https://e.com/", include_tags=["article"])
        assert "inside" in out and "outside" not in out

    def test_absolutize(self):
        html = '<body><a href="/x">l</a><img src="i.png"></body>'
        out = transform_html(html, "https://e.com/dir/")
        assert 'href="https://e.com/x"' in out
        assert 'src="https://e.com/dir/i.png"' in out

    def test_srcset_picks_biggest_w(self):
        html = '<body><img srcset="s.png 300w, l.png 800w, m.png 500w" src="f.png"></body>'
        out = transform_html(html, "https://e.com/")
        assert 'src="https://e.com/l.png"' in out

    def test_srcset_all_x_includes_src(self):
        # html.rs:554-562: src enters as 1x candidate
        html = '<body><img srcset="a.png 0.5x" src="orig.png"></body>'
        out = transform_html(html, "https://e.com/")
        assert 'src="https://e.com/orig.png"' in out


class TestExtractImages:
    def test_all_sources(self):
        html = (
            '<head><base href="https://b.com/"><link rel="icon" href="fav.ico">'
            '<meta property="og:image" content="/og.png"></head>'
            '<body><img src="i1.png"><img data-src="i2.png">'
            '<img srcset="s1.png 1x, s2.png 2x">'
            '<picture><source srcset="p1.png"></picture>'
            '<video poster="v.png"></video>'
            '<div style="background-image: url(\'bg.png\')">x</div></body>'
        )
        imgs = set(extract_images(html, "https://e.com/"))
        # base href b.com used for relative; og meta content resolved too
        assert imgs == {
            "https://b.com/fav.ico", "https://b.com/og.png",
            "https://b.com/i1.png", "https://b.com/i2.png",
            "https://b.com/s1.png", "https://b.com/s2.png",
            "https://b.com/p1.png", "https://b.com/v.png",
            "https://b.com/bg.png",
        }

    def test_data_blob_passthrough_javascript_dropped(self):
        html = (
            '<body><img src="data:image/png;base64,AAA">'
            '<img src="blob:xyz"><img src="javascript:alert(1)"></body>'
        )
        imgs = set(extract_images(html, "https://e.com/"))
        assert imgs == {"data:image/png;base64,AAA", "blob:xyz"}

    def test_protocol_relative_uses_base_url(self):
        # html.rs:754-757: '//' resolves against base_url, not base href
        html = '<base href="https://b.com/"><img src="//cdn.com/i.png">'
        assert extract_images(html, "https://e.com/") == ["https://cdn.com/i.png"]


class TestExtractMetadata:
    def test_core_fields(self):
        html = (
            '<html lang="en"><head><title>My Page</title>'
            '<link rel="icon" href="/fav.ico">'
            '<meta property="og:title" content="OG T">'
            '<meta name="description" content="D1">'
            "</head><body></body></html>"
        )
        m = extract_metadata(html)
        assert m["title"] == "My Page"
        assert m["favicon"] == "/fav.ico"
        assert m["language"] == "en"
        assert m["ogTitle"] == "OG T"
        assert m["description"] == "D1"
        # generic sweep also records the raw property key
        assert m["og:title"] == "OG T"

    def test_description_concat(self):
        html = (
            '<meta name="description" content="A">'
            '<meta name="description" content="B">'
        )
        assert extract_metadata(html)["description"] == "A, B"

    def test_duplicate_meta_becomes_array(self):
        html = '<meta name="tag" content="a"><meta name="tag" content="b">'
        assert extract_metadata(html)["tag"] == ["a", "b"]

    def test_og_locale_alternate_array(self):
        html = (
            '<meta property="og:locale:alternate" content="fr_FR">'
            '<meta property="og:locale:alternate" content="de_DE">'
        )
        assert extract_metadata(html)["ogLocaleAlternate"] == ["fr_FR", "de_DE"]

    def test_title_never_overwritten(self):
        html = "<title>Real</title><meta name=\"title\" content=\"Fake\">"
        m = extract_metadata(html)
        assert m["title"] == "Real"


class TestDecode:
    def test_utf8(self):
        assert decode_html("héllo".encode("utf-8")) == "héllo"

    def test_meta_charset_redecode(self):
        # latin-1 bytes with declared charset
        raw = '<meta charset="iso-8859-1"><p>caf\xe9</p>'.encode("latin-1")
        assert "café" in decode_html(raw)

    def test_bad_charset_falls_back(self):
        raw = b'<meta charset="nonsense"><p>ok</p>'
        assert "ok" in decode_html(raw)


class TestGatekeeper:
    def test_thin_page(self):
        r = evaluate_gatekeeper("https://e.com/", 200, "<p>tiny</p>")
        assert r.block_class == "thin" and r.content_status == "thin"
        assert set(r.evidence[0]["signals"]) == {
            "html_bytes_lt", "visible_text_len_lt", "main_content_len_lt",
        }

    def test_usable_page(self):
        body = "<main>" + ("word " * 300) + "</main>"
        html = "<html><body>" + body + ("x" * 2048) + "</body></html>"
        r = evaluate_gatekeeper("https://e.com/", 200, html)
        assert r.block_class == "none" and r.content_status == "usable"

    def test_rule_match(self):
        rules = [{
            "id": "cf", "block_class": "challenge",
            "signals": [{"type": "contains_script", "value": "cf-challenge"}],
            "confidence": 0.9,
        }]
        r = evaluate_gatekeeper(
            "https://e.com/", 403, "<script src='cf-challenge.js'></script>",
            rules=rules,
        )
        assert r.block_class == "challenge" and r.confidence == 0.9

    def test_visible_text_main(self):
        text, main = visible_text(
            "<body><script>x</script><p>a  b</p><main>core text</main></body>"
        )
        # cheerio's .text() concatenates text nodes with no separator at
        # block boundaries — "a  b" + "core text" → collapsed
        assert text == "a bcore text"
        assert main == len("core text")


class TestScrapePage:
    def test_full_document(self):
        html = (
            '<html lang="en"><head><title>T</title></head><body>'
            "<main><h1>Hello</h1><p>" + ("content " * 300) + "</p>"
            '<a href="/next">next</a></main>'
            "<footer>f</footer></body></html>"
        ).encode()
        doc = scrape_page(
            "https://e.com/", html,
            options=ScrapeOptions(formats=("markdown", "links", "html")),
        )
        assert doc.markdown is not None and doc.markdown.startswith("Hello\n=====")
        assert "[next](https://e.com/next)" in doc.markdown
        assert doc.links == ["https://e.com/next"]
        assert doc.metadata["title"] == "T"
        assert doc.usable

    def test_empty_main_retry(self):
        # everything is boilerplate → onlyMainContent pass is empty → retry
        html = b"<body><nav><p>All nav content here</p></nav></body>"
        doc = scrape_page("https://e.com/", html)
        assert doc.markdown == "All nav content here"

    def test_missing_html(self):
        doc = scrape_page("https://e.com/", None)
        assert not doc.usable and doc.content_status == "thin"


class TestIframeRecursion:
    """crawler.ts:502-516: links inside iframe[src^=data:text/html] bodies
    are URI-decoded and extracted against the same page URL."""

    def _opts(self):
        from webcrawl_spark.kernels.classify import FilterOptions

        return FilterOptions(base_url="https://ex.com/",
                             initial_url="https://ex.com/",
                             allow_backward_crawling=True)

    def test_data_url_iframe_links_extracted(self):
        from urllib.parse import quote

        from webcrawl_spark.kernels.crawl import page_links

        inner = '<a href="/from-iframe">x</a>'
        html = (
            '<html><body><a href="/top">t</a>'
            f'<iframe src="data:text/html,{quote(inner)}"></iframe>'
            "</body></html>"
        )
        links = page_links(html, "https://ex.com/", self._opts())
        assert links == ["https://ex.com/top", "https://ex.com/from-iframe"]

    def test_nested_iframes_and_dedup(self):
        from urllib.parse import quote

        from webcrawl_spark.kernels.crawl import page_links

        innermost = '<a href="/deep">d</a><a href="/top">dup</a>'
        inner = ('<a href="/mid">m</a>'
                 f'<iframe src="data:text/html,{quote(innermost)}"></iframe>')
        html = ('<a href="/top">t</a>'
                f'<iframe src="data:text/html,{quote(inner)}"></iframe>')
        links = page_links(html, "https://ex.com/", self._opts())
        assert links == ["https://ex.com/top", "https://ex.com/mid",
                         "https://ex.com/deep"]

    def test_non_html_data_and_external_iframes_ignored(self):
        from webcrawl_spark.kernels.crawl import page_links

        html = ('<a href="/a">a</a>'
                '<iframe src="data:image/png;base64,AAAA"></iframe>'
                '<iframe src="https://other.com/frame"></iframe>')
        links = page_links(html, "https://ex.com/", self._opts())
        assert links == ["https://ex.com/a"]

    def test_self_embedding_iframe_terminates(self):
        from webcrawl_spark.kernels.crawl import page_links

        html = ('<iframe src="data:text/html,<iframe src=\'data:text/html,'
                '<a href=/x>x</a>\'></iframe>"></iframe>')
        links = page_links(html, "https://ex.com/", self._opts())
        assert "https://ex.com/x" in links


class TestOmceSignatures:
    """html.rs:443-484 OMCE node-dropping: post-order signature match →
    detach, only under onlyMainContent, pre-exclude tree. Signature algo
    is the documented stand-in (nodesig is an unvendored external crate;
    the service never passes signatures)."""

    HTML = ('<html><head><title>t</title></head><body>'
            '<div class="promo-x">Buy now!</div>'
            '<p>Keep this text</p>'
            '<div class="promo-x">Buy now!</div></body></html>')

    def test_matching_nodes_dropped(self):
        from webcrawl_spark.kernels.htmlkit import (node_signature,
                                                    parse_html,
                                                    transform_document)

        doc = parse_html(self.HTML)
        sig = node_signature(doc.select("div")[0], "struct")
        out = transform_document(self.HTML, "https://x.example/",
                                 omce_signatures=[sig]).serialize()
        assert "Buy now" not in out
        assert "Keep this text" in out

    def test_no_signatures_no_change(self):
        from webcrawl_spark.kernels.htmlkit import transform_document

        out = transform_document(self.HTML, "https://x.example/").serialize()
        assert "Buy now" in out

    def test_unmatched_mode_ignored(self):
        from webcrawl_spark.kernels.htmlkit import transform_document

        out = transform_document(
            self.HTML, "https://x.example/",
            omce_signatures=["1:othermode:deadbeef"]).serialize()
        assert "Buy now" in out

    def test_only_main_content_gates_omce(self):
        from webcrawl_spark.kernels.htmlkit import (node_signature,
                                                    parse_html,
                                                    transform_document)

        doc = parse_html(self.HTML)
        sig = node_signature(doc.select("div")[0], "struct")
        out = transform_document(self.HTML, "https://x.example/",
                                 only_main_content=False,
                                 omce_signatures=[sig]).serialize()
        assert "Buy now" in out
