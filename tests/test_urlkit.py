"""URL kernel tests — vectors ported from the reference's own suites:
crawler.rs tests (FR/crawler.rs:738-1053), maxDepthUtils.test.ts,
utils.test.ts (section anchors), crawler.test.ts."""

from webcrawl_spark.kernels.urlkit import (
    URLParseError,
    canonicalize_url,
    get_url_depth,
    join_url,
    normalize_sitemap_url,
    parse_url,
    url_path,
)

import pytest


class TestParse:
    def test_trailing_slash_added(self):
        # url::Url::parse("https://example.com").as_str() == "https://example.com/"
        assert str(parse_url("https://example.com")) == "https://example.com/"

    def test_host_lowercased(self):
        assert str(parse_url("https://EXAMPLE.com/Path")) == "https://example.com/Path"

    def test_default_port_stripped(self):
        assert str(parse_url("https://example.com:443/a")) == "https://example.com/a"
        assert str(parse_url("http://example.com:80/a")) == "http://example.com/a"
        assert str(parse_url("http://example.com:8080/a")) == "http://example.com:8080/a"

    def test_opaque_schemes(self):
        assert str(parse_url("mailto:bob@example.com")) == "mailto:bob@example.com"
        assert str(parse_url("tel:+1234")) == "tel:+1234"

    def test_relative_fails(self):
        with pytest.raises(URLParseError):
            parse_url("/just/a/path")

    def test_fragment_and_query_kept(self):
        u = parse_url("https://example.com/a?b=1#frag")
        assert str(u) == "https://example.com/a?b=1#frag"


class TestJoin:
    def test_relative(self):
        assert str(join_url("https://example.com/dir/", "page")) == "https://example.com/dir/page"

    def test_absolute_wins(self):
        assert str(join_url("https://example.com/", "https://other.com/x")) == "https://other.com/x"

    def test_mailto_passthrough(self):
        assert str(join_url("https://example.com/", "mailto:x@y.z")) == "mailto:x@y.z"

    def test_root_relative(self):
        assert str(join_url("https://example.com/a/b", "/c")) == "https://example.com/c"

    def test_protocol_relative(self):
        assert str(join_url("https://example.com/", "//cdn.example.com/i.png")) == "https://cdn.example.com/i.png"


class TestDepth:
    # maxDepthUtils.test.ts:4-41 semantics (via pathname)
    def test_root_is_zero(self):
        assert get_url_depth(url_path("https://example.com")) == 0
        assert get_url_depth(url_path("https://example.com/")) == 0

    def test_segments(self):
        assert get_url_depth(url_path("https://example.com/pages/articles")) == 2
        assert get_url_depth(url_path("https://example.com/a/b/c")) == 3

    def test_index_excluded(self):
        # crawler.rs:137-142
        assert get_url_depth("/a/index.html") == 1
        assert get_url_depth("/index.php") == 0
        assert get_url_depth("/a//b/") == 2


class TestCanonicalize:
    def test_lowercase_host_strip_fragment(self):
        assert canonicalize_url("https://WWW.Example.COM/A/B#frag") == "https://www.example.com/A/B"

    def test_sort_query(self):
        assert canonicalize_url("https://e.com/p?z=1&a=2&m=3") == "https://e.com/p?a=2&m=3&z=1"

    def test_default_port(self):
        assert canonicalize_url("https://e.com:443/p") == "https://e.com/p"

    def test_unparseable_is_empty(self):
        assert canonicalize_url("not a url") == ""

    def test_idempotent(self):
        u = "https://e.com/p?a=2&b=1"
        assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)


class TestNormalizeSitemap:
    # crawler.ts:368-374
    def test_strip_all(self):
        assert normalize_sitemap_url("https://www.example.com/a/") == "example.com/a"
        assert normalize_sitemap_url("http://example.com") == "example.com"
        assert normalize_sitemap_url("example.com/") == "example.com"


class TestXxh64:
    def test_bit_parity_with_spark(self, spark):
        """kernels/xxh64.py must match F.xxhash64 bit-for-bit — the
        driver-side frontier bucket assignment depends on it."""
        import random
        import string

        from pyspark.sql import functions as F

        from webcrawl_spark.kernels.xxh64 import spark_bucket, xxhash64

        random.seed(2)
        vals = (["", "a", "ab", "abc", "abcd", "x" * 31, "x" * 32, "x" * 33,
                 "host0.example.com", "日本語", "ü" * 20]
                + ["".join(random.choices(string.printable, k=k))
                   for k in range(0, 80, 3)])
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        want = {r["s"]: r["h"] for r in
                df.select("s", F.xxhash64("s").alias("h")).collect()}
        for v in vals:
            assert xxhash64(v) == want[v], v
        bucket = {r["s"]: r["b"] for r in df.select(
            "s", F.pmod(F.xxhash64("s"), F.lit(256)).cast("int").alias("b")
        ).collect()}
        for v in vals:
            assert spark_bucket(v, 256) == bucket[v]
