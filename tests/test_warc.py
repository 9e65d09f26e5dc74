"""WARC source: record grammar, gzip members, HTTP payload split, and the
distributed binaryFile → mapInPandas read path."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from webcrawl_spark.sources.warc import (
    build_warc_bytes, parse_warc_bytes, read_warc,
)

UTC = dt.timezone.utc


def _records():
    return [
        {"url": "https://a.example.com/", "http_status": 200,
         "warc_ts": dt.datetime(2026, 1, 2, 3, 4, 5, tzinfo=UTC),
         "content_type": "text/html",
         "html": b"<html><body>Alpha page</body></html>"},
        {"url": "https://b.example.com/x", "http_status": 404,
         "warc_ts": dt.datetime(2026, 1, 2, 3, 5, 6, tzinfo=UTC),
         "content_type": "text/html; charset=utf-8",
         "html": b"<html>not found</html>"},
    ]


class TestParse:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, gz):
        data = build_warc_bytes(_records(), gzip_members=gz)
        got = parse_warc_bytes(data)
        assert [r["url"] for r in got] == \
            ["https://a.example.com/", "https://b.example.com/x"]
        assert got[0]["http_status"] == 200
        assert got[1]["http_status"] == 404
        assert got[0]["payload"] == b"<html><body>Alpha page</body></html>"
        assert got[0]["warc_ts"] == dt.datetime(2026, 1, 2, 3, 4, 5,
                                                tzinfo=UTC)
        assert got[1]["content_type"].startswith("text/html")

    def test_non_response_records_kept_raw(self):
        info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                b"Content-Type: application/warc-fields\r\n"
                b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n")
        got = parse_warc_bytes(info + build_warc_bytes(_records()))
        assert got[0]["warc_type"] == "warcinfo"
        assert got[0]["http_status"] is None
        assert len(got) == 3

    def test_malformed_length_stops_cleanly(self):
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: zzz\r\n\r\nbody")
        assert parse_warc_bytes(bad) == []

    def test_binary_payload_with_crlf_noise(self):
        """Payload bytes containing CRLFCRLF and 'WARC/' must not split the
        record — Content-Length is authoritative."""
        tricky = _records()[0] | {"html": b"x\r\n\r\nWARC/1.0\r\ny" * 3}
        got = parse_warc_bytes(build_warc_bytes([tricky] + _records()[1:]))
        assert len(got) == 2
        assert got[0]["payload"] == b"x\r\n\r\nWARC/1.0\r\ny" * 3


class TestReadWarc:
    def test_distributed_read(self, spark, tmp_path):
        for i, gz in enumerate([False, True]):
            ext = "warc.gz" if gz else "warc"
            (tmp_path / f"part{i}.{ext}").write_bytes(
                build_warc_bytes(_records(), gzip_members=gz))
        df = read_warc(spark, str(tmp_path) + "/*.warc*")
        rows = df.collect()
        assert len(rows) == 4                      # 2 files x 2 responses
        by_url = {}
        for r in rows:
            by_url.setdefault(r["url"], []).append(r)
        assert set(by_url) == {"https://a.example.com/",
                               "https://b.example.com/x"}
        a = by_url["https://a.example.com/"][0]
        assert bytes(a["html"]) == b"<html><body>Alpha page</body></html>"
        assert a["http_status"] == 200
        assert a["warc_ts"] == dt.datetime(2026, 1, 2, 3, 4, 5)  # naive local≙utc session

    def test_feeds_scrape_pipeline(self, spark, tmp_path):
        """read_warc output is a drop-in pages table for the extraction
        stage (url, html)."""
        from webcrawl_spark.operators.scrape import scrape

        (tmp_path / "p.warc").write_bytes(build_warc_bytes(_records()[:1]))
        pages = read_warc(spark, str(tmp_path) + "/*.warc") \
            .select("url", "html")
        out = scrape(pages).select("url", "markdown").first()
        assert "Alpha page" in out["markdown"]


class TestWarcCrawlReplay:
    def test_crawl_from_warc_matches_pages_df(self, spark, tmp_path):
        """A Common-Crawl-style WARC snapshot is a drop-in fetch corpus:
        SparkCrawl over read_warc(...) pages produces the same fetch order
        as over the direct (url, html) DataFrame."""
        from webcrawl_spark.datagen import build_site, render_page_html
        from webcrawl_spark.frontier.crawl import SparkCrawl
        from webcrawl_spark.frontier.oracle import CrawlConfig

        site = build_site(seed=9, n_hosts=2, pages_per_host=10, n_hot_hosts=0)
        recs = [{"url": u,
                 "warc_ts": dt.datetime(2026, 2, 1, 0, 0, 0, tzinfo=UTC),
                 "html": render_page_html(site, u).encode(),
                 "http_status": 200, "content_type": "text/html"}
                for u in site.urls()]
        half = len(recs) // 2
        (tmp_path / "a.warc.gz").write_bytes(
            build_warc_bytes(recs[:half], gzip_members=True))
        (tmp_path / "b.warc").write_bytes(build_warc_bytes(recs[half:]))

        warc_pages = read_warc(spark, str(tmp_path) + "/*.warc*") \
            .select("url", "html")
        direct_pages = spark.createDataFrame(
            [(r["url"], r["html"]) for r in recs], "url string, html binary")

        cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", limit=12,
                          max_depth=3, allow_backward_crawling=True,
                          host_budget=4)
        orders = []
        for tag, pages in (("warc", warc_pages), ("direct", direct_pages)):
            wd = str(tmp_path / f"crawl_{tag}")
            crawl = SparkCrawl(spark, pages, cfg, wd)
            crawl.run()
            orders.append(crawl.fetch_order())
        assert orders[0] == orders[1]
        assert len(orders[0]) > 0


class TestWarcProperty:
    def test_roundtrip_property(self):
        """parse(build(records)) == records for arbitrary payload bytes,
        statuses and urls (hypothesis)."""
        from hypothesis import given, settings, strategies as st

        payload = st.binary(min_size=0, max_size=2000)
        status = st.integers(min_value=100, max_value=599)
        hostpart = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1,
            max_size=12)
        ts = st.datetimes(
            min_value=dt.datetime(1996, 1, 1),
            max_value=dt.datetime(2100, 1, 1),
        ).map(lambda d: d.replace(microsecond=0, tzinfo=UTC))

        @settings(max_examples=60, deadline=None)
        @given(st.lists(
            st.fixed_dictionaries({
                "url": hostpart.map(lambda h: f"https://{h}.example.com/"),
                "warc_ts": ts, "html": payload, "http_status": status,
                "content_type": st.just("text/html"),
            }), min_size=0, max_size=5), st.booleans())
        def check(records, gz):
            got = parse_warc_bytes(build_warc_bytes(records, gzip_members=gz))
            assert len(got) == len(records)
            for want, have in zip(records, got):
                assert have["url"] == want["url"]
                assert have["warc_ts"] == want["warc_ts"]
                assert have["http_status"] == want["http_status"]
                assert have["payload"] == want["html"]

        check()


class TestWarcPages:
    def test_error_captures_and_recrawls_filtered(self, spark, tmp_path):
        """warc_pages keeps only status-200 captures and one capture per
        URL (latest warc_ts) — error bodies must not become page content
        and re-crawls must not produce duplicate fetch rows."""
        from webcrawl_spark.sources.warc import warc_pages

        recs = [
            {"url": "https://a.example.com/", "http_status": 200,
             "warc_ts": dt.datetime(2026, 1, 1, tzinfo=UTC),
             "content_type": "text/html", "html": b"<html>old capture</html>"},
            {"url": "https://a.example.com/", "http_status": 200,
             "warc_ts": dt.datetime(2026, 2, 1, tzinfo=UTC),
             "content_type": "text/html", "html": b"<html>new capture</html>"},
            {"url": "https://b.example.com/", "http_status": 404,
             "warc_ts": dt.datetime(2026, 2, 1, tzinfo=UTC),
             "content_type": "text/html", "html": b"<html>not found</html>"},
            {"url": "https://c.example.com/", "http_status": 301,
             "warc_ts": dt.datetime(2026, 2, 1, tzinfo=UTC),
             "content_type": "text/html", "html": b"<html>moved</html>"},
        ]
        (tmp_path / "snap.warc").write_bytes(build_warc_bytes(recs))
        rows = warc_pages(spark, str(tmp_path) + "/*.warc").collect()
        assert len(rows) == 1
        assert rows[0]["url"] == "https://a.example.com/"
        assert bytes(rows[0]["html"]) == b"<html>new capture</html>"


class TestWetText:
    def test_conversion_records_to_documents(self, spark, tmp_path):
        """WET conversion records land as (url, warc_ts, text) and feed the
        documents-table operators directly."""
        from webcrawl_spark.sources.warc import wet_text

        def conv(url, ts, text):
            body = text.encode("utf-8")
            return (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
                    b"WARC-Target-URI: " + url.encode() + b"\r\n"
                    b"WARC-Date: " + ts.encode() + b"\r\n"
                    b"Content-Type: text/plain\r\n"
                    b"Content-Length: " + str(len(body)).encode() +
                    b"\r\n\r\n" + body + b"\r\n\r\n")

        data = (conv("https://a.example.com/", "2026-03-01T00:00:00Z",
                     "the quick brown fox and the lazy dog")
                + conv("https://b.example.com/", "2026-03-01T00:01:00Z",
                       "der schnelle braune fuchs und die hunde"))
        # a response record in the same file must be excluded
        data += build_warc_bytes([{
            "url": "https://c.example.com/", "http_status": 200,
            "warc_ts": dt.datetime(2026, 3, 1, tzinfo=UTC),
            "content_type": "text/html", "html": b"<html>x</html>"}])
        (tmp_path / "seg.warc").write_bytes(data)
        rows = wet_text(spark, str(tmp_path) + "/*.warc").collect()
        assert {r["url"] for r in rows} == {"https://a.example.com/",
                                            "https://b.example.com/"}
        texts = {r["url"]: r["text"] for r in rows}
        assert texts["https://a.example.com/"].startswith("the quick")

        # straight into a text operator
        from pyspark.sql import functions as F

        from webcrawl_spark.operators.textstats import language_guess

        docs = wet_text(spark, str(tmp_path) + "/*.warc")
        langs = {r["url"]: r["l"] for r in docs.select(
            "url", language_guess(F.col("text")).alias("l")).collect()}
        assert langs["https://a.example.com/"] == "en"
        assert langs["https://b.example.com/"] == "de"


class TestEndToEndPipeline:
    def test_warc_to_training_chunks(self, spark, tmp_path):
        """The full corpus journey on one engine: WARC snapshot → markdown
        extraction → exact dedup → Gopher word-count gate → token-window
        chunks. Each stage is the public operator, composed as a user
        would compose them."""
        from pyspark.sql import functions as F

        from webcrawl_spark.operators.corpus import chunk_documents
        from webcrawl_spark.operators.dedup import exact_dedup
        from webcrawl_spark.operators.scrape import scrape
        from webcrawl_spark.operators.textstats import gopher_quality_flags
        from webcrawl_spark.sources.warc import warc_pages

        body = " ".join(f"word{i} and the text goes on" for i in range(30))
        recs = []
        for i, (host, text) in enumerate([
            ("a", body), ("b", body),            # exact dups across hosts
            ("c", "tiny page"),                  # fails word-count gate
            ("d", body + " unique tail content here"),
        ]):
            recs.append({
                "url": f"https://{host}.example.com/", "http_status": 200,
                "warc_ts": dt.datetime(2026, 4, 1, i, tzinfo=UTC),
                "content_type": "text/html",
                "html": f"<html><body><p>{text}</p></body></html>".encode()})
        (tmp_path / "cc.warc.gz").write_bytes(
            build_warc_bytes(recs, gzip_members=True))

        docs = (
            scrape(warc_pages(spark, str(tmp_path) + "/*.warc.gz"))
            .select(F.col("url").alias("doc_id"),
                    F.col("markdown").alias("text"))
        )
        deduped = exact_dedup(docs, id_col="doc_id")
        kept = deduped.filter(
            gopher_quality_flags(F.col("text"))["ok_word_count"])
        chunks = chunk_documents(kept, max_words=64, overlap=8)

        urls = {r["doc_id"] for r in kept.select("doc_id").collect()}
        # one of the two dup hosts survives, tiny page gated out
        assert len(urls & {"https://a.example.com/",
                           "https://b.example.com/"}) == 1
        assert "https://c.example.com/" not in urls
        assert "https://d.example.com/" in urls
        out = chunks.collect()
        assert len(out) >= 4                    # >=2 chunks per kept doc
        assert all(r["n_words_chunk"] <= 64 for r in out)


class TestStreamingShape:
    """r4 verdict scale fix: a task never holds a whole decompressed WARC —
    the parser is incremental and the Spark read distributes PATHS."""

    def test_scan_reads_paths_only(self, spark, tmp_path):
        """The binaryFile scan under read_warc must prune the content
        column — file bytes are opened inside the task, not shipped
        through the scan."""
        (tmp_path / "w.warc").write_bytes(build_warc_bytes(_records()))
        df = read_warc(spark, str(tmp_path) + "/*.warc")
        plan = df._jdf.queryExecution().executedPlan().toString()
        read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "path" in read_schema
        assert "content" not in read_schema

    def test_iter_stream_bounded_memory(self, tmp_path):
        """Peak python-alloc while streaming a ~120 MB WARC stays tens of
        MB (one record + one read chunk), nowhere near file size."""
        import tracemalloc

        from webcrawl_spark.sources.warc import (
            _decompressed, iter_warc_stream,
        )

        page = (b"<html><body>" + b"x" * 120_000 + b"</body></html>")
        recs = [{"url": f"https://h{i}.test/", "http_status": 200,
                 "warc_ts": dt.datetime(2026, 1, 1, tzinfo=UTC),
                 "content_type": "text/html", "html": page}
                for i in range(1000)]          # ~120 MB uncompressed
        f = tmp_path / "big.warc"
        f.write_bytes(build_warc_bytes(recs))
        file_mb = f.stat().st_size / 2**20
        assert file_mb > 100

        n, seen_bytes = 0, 0
        tracemalloc.start()
        with open(f, "rb") as fh:
            for r in iter_warc_stream(_decompressed(fh)):
                n += 1
                seen_bytes += len(r["payload"])
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert n == 1000 and seen_bytes > 100 * 2**20
        # bound: read chunk (1 MB) + a record (~0.12 MB) + slack — use
        # 16 MB, an order of magnitude under the file size
        assert peak < 16 * 2**20, f"peak {peak/2**20:.1f} MB"

    def test_chunked_yield_partitions_one_file(self, spark, tmp_path):
        """A file larger than chunk_bytes yields multiple record chunks
        from one task, all rows intact."""
        recs = [{"url": f"https://h{i}.test/", "http_status": 200,
                 "warc_ts": dt.datetime(2026, 1, 1, tzinfo=UTC),
                 "content_type": "text/html",
                 "html": b"<p>" + bytes([65 + i % 26]) * 50_000 + b"</p>"}
                for i in range(40)]            # ~2 MB total payload
        (tmp_path / "c.warc.gz").write_bytes(
            build_warc_bytes(recs, gzip_members=True))
        df = read_warc(spark, str(tmp_path) + "/*.warc.gz",
                       chunk_bytes=256 * 1024)
        rows = df.collect()
        assert len(rows) == 40
        assert {r["url"] for r in rows} == {r["url"] for r in
                                            ({"url": x["url"]} for x in recs)}
        assert all(len(r["html"]) == 50_007 for r in rows)


class TestWriteWarc:
    def _pages_df(self, spark, n=20):
        rows = [(f"https://w{i % 4}.example.com/p{i}",
                 dt.datetime(2026, 2, 1, 0, 0, i, tzinfo=UTC),
                 f"<html><body>page {i}</body></html>".encode())
                for i in range(n)]
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary")

    def test_roundtrip_through_reader(self, spark, tmp_path):
        from webcrawl_spark.sources.warc import write_warc

        df = self._pages_df(spark)
        out = str(tmp_path / "sink")
        (tmp_path / "sink").mkdir()
        manifest = write_warc(df, out, n_files=3).collect()
        assert sum(m["records"] for m in manifest) == 20
        assert all(m["path"].endswith(".warc.gz") for m in manifest)
        back = read_warc(spark, out + "/*.warc.gz")
        got = {(r["url"], bytes(r["html"])) for r in back.collect()}
        want = {(r["url"], bytes(r["html"]))
                for r in df.select("url", "html").collect()}
        assert got == want
        # timestamps survive the WARC-Date round trip (second precision)
        ts = {r["url"]: r["warc_ts"] for r in back.collect()}
        assert ts["https://w0.example.com/p0"].second == 0

    def test_rolls_at_max_records(self, spark, tmp_path):
        from webcrawl_spark.sources.warc import write_warc

        out = str(tmp_path / "roll")
        (tmp_path / "roll").mkdir()
        manifest = write_warc(self._pages_df(spark, 20), out,
                              max_records_per_file=3, n_files=1).collect()
        assert len(manifest) == 7            # ceil(20 / 3)
        assert max(m["records"] for m in manifest) == 3
        back = read_warc(spark, out + "/*.warc.gz")
        assert back.count() == 20

    def test_status_and_content_type_columns_respected(self, spark,
                                                       tmp_path):
        from webcrawl_spark.sources.warc import write_warc

        df = self._pages_df(spark, 4) \
            .withColumn("http_status", F.lit(404)) \
            .withColumn("content_type", F.lit("text/plain"))
        out = str(tmp_path / "st")
        (tmp_path / "st").mkdir()
        write_warc(df, out, n_files=1).collect()
        back = read_warc(spark, out + "/*.warc.gz").first()
        assert back["http_status"] == 404
        assert back["content_type"] == "text/plain"

    def test_manifest_runs_once(self, spark, tmp_path):
        """localCheckpoint pins the sink job: consuming the manifest
        twice must not rewrite (and re-count) the files."""
        from webcrawl_spark.sources.warc import write_warc

        out = str(tmp_path / "once")
        (tmp_path / "once").mkdir()
        m = write_warc(self._pages_df(spark, 6), out, n_files=2)
        a = sorted(map(tuple, m.collect()))
        b = sorted(map(tuple, m.collect()))
        assert a == b
