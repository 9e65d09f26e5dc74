"""Structured Streaming skin: stateless scrape over a stream and the
watermarked fetch-metrics rollup, driven by file sources + memory sinks."""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F


def _run_stream_to_memory(sdf, name, mode="append", timeout=60):
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout)
    return q


class TestStreamScrape:
    def test_streaming_markdown_matches_batch(self, spark, pages_df, tmp_path):
        from webcrawl_spark.kernels.scrape import ScrapeOptions
        from webcrawl_spark.streaming import stream_scrape

        src = str(tmp_path / "pages_src")
        pages_df.limit(20).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(pages_df.schema).parquet(src)
        out = stream_scrape(stream, ScrapeOptions(formats=("markdown",)))
        assert out.isStreaming
        _run_stream_to_memory(out.select("url", "markdown", "text"),
                              "scrape_stream")
        got = spark.sql("select * from scrape_stream").collect()
        assert len(got) == 20
        assert all(r["markdown"] == r["text"] for r in got)


class TestStreamMetrics:
    def test_windowed_rollup(self, spark):
        from webcrawl_spark.streaming import stream_fetch_metrics

        base = dt.datetime(2025, 6, 1, 12, 0, 0)
        rows = []
        for i in range(60):
            rows.append((
                f"https://h{i % 2}.com/p{i}", f"h{i % 2}.com",
                200 if i % 5 else 500, 1000 + i,
                base + dt.timedelta(seconds=10 * i),
            ))
        import tempfile
        src = tempfile.mkdtemp(prefix="fetch_ev_")
        df = spark.createDataFrame(
            rows, "url string, host string, status int, n_bytes long, "
                  "fetched_at timestamp",
        )
        df.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        rollup = stream_fetch_metrics(stream, window="1 minute",
                                      watermark="2 minutes")
        # complete mode: emit all windows including those still inside the
        # watermark (append mode would withhold the trailing 2 minutes —
        # correct late-data semantics, asserted implicitly by complete≥append)
        _run_stream_to_memory(rollup, "fetch_metrics", mode="complete")
        got = spark.sql(
            "select * from fetch_metrics order by window_start, host"
        ).collect()
        # 60 events over 600s → 10 windows × 2 hosts
        assert len(got) == 20
        assert all(r["n_fetches"] == 3 for r in got)
        total_ok = sum(r["n_ok"] for r in got)
        assert total_ok == sum(1 for i in range(60) if i % 5)
