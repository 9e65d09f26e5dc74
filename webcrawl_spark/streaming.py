"""Structured Streaming skin over the batch engine (SURVEY.md §2.6).

The reference has no streaming operators (request-scoped service); the
engine's crawl loop is batch-iterative by design (Iceberg-style round
commits = exactly-resumable state, which streaming state stores don't give
us). What Structured Streaming adds here is the *ingest-facing* surface a
production crawl needs:

- ``stream_scrape``: continuous extraction over a stream of fetched pages
  (readStream of the pages table / a Kafka-shaped source) — the same
  per-format Arrow UDF columns as operators/scrape.py, applied to a
  streaming DataFrame. Stateless → identical semantics to batch.
- ``stream_fetch_metrics``: watermarked tumbling-window rollup of fetch
  events (per-host counts/bytes per window) with late-data tolerance — the
  streaming twin of the batch ``round_metrics`` table.

Both run with the file/rate/memory sources available in tests; on a cluster
the source becomes Kafka/Kinesis with identical code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kernels.scrape import ScrapeOptions
from .operators.scrape import scrape

__all__ = ["stream_scrape", "stream_fetch_metrics"]


def stream_scrape(pages_stream: DataFrame,
                  options: ScrapeOptions = ScrapeOptions()) -> DataFrame:
    """Extraction over a streaming pages DataFrame. The scrape operator is
    stateless column logic, so it applies to streaming plans unchanged."""
    return scrape(pages_stream, options)


def stream_fetch_metrics(
    fetch_events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "fetched_at",
) -> DataFrame:
    """Watermarked per-host tumbling-window fetch metrics.

    fetch_events: streaming df with (url, host, status, n_bytes, fetched_at).
    Late rows beyond the watermark are dropped (at-least-once rollups feed
    the monitoring table, not the exactly-resumable round state)."""
    return (
        fetch_events
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0))
            .alias("n_ok"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n_fetches", "n_ok", "total_bytes",
        )
    )
