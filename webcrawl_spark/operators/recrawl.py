"""Recrawl scheduling: per-URL change-rate estimation → next-due times.

Beyond-§2 crawl operator: a frontier that only discovers is half a
crawler — the other half decides WHEN to refetch. The estimator is the
public Cho & Garcia-Molina one (TOIT 2003, "Estimating frequency of
change"): over n observed refetch intervals with X detected changes,

    lambda_hat = -n * ln((n - X + 0.5) / (n + 0.5)) / T

(T = observation span; the +0.5 is their bias correction, which also
keeps the estimator finite at X = n; X = 0 yields lambda_hat = 0 —
"never observed changing" — which the scheduler maps to the maximum
revisit interval, not to the default). The schedule then
targets one expected change per revisit: interval = 1/lambda_hat,
clamped to [min_interval, max_interval].

Input is the crawl's own fetch history — (url, fetch_ts, fingerprint)
rows, e.g. crawl_result rounds with the markdown xxhash64 as the
fingerprint. Change detection compares consecutive fingerprints per URL.

Scale shape (10^10 URLs):
- one shuffle keyed on url (the lag window is url-partitioned — never a
  global window), then one hash aggregation to per-URL stats; every
  expression after that is a pure Column formula (JVM codegen, no UDF).
- ``recrawl_schedule`` is column arithmetic over the per-URL stats
  table; joining ``due_now`` URLs back into frontier admission is a
  key-partitioned join on url, co-partitioned with the frontier's own
  bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["fetch_history", "url_change_rates", "recrawl_schedule"]


def fetch_history(results: DataFrame, ts_col: str = "crawl_ts",
                  url_col: str = "url",
                  content_col: str = "markdown") -> DataFrame:
    """crawl_result snapshots → (url, fetch_ts, fingerprint) history.

    The engine's crawl_result rows are deterministic and carry no wall
    clock; the caller tags each crawl run's rows with its run timestamp
    (``ts_col`` — e.g. from the checkpoint commit time or the scheduler
    that launched the run) before unioning runs together. The
    fingerprint is xxhash64 of the extracted content — computed JVM-side
    over the column, so the (possibly large) markdown never reaches
    python and is pruned right after the hash."""
    return results.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("fetch_ts"),
        F.xxhash64(F.coalesce(F.col(content_col), F.lit("")))
        .alias("fingerprint"),
    )


def url_change_rates(history: DataFrame, url_col: str = "url",
                     ts_col: str = "fetch_ts",
                     fp_col: str = "fingerprint") -> DataFrame:
    """(url, n_fetches, n_changes, span, lam): per-URL change-rate
    estimate from consecutive-fetch fingerprint comparisons.

    ``lam`` is NULL where no rate is estimable (single fetch or zero
    span) — the scheduler maps it to the default interval."""
    w = Window.partitionBy(url_col).orderBy(ts_col)
    marked = history.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        (F.lag(F.col(fp_col)).over(w).isNotNull()
         & (F.col(fp_col) != F.lag(F.col(fp_col)).over(w)))
        .alias("changed"),
    )
    stats = marked.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col("changed").cast("long")).alias("n_changes"),
        (F.max("ts") - F.min("ts")).alias("span"),
        F.max("ts").alias("last_ts"),
    )
    n = (F.col("n_fetches") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    lam = F.when(
        (F.col("n_fetches") > 1) & (F.col("span") > 0),
        -n * F.log((n - x + 0.5) / (n + 0.5)) / F.col("span"),
    )
    return stats.select("url", "n_fetches", "n_changes", "span",
                        "last_ts", lam.alias("lam"))


def recrawl_schedule(rates: DataFrame, now: int,
                     min_interval: int = 3600,
                     max_interval: int = 30 * 86400,
                     default_interval: int = 7 * 86400) -> DataFrame:
    """Adds (interval, next_due, due_now) to a change-rate table.

    interval = clamp(1/lam, min, max); URLs without an estimate get the
    default. ``due_now`` = next_due <= now — the flag the next round's
    admission unions in as refetch candidates."""
    # lam == 0 (never observed changing) maps straight to the max — it
    # must not reach the division (ANSI divide-by-zero)
    interval = (
        F.when(F.col("lam") > 0,
               F.least(F.greatest(1.0 / F.col("lam"),
                                  F.lit(float(min_interval))),
                       F.lit(float(max_interval))))
        .when(F.col("lam") == 0, F.lit(float(max_interval)))
        .otherwise(F.lit(float(default_interval))))
    out = rates.withColumn("interval", interval)
    out = out.withColumn(
        "next_due", (F.col("last_ts") + F.col("interval")).cast("double"))
    return out.withColumn("due_now", F.col("next_due") <= F.lit(float(now)))
