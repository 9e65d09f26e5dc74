"""Engpicker verdict (A2) — packages/firecrawl-rs/src/engpicker.rs:85-205.

Per-URL: compare the tls-client markdown against the chrome-cdp "gold
standard" via Levenshtein similarity (1 - distance/max_len); aggregate rates
→ TLS_CLIENT_OK | CHROME_CDP_REQUIRED | UNCERTAIN. The similarity is
computed JVM-side with F.levenshtein (whole-stage codegen); the reference
normalizes by byte length — identical for the ASCII corpus (documented
divergence for multibyte)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["engpicker_url_verdicts", "engpicker_verdict"]


def engpicker_url_verdicts(
    df: DataFrame,
    similarity_threshold: float = 0.8,
    gold_col: str = "cdp_markdown",
    tls_col: str = "tls_markdown",
) -> DataFrame:
    """Adds per-URL verdict columns. Input rows: (url, cdp_markdown,
    tls_markdown) — null/empty marks engine failure (engpicker.rs:96-141)."""
    gold, tls = F.col(gold_col), F.col(tls_col)
    cdp_failed = gold.isNull() | (F.length(gold) == 0)
    tls_failed = tls.isNull() | (F.length(tls) == 0)
    max_len = F.greatest(F.length(gold), F.length(tls))
    similarity = F.when(
        max_len > 0,
        1.0 - F.levenshtein(gold, tls).cast("double") / max_len,
    ).otherwise(F.lit(1.0))
    return df.select(
        "url",
        cdp_failed.alias("cdp_failed"),
        F.when(cdp_failed | tls_failed, F.lit(None).cast("double"))
        .otherwise(F.round(similarity, 6)).alias("similarity"),
        F.when(cdp_failed | tls_failed, F.lit(False))
        .otherwise(similarity >= similarity_threshold)
        .alias("tls_client_sufficient"),
    )


def engpicker_verdict(
    df: DataFrame,
    similarity_threshold: float = 0.8,
    success_rate_threshold: float = 0.9,
    cdp_failure_threshold: float = 0.5,
    **cols,
) -> DataFrame:
    """Aggregate verdict (engpicker.rs:165-195) as a 1-row DataFrame."""
    verdicts = engpicker_url_verdicts(df, similarity_threshold, **cols)
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("total_urls"),
        F.sum(F.col("cdp_failed").cast("int")).alias("cdp_failed_count"),
        F.sum(F.col("tls_client_sufficient").cast("int"))
        .alias("tls_client_ok_count"),
        F.sum(((~F.col("tls_client_sufficient")) & (~F.col("cdp_failed")))
              .cast("int")).alias("chrome_cdp_required_count"),
    )
    total = F.col("total_urls")
    comparable = total - F.col("cdp_failed_count")
    verdict = (
        F.when(total == 0, F.lit("UNCERTAIN"))
        .when(F.col("cdp_failed_count") / total > cdp_failure_threshold,
              F.lit("UNCERTAIN"))
        .when(comparable == 0, F.lit("UNCERTAIN"))
        .when(F.col("tls_client_ok_count") / comparable
              >= success_rate_threshold, F.lit("TLS_CLIENT_OK"))
        .otherwise(F.lit("CHROME_CDP_REQUIRED"))
    )
    return agg.withColumn("verdict", verdict)
