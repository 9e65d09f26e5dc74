"""Crawl-trap detection: URL-template explosion per host.

Beyond-§2 crawl operator: at 10^10-URL frontier scale the classic budget
killer is a host whose URL space is generated (calendars, session ids,
faceted search, tracking params). The standard defense (public crawler
practice — e.g. Heritrix's path-pattern guards and the URL-frontier
literature's "spider trap" mitigation) is to collapse URLs into path
TEMPLATES (digit runs → {n}, long hex runs → {hex}) and flag templates
whose concrete-URL population explodes relative to the host's other
templates.

Scale shape:
- ``url_template`` is a pure Column expression (two chained native
  regexp_replace + one regexp_extract) — whole-stage codegen, no UDF, no
  shuffle; it can run inline in the admission pipeline.
- ``template_stats`` is ONE hash aggregation on (host, template);
  ``trap_templates`` layers a host-level aggregate over the (already
  tiny) template table, not over the raw URLs.
- The output composes with the F3 URL blocklist / classify chain: join
  flagged (host, template) against candidates' templates to deny
  admission (broadcast — the trap table is small by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["url_template", "template_stats", "trap_templates",
           "filter_trapped"]

#: hex first (a digit-only run is also a hex run — the longer, more
#: specific collapse must win), then digit runs.
_HEX_RUN = "[0-9a-fA-F]{8,}"
_DIGIT_RUN = "[0-9]+"
_PATH_OF_URL = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def url_template(url: Column) -> Column:
    """URL → (host-relative) path template: /blog/2024/01/x3f9a2c411 →
    /blog/{n}/{n}/x{hex}. Query/fragment are dropped — param-space traps
    surface as one template with a huge population just the same."""
    path = F.regexp_extract(url, _PATH_OF_URL, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    t = F.regexp_replace(path, _HEX_RUN, "{hex}")
    return F.regexp_replace(t, _DIGIT_RUN, "{n}")


def template_stats(urls: DataFrame, url_col: str = "url",
                   host_col: str | None = None) -> DataFrame:
    """URL frame → (host, template, n_urls): one hash aggregation.

    ``host_col`` reuses an existing host column (the frontier already
    carries one — no re-parse); otherwise the host is extracted with the
    same native regexp (no UDF)."""
    host = (F.col(host_col) if host_col
            else F.regexp_extract(
                F.col(url_col),
                "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1))
    return (urls.select(host.alias("host"),
                        url_template(F.col(url_col)).alias("template"))
            .where(F.col("host") != "")
            .groupBy("host", "template")
            .agg(F.count(F.lit(1)).alias("n_urls")))


def trap_templates(urls: DataFrame, url_col: str = "url",
                   host_col: str | None = None,
                   min_urls: int = 1000,
                   min_share: float = 0.5) -> DataFrame:
    """(host, template, n_urls, host_urls, share, is_trap).

    A template is a trap candidate when it holds ≥ ``min_urls`` concrete
    URLs AND ≥ ``min_share`` of its host's URL population — both
    conditions, so a big well-structured host (many URLs spread over many
    templates) never flags, and a tiny host with one template never
    flags either. Host totals come from a window-free second aggregate
    over the template table (already ~|templates| rows, not |urls|)."""
    stats = template_stats(urls, url_col, host_col)
    totals = stats.groupBy("host").agg(F.sum("n_urls").alias("host_urls"))
    return (stats.join(totals, "host")
            .withColumn("share",
                        F.col("n_urls") / F.col("host_urls"))
            .withColumn("is_trap",
                        (F.col("n_urls") >= F.lit(min_urls))
                        & (F.col("share") >= F.lit(min_share))))


def filter_trapped(candidates: DataFrame, traps: DataFrame,
                   url_col: str = "url",
                   host_col: str | None = None) -> DataFrame:
    """Drop candidates whose (host, template) is a flagged trap.

    The composition point with admission: templates come from the same
    pure Column expression, the trap table is tiny by construction
    (flagged templates only), so this is one broadcast LEFT ANTI join —
    no shuffle of the candidate stream, schema passes through unchanged."""
    host = (F.col(host_col) if host_col
            else F.regexp_extract(
                F.col(url_col),
                "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1))
    tagged = candidates.withColumn("_t_host", host).withColumn(
        "_t_tpl", url_template(F.col(url_col)))
    deny = (traps.where(F.col("is_trap"))
            .select(F.col("host").alias("_t_host"),
                    F.col("template").alias("_t_tpl")))
    return (tagged.join(F.broadcast(deny), ["_t_host", "_t_tpl"],
                        "left_anti")
            .drop("_t_host", "_t_tpl"))
