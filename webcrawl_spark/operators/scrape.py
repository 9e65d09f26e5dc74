"""The ``scrape`` operator — POST /scrape re-expressed as one declarative
select over a pages DataFrame (SURVEY.md §3.2).

Each requested format is its own column produced by its own UDF, so Catalyst
column pruning drops un-consumed formats entirely (the reference's
format-based output pruning, scrapeURL/index.ts:347-349, becomes free
optimizer behavior — SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    decode_html_udf,
    gatekeeper_udf,
    images_udf,
    links_udf,
    markdown_udf,
    metadata_json_udf,
    transform_html_udf,
)
from ..kernels.scrape import ScrapeOptions

__all__ = ["scrape"]


def scrape(
    pages: DataFrame,
    options: ScrapeOptions = ScrapeOptions(),
    url_col: str = "url",
    html_col: str = "html",
    status_col: str | None = None,
) -> DataFrame:
    """pages(url, html:binary, ...) → + per-format columns.

    Output columns (by requested format): ``markdown``, ``links``, ``images``,
    ``raw_html``, ``metadata_json``, plus gatekeeper struct ``quality``.
    """
    url = F.col(url_col)
    # each format UDF consumes the binary html column directly and decodes
    # in Python (U5) — no JVM string materialization, no inter-UDF shipping
    html = F.col(html_col)
    out = pages

    if "markdown" in options.formats:
        out = out.withColumn(
            "markdown",
            markdown_udf(
                options.include_tags, options.exclude_tags,
                options.only_main_content,
            )(html, url),
        )
    if "html" in options.formats:
        # cleaned-html format (types.ts:3-16 FormatObject "html"):
        # transformHtml output as its own column
        out = out.withColumn(
            "html_clean",
            transform_html_udf(
                options.include_tags, options.exclude_tags,
                options.only_main_content,
            )(html, url),
        )
    if "links" in options.formats:
        out = out.withColumn("links", links_udf(html, url))
    if "images" in options.formats:
        out = out.withColumn("images", images_udf(html, url))
    if "rawHtml" in options.formats:
        out = out.withColumn("raw_html", decode_html_udf(html))
    out = out.withColumn("metadata_json", metadata_json_udf(html))

    status = (
        F.col(status_col) if status_col is not None else F.lit(200)
    ).cast("int")
    out = out.withColumn(
        "quality", gatekeeper_udf(options.thresholds)(url, status, html)
    )
    return out
