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
    decoded = decode_html_udf(F.col(html_col))
    out = pages.withColumn("_html_text", decoded)
    html_text = F.col("_html_text")

    if "markdown" in options.formats:
        out = out.withColumn(
            "markdown",
            markdown_udf(
                options.include_tags, options.exclude_tags,
                options.only_main_content,
            )(html_text, url),
        )
    if "links" in options.formats:
        out = out.withColumn("links", links_udf(html_text, url))
    if "images" in options.formats:
        out = out.withColumn("images", images_udf(html_text, url))
    if "rawHtml" in options.formats:
        out = out.withColumn("raw_html", html_text)
    out = out.withColumn("metadata_json", metadata_json_udf(html_text))

    status = (
        F.col(status_col) if status_col is not None else F.lit(200)
    ).cast("int")
    out = out.withColumn(
        "quality", gatekeeper_udf(options.thresholds)(url, status, html_text)
    )
    return out.drop("_html_text")
