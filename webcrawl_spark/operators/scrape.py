"""The ``scrape`` operator — POST /scrape re-expressed as one declarative
select over a pages DataFrame (SURVEY.md §3.2).

Each requested format is its own column produced by its own UDF, so Catalyst
column pruning drops un-consumed formats entirely (the reference's
format-based output pruning, scrapeURL/index.ts:347-349, becomes free
optimizer behavior — SURVEY.md §4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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

__all__ = ["scrape", "scrape_routed", "ROUTED_SCHEMA"]


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


ROUTED_SCHEMA = T.StructType([
    T.StructField("engine", T.StringType()),
    T.StructField("html", T.StringType()),
    T.StructField("markdown", T.StringType()),
    T.StructField("ok", T.BooleanType()),
])


def scrape_routed(
    pages: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    forced_engines: dict | None = None,
    pdf_timeout_ms: int | None = None,
    out_col: str = "scraped",
) -> DataFrame:
    """The full engine-routed scrape — what POST /scrape does for an
    arbitrary URL (scrapeURL/index.ts engine loop, engines/index.ts:54-78
    ordering, collapsed to the deterministic S5 choice):

      engine_choice (native Column: forced map → document → pdf → fetch)
        → fetch:    decode (U5) → markdown (X1-X4); html = transformHtml
        → pdf:      text layer → HTML-escaped as html AND markdown
                    (engines/pdf/index.ts:21-34)
        → document: provider convert (xlsx/docx) → the SAME html→markdown
                    pipeline as fetched pages

    Forced/rendering engines (playwright, fire-engine) have no executor in
    this engine — such rows keep their engine label but run the fetch
    pipeline on the stored payload (the reference's fallback when a
    rendering engine is unavailable, engines/index.ts fallback walk).

    One Arrow stage; the engine column is computed JVM-side so Catalyst can
    partition-prune/filter on it before the UDF runs."""
    from ..kernels.document import convert_document
    from ..kernels.htmlkit import transform_html
    from ..kernels.pdfkit import scrape_pdf_result
    from ..kernels.scrape import markdown_for_page

    def batch(urls: pd.Series, engines: pd.Series,
              payloads: pd.Series) -> pd.DataFrame:
        from ..functions import _as_text
        rows = []
        for url, engine, payload in zip(urls, engines, payloads):
            raw = bytes(payload) if payload is not None else None
            try:
                if engine == "pdf":
                    r = scrape_pdf_result(raw, timeout_ms=pdf_timeout_ms)
                    rows.append((engine, r["html"], r["markdown"], r["ok"]))
                    continue
                if engine == "document":
                    html = convert_document(raw) if raw else None
                    if html is None:
                        rows.append((engine, None, None, False))
                        continue
                    rows.append((engine, html,
                                 markdown_for_page(html, url or ""), True))
                    continue
                text = _as_text(raw)
                if not text:
                    rows.append((engine, None, None, False))
                    continue
                rows.append((
                    engine,
                    transform_html(text, url or ""),
                    markdown_for_page(text, url or ""),
                    True,
                ))
            except Exception:
                rows.append((engine, None, None, False))
        return pd.DataFrame(rows, columns=["engine", "html", "markdown", "ok"])

    routed = pandas_udf(batch, ROUTED_SCHEMA)
    from ..functions import engine_choice_col

    url = F.col(url_col)
    return pages.withColumn(
        "engine_choice", engine_choice_col(url, forced_engines)
    ).withColumn(
        out_col, routed(url, F.col("engine_choice"), F.col(payload_col))
    )
