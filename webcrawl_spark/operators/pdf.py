"""PDF scrape operator (S3/U6) — the pdf engine of the scrape pipeline,
vectorized over binary payload columns.

Semantics per apps/WebCrawl/src/scraper/scrapeURL/engines/pdf/index.ts:21-34
+ 87-120 and packages/firecrawl-rs/src/pdf.rs:13-45 (see kernels/pdfkit.py):
HTML-escaped text layer as BOTH html and markdown, page count + title
metadata, and the 150 ms/page time-budget verdict as a row column (the
reference throws PDFInsufficientTimeError; a DataFrame engine classifies).

Scale posture: one mapInPandas-style Arrow stage, no shuffle; the binary
payload column is consumed in place and never re-shipped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.pdfkit import build_pdf, scrape_pdf_result

__all__ = ["PDF_RESULT_SCHEMA", "pdf_scrape_udf", "scrape_pdfs",
           "build_pdf_udf", "pdf_lines_col"]

PDF_RESULT_SCHEMA = T.StructType([
    T.StructField("num_pages", T.IntegerType()),
    T.StructField("title", T.StringType()),
    T.StructField("html", T.StringType()),
    T.StructField("markdown", T.StringType()),
    T.StructField("insufficient_time", T.BooleanType()),
    T.StructField("ok", T.BooleanType()),
    # refusal taxonomy (kernels/pdfkit.scrape_pdf_result): empty | not_pdf |
    # encrypted | no_pages | insufficient_time | unsupported | parse_error |
    # null (ok)
    T.StructField("error", T.StringType()),
])

_FIELDS = [f.name for f in PDF_RESULT_SCHEMA]


def pdf_scrape_udf(max_pages: int | None = None,
                   timeout_ms: int | None = None):
    """(payload binary) → pdf result struct."""

    def batch(payloads: pd.Series) -> pd.DataFrame:
        rows = [
            scrape_pdf_result(
                bytes(p) if p is not None else None,
                max_pages=max_pages, timeout_ms=timeout_ms,
            )
            for p in payloads
        ]
        return pd.DataFrame([[r[f] for f in _FIELDS] for r in rows],
                            columns=_FIELDS)

    return pandas_udf(batch, PDF_RESULT_SCHEMA)


def scrape_pdfs(
    df: DataFrame,
    payload_col: str = "payload",
    max_pages: int | None = None,
    timeout_ms: int | None = None,
    out_col: str = "pdf",
) -> DataFrame:
    """Attach the pdf engine result struct; rows route here when
    engine_choice_col says 'pdf' (functions.engine_choice_col, S5)."""
    return df.withColumn(
        out_col, pdf_scrape_udf(max_pages, timeout_ms)(F.col(payload_col))
    )


def build_pdf_udf(lines_per_page: int = 40):
    """(lines array<string>, title string) → binary PDF — the deterministic
    synthetic-corpus generator as a column (datagen + oracle queries)."""

    def batch(lines: pd.Series, titles: pd.Series) -> pd.Series:
        return pd.Series(
            [build_pdf([] if ls is None else list(ls), t,
                       lines_per_page=lines_per_page)
             for ls, t in zip(lines, titles)],
            dtype="object",
        )

    return pandas_udf(batch, T.BinaryType())


def pdf_lines_col(text: Column, width: int = 100) -> Column:
    """Fixed-width line chunking of a text column, JVM-side (the layout
    contract shared with the DuckDB oracle: line i = substr(text, i*W+1, W))."""
    n_lines = F.greatest(
        F.ceil(F.length(text) / F.lit(float(width))).cast("int"), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: text.substr(i * width + 1, F.lit(width)),
    )
