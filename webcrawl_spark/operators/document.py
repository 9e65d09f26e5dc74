"""Document scrape operator (S4) — spreadsheet/document payloads → HTML,
which then feeds the standard html→markdown pipeline like any fetched page
(the reference's document engine hands the rendered HTML to the same
transformer chain, scrapeURL engines/document).

Implemented provider: xlsx (kernels/document.py, mirroring
packages/firecrawl-rs/src/document/providers/xlsx.rs:19-73 + the maud HTML
renderer document/renderers/html.rs:11-237). docx/odt/rtf remain out of MVP
(SURVEY.md §2 S4 scope note) — they are ~2.6k LoC of format parsing with the
same operator shape; the seam below is where they plug in.

Scale posture: one Arrow stage over the binary payload column, no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.document import build_xlsx, convert_document, xlsx_to_html

__all__ = ["xlsx_html_udf", "document_html_udf", "scrape_documents",
           "build_xlsx_rows_udf", "build_docx_notes_udf"]


def _converter_udf(fn):
    def batch(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            if p is None:
                out.append(None)
                continue
            try:
                out.append(fn(bytes(p)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.StringType())


def xlsx_html_udf():
    """(payload binary) → rendered HTML string (null on parse failure)."""
    return _converter_udf(xlsx_to_html)


def document_html_udf():
    """(payload binary) → HTML via provider sniffing (xlsx or docx subset);
    null when no provider matches."""
    return _converter_udf(convert_document)


def scrape_documents(df: DataFrame, payload_col: str = "payload",
                     out_col: str = "doc_html") -> DataFrame:
    """Attach the document-converter HTML; rows route here when
    engine_choice_col says 'document' (S5)."""
    return df.withColumn(out_col, document_html_udf()(F.col(payload_col)))


def build_xlsx_rows_udf(sheet_name: str = "Sheet1"):
    """(cells array<array<string>>) → binary xlsx — deterministic generator
    as a column (synthetic corpora + oracle queries)."""

    def batch(rows: pd.Series) -> pd.Series:
        out = []
        for cells in rows:
            grid = [[c for c in list(row)] for row in list(cells)] \
                if cells is not None else []
            out.append(build_xlsx({sheet_name: grid}))
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.BinaryType())


def build_docx_notes_udf():
    """(name string) → binary docx: heading + a paragraph with a bold run
    and a footnote reference, plus word/footnotes.xml (incl. Word's
    separator pseudo-notes) — the deterministic generator behind the
    q_docx_notes oracle query."""
    from ..kernels.document import build_docx

    def batch(names: pd.Series) -> pd.Series:
        return pd.Series([
            build_docx(
                [("h1", str(n)),
                 ("p", [(str(n) + " exports ", ""), ("goods", "b"),
                        ("#fn", "1")])],
                footnotes={"1": ["Note for " + str(n)]},
            )
            for n in names
        ], dtype="object")

    return pandas_udf(batch, T.BinaryType())
