"""Content-defined chunking (CDC) dedup: byte-level duplicate detection.

The primitive behind storage/transfer dedup of crawl archives (WARC
stores, page snapshots): split every payload at positions where a rolling
window's hash satisfies a divisor condition, hash the chunks, and measure
how many of a document's bytes live in chunks shared with other
documents. Because boundaries depend only on LOCAL content (the window
ending at the position), an insertion or deletion only re-chunks its own
neighborhood — unlike fixed-size blocks, where one shifted byte breaks
every later block. That shift-resilience is the whole point of CDC
(Muthitacharoen et al., LBFS, SOSP'01; FastCDC, ATC'16).

This implementation uses the pure position-independent form: a boundary
after position p iff md5(payload[p-W+1 .. p]) % divisor == 0 (no min/max
chunk clamps — those reintroduce sequential dependence between
boundaries; md5 rather than a gear/Rabin hash so an oracle in any engine
recomputes it verbatim). Production tuning would swap the window hash
for a gear hash and add FastCDC's normalized clamps — only
``_boundaries`` changes.

Scale shape: chunking is one Arrow-batched pass over the payload column
(payloads never shuffle); everything downstream moves only (id, 16-byte
chunk hash, length) rows — one shuffle on chunk hash for the duplicate
counts, one hash join back. Skew-safe: a boilerplate chunk shared by
millions of docs is a single aggregation row, never a pair explosion.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["cdc_chunks", "duplicate_bytes_fraction"]

CDC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("chunk_idx", T.IntegerType()),
    T.StructField("chunk_len", T.IntegerType()),
    T.StructField("chunk_md5", T.StringType()),
])


def _boundaries(data: bytes, window: int, divisor: int) -> list[int]:
    """Positions p (0-based, inclusive chunk ends) where the window ending
    at p hashes to 0 mod divisor. Position-independent by construction."""
    out = []
    for p in range(window - 1, len(data)):
        h = int(hashlib.md5(data[p - window + 1:p + 1]).hexdigest()[:8], 16)
        if h % divisor == 0:
            out.append(p)
    return out


def chunk_payload(data: bytes, window: int = 8,
                  divisor: int = 64) -> list[tuple[int, int, str]]:
    """(chunk_idx, chunk_len, chunk_md5) for one payload."""
    chunks = []
    start = 0
    bounds = _boundaries(data, window, divisor)
    for idx, p in enumerate(bounds):
        chunks.append((idx, p + 1 - start,
                       hashlib.md5(data[start:p + 1]).hexdigest()))
        start = p + 1
    if start < len(data) or not data:
        chunks.append((len(bounds), len(data) - start,
                       hashlib.md5(data[start:]).hexdigest()))
    return chunks


def cdc_chunks(df: DataFrame, payload_col: str = "payload",
               id_col: str = "doc_id", window: int = 8,
               divisor: int = 64, batch_rows: int = 64) -> DataFrame:
    """Explode every payload into its content-defined chunks — one
    Arrow-batched mapInPandas pass; the payload bytes never shuffle."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                for idx, ln, h in chunk_payload(raw, window, divisor):
                    rows.append((int(doc_id), idx, ln, h))
                if len(rows) >= batch_rows * 8:
                    yield pd.DataFrame(rows, columns=[
                        f.name for f in CDC_SCHEMA])
                    rows = []
            if rows:
                yield pd.DataFrame(rows, columns=[
                    f.name for f in CDC_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(run, CDC_SCHEMA)


def duplicate_bytes_fraction(chunks: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """Per-document byte-level dedup stats: how many of its bytes live in
    chunks that also appear in ANOTHER document. (id, n_chunks, n_bytes,
    dup_bytes, dup_frac_nano) — integers plus a 1e-9-grid ratio, so the
    result is engine-exact. One aggregation on chunk hash (distinct-doc
    counts), one broadcast-or-hash join back, one per-doc aggregation."""
    owners = chunks.groupBy("chunk_md5").agg(
        F.count_distinct(id_col).alias("n_docs"))
    return (
        chunks.join(owners, "chunk_md5")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum("chunk_len").cast("long").alias("n_bytes"),
            F.sum(F.when(F.col("n_docs") > 1, F.col("chunk_len"))
                  .otherwise(F.lit(0))).cast("long").alias("dup_bytes"),
        )
        .select(
            id_col, "n_chunks", "n_bytes", "dup_bytes",
            F.when(F.col("n_bytes") > 0,
                   F.round(F.col("dup_bytes") * F.lit(1e9)
                           / F.col("n_bytes"), 0))
            .otherwise(F.lit(0)).cast("long").alias("dup_frac_nano"),
        )
    )
