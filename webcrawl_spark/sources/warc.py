"""WARC source: read Common-Crawl-style WARC files into the pages table.

The engine's input table is (url, warc_ts, html, ...) — exactly what
Common Crawl ships as WARC (ISO 28500). This source turns raw WARC files
(plain or per-record-gzipped, the Common Crawl layout) into that table:

    pages = read_warc(spark, "s3a://commoncrawl/.../*.warc.gz")

Scale shape: `spark.read.format("binaryFile")` distributes one task per
WARC file (Common Crawl files are ~1 GB — a natural partition), the
record parser runs inside mapInPandas (Arrow batches, no driver
involvement), and downstream pruning/filters apply per batch. WARC files
aren't splittable mid-record (gzip members), so file-level parallelism is
the correct unit — the same decision Hadoop/EMR WARC readers make.

Parsing implements the public WARC/1.0-1.1 record grammar: header block
terminated by CRLF CRLF, Content-Length-delimited payload, two CRLFs
between records; `response` record payloads are HTTP messages whose
status/headers/body are split off. Record-compressed .gz members are
handled by restarting zlib at each member boundary (the Common Crawl
convention that makes per-record random access possible).
"""

from __future__ import annotations

import io
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["parse_warc_bytes", "read_warc", "warc_pages", "wet_text",
           "build_warc_bytes"]

_CRLF2 = b"\r\n\r\n"

WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("warc_file", T.StringType()),
])


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl's per-record
    compression) into one byte stream. gzip.decompress handles member
    concatenation natively in linear time — a manual per-member
    decompressobj loop would copy the remaining buffer once per member,
    O(members x size) on a real Common Crawl file."""
    import gzip

    return gzip.decompress(data)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:      # [0] = version / status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    return headers


def _parse_warc_date(s: str):
    try:
        return datetime.strptime(
            s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes (plain or gzipped members) into record
    dicts: warc_type, url, warc_ts, http_status, content_type, payload.
    Non-HTTP payloads (warcinfo, metadata, ...) pass through with the raw
    payload and null status."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records, pos = [], 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            break
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # malformed record: stop rather than misalign
        body_start = head_end + len(_CRLF2)
        payload = data[body_start:body_start + length]
        pos = body_start + length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "http_status": None,
            "content_type": headers.get("content-type"),
            "payload": payload,
        }
        ctype = (rec["content_type"] or "").lower()
        if ctype.startswith("application/http"):
            http_end = payload.find(_CRLF2)
            if http_end >= 0:
                http_headers = _parse_headers(payload[:http_end])
                status_line = payload.split(b"\r\n", 1)[0].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    rec["http_status"] = int(status_line[1])
                rec["content_type"] = http_headers.get("content-type",
                                                       rec["content_type"])
                rec["payload"] = payload[http_end + len(_CRLF2):]
        records.append(rec)
    return records


def read_warc(spark: SparkSession, path: str,
              response_only: bool = True) -> DataFrame:
    """WARC files → pages DataFrame (url, warc_ts, warc_type, http_status,
    content_type, html, warc_file). One task per file (binaryFile source);
    parsing is Arrow-batched in mapInPandas."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one yielded frame per FILE, not per Arrow batch: a 1 GB WARC
        # decompresses to several GB — holding a whole batch's worth of
        # parsed payloads alongside the raw bytes would multiply the
        # task's peak memory
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = [
                    (r["url"], r["warc_ts"], r["warc_type"],
                     r["http_status"], r["content_type"],
                     r["payload"], fpath)
                    for r in parse_warc_bytes(bytes(content))
                    if not (response_only and r["warc_type"] != "response")
                ]
                yield pd.DataFrame(
                    rows, columns=[f.name for f in WARC_SCHEMA])

    return raw.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → crawl-ready (url, html) corpus: successful captures
    only, one per URL (latest warc_ts wins). A snapshot glob routinely
    holds redirect/404 captures and re-crawls of the same URL — fed raw
    into corpus replay those would extract error pages as content and
    emit duplicate fetches sharing one seq."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(), "warc_file")
    return (
        read_warc(spark, path)
        .filter(F.col("http_status") == 200)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url", "html")
    )


def wet_text(spark: SparkSession, path: str) -> DataFrame:
    """Common Crawl WET files → (url, warc_ts, text): the ``conversion``
    records carry pre-extracted plain text (UTF-8), the direct feed for
    the documents-table operators (dedup, quality, language ID) when the
    pipeline starts from CC's own extraction instead of raw HTML."""
    from pyspark.sql import functions as F

    return (
        read_warc(spark, path, response_only=False)
        .filter(F.col("warc_type") == "conversion")
        .select("url", "warc_ts",
                F.decode(F.col("html"), "UTF-8").alias("text"))
    )


def build_warc_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records into WARC/1.0 bytes (test/datagen helper — the
    inverse of parse_warc_bytes). Each record dict: url, warc_ts
    (datetime), html (bytes), http_status (int), content_type (str)."""
    import gzip as _gzip

    out = io.BytesIO()
    for r in records:
        body = (
            b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n\r\n" % (
                r.get("http_status", 200),
                r.get("content_type", "text/html").encode())
        ) + r["html"]
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " +
            r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"\r\n"
        )
        rec = head + body + b"\r\n\r\n"
        out.write(_gzip.compress(rec) if gzip_members else rec)
    return out.getvalue()
