"""Sitemap ingestion (S6-S8) as an iterative DataFrame job.

Semantics from the reference:
- XML parse: urlset → url/loc list, sitemapindex → sitemap/loc list, DTD
  tolerated, malformed XML → error (packages/firecrawl-rs/src/crawler.rs:
  574-648).
- Instruction split: ``.xml``/``.xml.gz`` entries → recurse, non-file URLs →
  process, file-extension URLs dropped (crawler.rs:650-736).
- Recursion driver: start at <seed>/sitemap.xml, iterate until no recurse
  instructions remain, cap SITEMAP_LIMIT=25 distinct sitemaps per crawl
  (crawler.ts:11,356-456), dedupe batches on the normalized URL
  (crawler.ts:366-399), ``.gz`` bodies gunzipped (sitemap.ts:48-62).

The fetcher is a table lookup (url → xml bytes/str), mirroring the engine's
no-live-IO posture; each recursion level is one small DataFrame step over
the sitemap table, with the per-level parse in an Arrow UDF.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernels.classify import is_file_path
from ..kernels.urlkit import URLParseError, normalize_sitemap_url, parse_url

__all__ = ["parse_sitemap_xml", "process_sitemap", "sitemap_urls_df",
           "SITEMAP_LIMIT"]

SITEMAP_LIMIT = 25  # crawler.ts:11


def parse_sitemap_xml(xml_content: str) -> dict:
    """crawler.rs:574-628. Returns {'urlset': [...]} or {'sitemapindex':
    [...]}; raises ValueError on malformed XML or an unknown root."""
    try:
        root = ET.fromstring(xml_content)
    except ET.ParseError as e:
        raise ValueError(f"XML parsing error: {e}") from e
    tag = root.tag.split("}")[-1]  # strip namespace
    if tag == "sitemapindex":
        locs = []
        for sm in root:
            if sm.tag.split("}")[-1] != "sitemap":
                continue
            loc = next((c for c in sm if c.tag.split("}")[-1] == "loc"), None)
            if loc is not None and loc.text:
                locs.append(loc.text)
        return {"sitemapindex": locs}
    if tag == "urlset":
        locs = []
        for u in root:
            if u.tag.split("}")[-1] != "url":
                continue
            loc = next((c for c in u if c.tag.split("}")[-1] == "loc"), None)
            if loc is not None and loc.text:
                locs.append(loc.text)
        return {"urlset": locs}
    raise ValueError(
        "Invalid sitemap format: root element must be 'sitemapindex' or 'urlset'"
    )


def process_sitemap(xml_content: str) -> dict:
    """crawler.rs:650-721 — split into recurse/process instructions."""
    parsed = parse_sitemap_xml(xml_content)
    instructions: list[dict] = []
    total = 0
    if "sitemapindex" in parsed:
        urls = [u.strip() for u in parsed["sitemapindex"] if u.strip()]
        if urls:
            instructions.append({"action": "recurse", "urls": urls,
                                 "count": len(urls)})
            total += len(urls)
    else:
        xml_sitemaps, valid = [], []
        for raw in parsed["urlset"]:
            url = raw.strip()
            low = url.lower()
            if low.endswith(".xml") or low.endswith(".xml.gz"):
                xml_sitemaps.append(url)
            else:
                try:
                    p = parse_url(url)
                except URLParseError:
                    continue
                if not is_file_path(p.path.lower()):
                    valid.append(url)
        if xml_sitemaps:
            instructions.append({"action": "recurse", "urls": xml_sitemaps,
                                 "count": len(xml_sitemaps)})
            total += len(xml_sitemaps)
        if valid:
            instructions.append({"action": "process", "urls": valid,
                                 "count": len(valid)})
            total += len(valid)
    return {"instructions": instructions, "total_count": total}


_PARSE_SCHEMA = T.StructType([
    T.StructField("recurse", T.ArrayType(T.StringType())),
    T.StructField("process", T.ArrayType(T.StringType())),
    T.StructField("error", T.StringType()),
])


@pandas_udf(_PARSE_SCHEMA)
def _process_sitemap_udf(bodies: pd.Series) -> pd.DataFrame:
    rows = []
    for body in bodies:
        if body is None:
            rows.append(([], [], "missing"))
            continue
        try:
            if isinstance(body, (bytes, bytearray)):
                raw = bytes(body)
                if raw[:2] == b"\x1f\x8b":
                    raw = gzip.decompress(raw)
                body = raw.decode("utf-8", errors="replace")
            result = process_sitemap(body)
            recurse, process_urls = [], []
            for ins in result["instructions"]:
                if ins["action"] == "recurse":
                    recurse.extend(ins["urls"])
                else:
                    process_urls.extend(ins["urls"])
            rows.append((recurse, process_urls, None))
        except ValueError as e:
            rows.append(([], [], str(e)))
    return pd.DataFrame(rows, columns=["recurse", "process", "error"])


def sitemap_urls_df(
    spark: SparkSession,
    sitemap_table: DataFrame,  # (url string, body string|binary)
    seed_url: str,
    limit: int = SITEMAP_LIMIT,
) -> DataFrame:
    """Iterative recursion: returns (sitemap_url, page_url, batch) of page
    URLs discovered in handler-invocation order, deduped on the normalized
    URL (crawler.ts:366-399). ``batch`` preserves level order for the
    deterministic seeding contract."""
    start = seed_url if seed_url.lower().endswith((".xml", ".xml.gz")) else (
        seed_url.rstrip("/") + "/sitemap.xml"
    )
    todo = [start]
    hit: set[str] = set()
    seen_norm: set[str] = set()
    out_rows: list[tuple] = []
    batch = 0

    while todo and len(hit) < limit:
        level = [u for u in todo if u not in hit][: limit - len(hit)]
        todo = []
        if not level:
            break
        hit.update(level)
        level_df = spark.createDataFrame([(u,) for u in level], "sm_url string")
        parsed = (
            level_df.join(sitemap_table,
                          level_df["sm_url"] == sitemap_table["url"], "left")
            .select("sm_url", _process_sitemap_udf(F.col("body")).alias("p"))
            .select("sm_url", "p.recurse", "p.process")
            .collect()
        )
        # deterministic handler order: by level list order
        order = {u: i for i, u in enumerate(level)}
        for row in sorted(parsed, key=lambda r: order[r["sm_url"]]):
            for sub in row["recurse"] or []:
                if sub not in hit:
                    todo.append(sub)
            fresh = []
            for page_url in row["process"] or []:
                norm = normalize_sitemap_url(page_url)
                if norm not in seen_norm:
                    seen_norm.add(norm)
                    fresh.append(page_url)
            for page_url in fresh:
                out_rows.append((row["sm_url"], page_url, batch))
            if fresh:
                batch += 1

    return spark.createDataFrame(
        out_rows or [], "sitemap_url string, page_url string, batch int"
    )
