"""Anchor-text index: the (target_url, anchor_text) corpus of the web
graph.

Beyond-§2 training-data operator: anchor text is the classic external
description of a page (used for retrieval training corpora and query-doc
relevance sets; the public precedent is the anchor-text datasets derived
from Common Crawl link graphs). The kernel twin is
kernels/htmlkit.py:extract_anchors, which shares extract_links'
resolution path (extractLinks.ts:48-65 semantics) so the index is
consistent with the crawl's own link extraction.

Scale shape (100 TB of pages):
- ``anchor_pairs`` is one mapInPandas-free explode: the Arrow UDF emits
  (href, text) structs per page, then html is DROPPED before any shuffle
  — only (src_host, target, anchor) strings move.
- ``anchor_text_index`` aggregates on (target, anchor): one shuffle,
  hash-agg map-side combined. ``n_hosts`` (distinct endorsing source
  hosts) is the spam-resistance signal — exact count-distinct over the
  same shuffle key adds one expand, no extra scan. Anchor text is capped
  (``max_len``) so a malformed page can't fatten shuffle rows.
- ``top_anchor_per_target`` is a max_by over the index — no window, no
  second shuffle of the raw pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import anchors_udf, url_host

__all__ = ["anchor_pairs", "anchor_text_index", "top_anchor_per_target"]


def anchor_pairs(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html", max_len: int = 256,
                 drop_intra_host: bool = True) -> DataFrame:
    """(url, html) pages → (src_host, target, anchor) — one row per <a>
    occurrence. Intra-host anchors default to dropped: navigation boiler
    ("Home", "next") dominates them and carries no external description.
    """
    pairs = pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(anchors_udf(F.col(html_col), F.col(url_col)))
        .alias("a"),
    ).select(
        "src_host",
        F.col("a.href").alias("target"),
        F.substring(F.col("a.text"), 1, max_len).alias("anchor"),
    )
    if drop_intra_host:
        pairs = pairs.where(url_host(F.col("target")) != F.col("src_host"))
    return pairs.where((F.col("src_host") != "") & (F.col("target") != ""))


def anchor_text_index(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html", max_len: int = 256,
                      drop_intra_host: bool = True,
                      min_count: int = 1) -> DataFrame:
    """(target, anchor, n, n_hosts): the aggregated anchor-text corpus.

    n = occurrences, n_hosts = distinct endorsing source hosts (an anchor
    repeated by one template site counts once here)."""
    idx = (
        anchor_pairs(pages, url_col, html_col, max_len, drop_intra_host)
        .groupBy("target", "anchor")
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("src_host").alias("n_hosts"))
    )
    if min_count > 1:
        idx = idx.where(F.col("n") >= min_count)
    return idx


def top_anchor_per_target(index: DataFrame) -> DataFrame:
    """(target, anchor, n): each target's most-endorsed anchor text —
    max_by on (n_hosts, n, anchor) so ties break deterministically.
    One hash aggregation over the already-aggregated index; no window
    funnels the raw pair stream through a single task."""
    key = F.struct(F.col("n_hosts"), F.col("n"), F.col("anchor"))
    return (index.groupBy("target")
            .agg(F.max_by(F.struct("anchor", "n", "n_hosts"), key)
                 .alias("top"))
            .select("target", F.col("top.anchor").alias("anchor"),
                    F.col("top.n").alias("n"),
                    F.col("top.n_hosts").alias("n_hosts")))
