"""FetchCache — the HTTP validator cache for live-fetch mode (J5's live
twin: the reference's fetch engine sends If-None-Match/If-Modified-Since
from its response cache, engines/fetch/index.ts:12-20).

A parquet directory of (url, etag, last_modified, html, gen) rows shared
ACROSS crawls (pass the same cache dir to a recrawl and validated URLs are
served from cache instead of refetched). Append-only with a generation
column; the snapshot view is latest-gen-per-url — on Iceberg this table is
a MERGE-on-url upsert and the window disappears. Staleness is safe by
construction: a cache row is only ever SERVED when the conditional fetch
returned not-modified, i.e. the origin itself validated the cached body.

Scale notes: the snapshot's latest-per-url window shuffles O(cache) — at
cluster scale keep the cache bucketed by url hash (co-partitioned with the
selection probe) or bind it to an Iceberg MERGE table; the round path only
ever probes it with a broadcast of the (politeness-bounded) selection, so
the cache itself never enters a round shuffle.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["FetchCache", "COND_FETCH_SCHEMA"]

# contract for the conditional fetch UDF:
#   (url, etag, last_modified) → struct(html, etag, last_modified,
#                                       not_modified)
# not_modified=True ⇒ origin returned 304: html may be null, the engine
# serves the cached body. Validators are null on cache misses.
COND_FETCH_SCHEMA = ("html binary, etag string, last_modified string, "
                     "not_modified boolean")


class FetchCache:
    SCHEMA = ("url string, etag string, last_modified string, "
              "html binary, gen long")

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _has_data(self) -> bool:
        return any(f.endswith(".parquet")
                   for _, _, files in os.walk(self.root) for f in files)

    def snapshot(self) -> DataFrame | None:
        """Latest validated entry per url over the WHOLE cache (None when
        empty). Full-cache window — use for inspection/tests; the round
        path uses ``probe`` so the per-round cost never scales with cache
        size."""
        if not self._has_data():
            return None
        df = self.spark.read.schema(self.SCHEMA).parquet(self.root)
        w = Window.partitionBy("url").orderBy(F.desc("gen"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "gen")
        )

    def probe(self, urls: DataFrame) -> DataFrame | None:
        """Latest validated entry per url, restricted to ``urls`` (a
        1-column `url` DataFrame, e.g. the round's politeness-bounded
        selection): the cache STREAMS against the broadcast url set —
        no full-cache shuffle — and the latest-per-url window runs over
        the ≤|urls|×gens hit rows only. This is the round-path read; on
        Iceberg the cache is a MERGE-on-url table and this becomes a
        plain filtered scan."""
        if not self._has_data():
            return None
        df = self.spark.read.schema(self.SCHEMA).parquet(self.root)
        hits = df.join(F.broadcast(urls.select("url")), "url", "inner")
        w = Window.partitionBy("url").orderBy(F.desc("gen"))
        return (
            hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "gen")
        )

    def record(self, df: DataFrame) -> None:
        """Append fresh responses (url, etag, last_modified, html). Rows
        without any validator are skipped — an origin that sends no
        ETag/Last-Modified cannot be conditionally revalidated."""
        gen = int(time.time() * 1000)
        out = (
            df.filter(F.col("etag").isNotNull()
                      | F.col("last_modified").isNotNull())
            .select("url", "etag", "last_modified", "html",
                    F.lit(gen).alias("gen"))
        )
        out.write.mode("append").parquet(self.root)
