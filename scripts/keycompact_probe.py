#!/usr/bin/env python
"""Seen-key compaction scale probe.

The bucket-local exact seen-check reads one frontier key file per bucket
per ROUND — correct, but a crawl that has run R rounds pays R file opens
per bucket per check (listing + parquet footers dominate long before data
does). ``frontier_keys`` snapshots (EngineConfig.compact_keys_every)
consolidate the key column to one file per bucket; the check then reads
snapshot + post-snapshot deltas.

This probe materializes the SAME frontier key set twice — spread over R
round directories vs consolidated into a snapshot — and times the exact
seen-check over both layouts (worker key cache disabled, so every probe
pays the cold read the first task on any executor pays). Claim under
test: the per-round layout degrades with R at constant key count; the
snapshot layout does not.

Usage:  python scripts/keycompact_probe.py [rounds ...]
Defaults: 32 128 512 rounds at 1M keys. Env: SPARK_GRAFT_CPUS (8),
SPARK_GRAFT_PROBE_KEYS (1_000_000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# disable the per-worker incremental key cache BEFORE the JVM (and its
# python workers) exist — cache hits would hide the file-count cost this
# probe exists to measure
os.environ["SPARK_GRAFT_SEEN_CACHE_ROWS"] = "0"

from pyspark.sql import functions as F

from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
from webcrawl_spark.frontier.oracle import CrawlConfig
from webcrawl_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_KEYS = int(os.environ.get("SPARK_GRAFT_PROBE_KEYS", "1_000_000"))
N_CAND = 20_000
N_BUCKETS = 32
N_HOSTS = 64


def build_crawl(spark, workdir: str, n_keys: int, rounds: int) -> SparkCrawl:
    """The same n_keys frontier, written as `rounds` per-round appends —
    the state of a crawl that has aged `rounds` rounds."""
    crawl = SparkCrawl(
        spark,
        spark.createDataFrame([("https://seed/", b"")],
                              "url string, html binary"),
        CrawlConfig(seed_url="https://seed/"),
        workdir,
        engine=EngineConfig(num_buckets=N_BUCKETS,
                            bloom_keys_per_shard=max(1000,
                                                     n_keys // N_BUCKETS)),
    )
    per_round = n_keys // rounds
    frontier = spark.range(n_keys).select(
        F.concat(F.lit("https://host"), (F.col("id") % N_HOSTS),
                 F.lit(".test/p"), F.col("id")).alias("url"),
        (F.col("id") / per_round).cast("int").alias("rnd"),
    ).select(
        "url", "rnd", F.col("url").alias("url_canon"),
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.lit(0).alias("depth"), F.lit(0).alias("priority"),
        F.lit(0).alias("round_discovered"),
        F.monotonically_increasing_id().alias("seq"),
    ).withColumn(
        "host_bucket",
        F.pmod(F.xxhash64("host"), F.lit(N_BUCKETS)).cast("int"),
    ).localCheckpoint(eager=True)
    for r in range(rounds):
        crawl.io.append(
            frontier.filter(F.col("rnd") == r).drop("rnd")
            .repartition(N_BUCKETS, "host_bucket"),
            "frontier", r, partition_by=["host_bucket"])
    crawl.io.commit_round(rounds - 1)
    crawl._write_shards(crawl._frontier_df(), None, rounds - 1,
                        n_rows=n_keys)
    crawl.io.commit_round(rounds - 1)
    return crawl


def candidates(spark):
    half = N_CAND // 2
    cand = spark.range(N_CAND).select(
        F.when(F.col("id") < half,
               F.concat(F.lit("https://host"), (F.col("id") % N_HOSTS),
                        F.lit(".test/p"), F.col("id")))
        .otherwise(
            F.concat(F.lit("https://host"), (F.col("id") % N_HOSTS),
                     F.lit(".test/new"), F.col("id"))).alias("link"),
        F.lit(0).alias("source_priority"), F.col("id").alias("source_seq"),
        F.lit(0).alias("link_pos"),
    ).select(
        "source_priority", "source_seq", "link_pos", "link",
        F.col("link").alias("url_canon"), F.col("link").alias("dedup_key"),
        F.xxhash64(F.col("link")).alias("dedup_hash"),
        F.pmod(F.xxhash64(F.regexp_extract("link", r"https://([^/]+)/", 1)),
               F.lit(N_BUCKETS)).cast("int").alias("cand_bucket"),
    )
    return cand.localCheckpoint(eager=True)


def time_best2(fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    rounds_list = [int(s) for s in sys.argv[1:]] or [32, 128, 512]
    spark = get_spark("keycompact-probe", master=f"local[{CPUS}]",
                      extra_confs={"spark.sql.shuffle.partitions": str(CPUS)})
    spark.sparkContext.setLogLevel("ERROR")
    for rounds in rounds_list:
        workdir = tempfile.mkdtemp(prefix="keycompact_")
        try:
            crawl = build_crawl(spark, workdir, N_KEYS, rounds)
            cand = candidates(spark)
            shards = crawl._shards_df()

            def check():
                n = crawl._bloom_probe(cand, shards, n_rows=N_CAND) \
                    .filter(F.col("is_seen")).count()
                assert n == N_CAND // 2, n

            per_round_sec = time_best2(check)

            # consolidate: the snapshot _maybe_compact_keys would write
            crawl.engine.compact_keys_every = 1
            crawl._maybe_compact_keys(rounds - 1)
            crawl.io.commit_round(rounds - 1)
            snapshot_sec = time_best2(check)

            print(json.dumps({
                "metric": "keycompact_probe", "frontier_keys": N_KEYS,
                "rounds": rounds, "candidates": N_CAND, "cpus": CPUS,
                "per_round_layout_sec": per_round_sec,
                "snapshot_layout_sec": snapshot_sec,
            }), flush=True)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
