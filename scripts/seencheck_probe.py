#!/usr/bin/env python
"""Seen-check scale probe (r4 structural fix evidence).

Measures the bucket-local exact seen-check (Bloom cogroup + in-task
per-bucket frontier key read) against growing frontier sizes, with the old
shape — a sort-merge left join of maybe-seen candidates against the FULL
frontier key column — as the contrast. The claim under test: the new
seen-check's wall-clock stays near-flat as the frontier grows (the read is
partition-pruned and parallel per bucket; nothing shuffles), while the join
shape pays a growing full-column shuffle + sort every round.

Usage:  python scripts/seencheck_probe.py [frontier sizes ...]
Defaults: 100_000 500_000.  Env: SPARK_GRAFT_CPUS (default 8).
Prints one JSON line per frontier size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
from webcrawl_spark.frontier.oracle import CrawlConfig
from webcrawl_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_CAND = int(os.environ.get("SPARK_GRAFT_PROBE_CANDS", "20000"))
N_BUCKETS = 32
N_HOSTS = 64


def build_crawl(spark, workdir: str, n_keys: int) -> SparkCrawl:
    """Frontier of n_keys urls (bucket-partitioned) + covering bloom shards,
    committed as round 0 — the state a long-running crawl would resume."""
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
    frontier = spark.range(n_keys).select(
        F.concat(F.lit("https://host"), (F.col("id") % N_HOSTS),
                 F.lit(".test/p"), F.col("id")).alias("url"),
    ).select(
        "url", F.col("url").alias("url_canon"),
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.lit(0).alias("depth"), F.lit(0).alias("priority"),
        F.lit(0).alias("round_discovered"),
        F.monotonically_increasing_id().alias("seq"),
    ).withColumn(
        "host_bucket",
        F.pmod(F.xxhash64("host"), F.lit(N_BUCKETS)).cast("int"),
    ).repartition(N_BUCKETS, "host_bucket")
    crawl.io.append(frontier, "frontier", 0, partition_by=["host_bucket"])
    crawl.io.commit_round(0)
    crawl._write_shards(crawl.io.read_round("frontier", 0), None, 0,
                        n_rows=n_keys)
    crawl.io.commit_round(0)
    return crawl


def candidates(spark, n_keys: int):
    """N_CAND candidates, half already-seen (urls < n_keys), half new."""
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
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 500_000]
    spark = get_spark("seencheck-probe", master=f"local[{CPUS}]",
                      extra_confs={"spark.sql.shuffle.partitions": str(CPUS)})
    spark.sparkContext.setLogLevel("ERROR")
    for n_keys in sizes:
        workdir = tempfile.mkdtemp(prefix="seenprobe_")
        try:
            crawl = build_crawl(spark, workdir, n_keys)
            cand = candidates(spark, n_keys)
            shards = crawl._shards_df()

            def new_shape():
                n = crawl._bloom_probe(cand, shards, n_rows=N_CAND) \
                    .filter(F.col("is_seen")).count()
                assert n == N_CAND // 2, n

            def join_shape():
                keys = crawl._frontier_df().select(
                    F.col("url").alias("seen_key"))
                n = cand.join(
                    keys.withColumn("j", F.lit(True)),
                    cand["dedup_key"] == keys["seen_key"], "left",
                ).filter(F.coalesce(F.col("j"), F.lit(False))).count()
                assert n == N_CAND // 2, n

            print(json.dumps({
                "metric": "seencheck_probe", "frontier_keys": n_keys,
                "candidates": N_CAND, "cpus": CPUS,
                "bucket_local_sec": time_best2(new_shape),
                "full_join_sec": time_best2(join_shape),
            }), flush=True)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
