#!/usr/bin/env python
"""spark-submit entry point for the crawl frontier (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Package and submit:

    cd /root/repo && zip -qr /tmp/webcrawl_spark.zip webcrawl_spark
    spark-submit --py-files /tmp/webcrawl_spark.zip \\
        scripts/run_crawl.py \\
        --pages /data/pages_parquet | --warc '/data/cc/*.warc.gz' \\
        --workdir /data/crawl_state \\
        --seed-url https://host0.example.com/ --host-budget 64 \\
        [--limit N] [--max-depth D] [--budget-capacity C] [--priority] \\
        [--dedup-key url_canon] [--resume]

The job is exactly resumable: re-running with the same --workdir continues
from the last committed round. With --synthetic N it generates the
deterministic synthetic site instead of reading --pages (for smoke runs).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet path with (url string, html binary)")
    ap.add_argument("--warc", help="WARC file glob (Common Crawl snapshot) used as the fetch corpus")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a synthetic site with N pages/host instead")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seed-url", required=True)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--host-budget", type=int, default=None)
    ap.add_argument("--budget-capacity", type=int, default=None)
    ap.add_argument("--priority", action="store_true")
    ap.add_argument("--hostrank-levels", type=int, default=0, metavar="N",
                    help="with --priority: compute host-rank (weighted "
                         "PageRank over the corpus link graph, quantized "
                         "to N levels) and schedule by priority = depth + "
                         "level via the broadcast levels table")
    ap.add_argument("--enforce-robots", action="store_true")
    ap.add_argument("--dedup-key", default="url", choices=["url", "url_canon"])
    ap.add_argument("--seen-filter", default="bloom", choices=["bloom", "cuckoo"])
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument("--max-rounds", type=int, default=None)
    ap.add_argument("--compact-keys-every", type=int, default=16,
                    help="consolidate seen-check key files every K rounds "
                         "(0 disables)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
    from webcrawl_spark.frontier.oracle import CrawlConfig

    spark = SparkSession.builder.appName("webcrawl-spark-crawl").getOrCreate()

    if args.synthetic:
        from webcrawl_spark.datagen import build_site, render_page_html

        site = build_site(seed=42, n_hosts=8, pages_per_host=args.synthetic)
        rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
        pages = spark.createDataFrame(rows, "url string, html binary")
    elif args.pages:
        pages = spark.read.parquet(args.pages).select("url", "html")
    elif args.warc:
        from webcrawl_spark.sources.warc import warc_pages

        pages = warc_pages(spark, args.warc)
    else:
        ap.error("one of --pages / --warc / --synthetic is required")

    cfg = CrawlConfig(
        seed_url=args.seed_url,
        limit=args.limit,
        max_depth=args.max_depth,
        allow_backward_crawling=True,
        host_budget=args.host_budget,
        budget_capacity=args.budget_capacity,
        priority_mode=args.priority,
        enforce_robots=args.enforce_robots,
    )
    engine = EngineConfig(num_buckets=args.num_buckets,
                          dedup_key=args.dedup_key,
                          seen_filter=args.seen_filter,
                          compact_keys_every=args.compact_keys_every)
    levels = None
    if args.hostrank_levels:
        if not args.priority:
            ap.error("--hostrank-levels requires --priority")
        from webcrawl_spark.operators.hostrank import (
            host_link_edges, host_pagerank, host_rank_levels,
        )

        levels = host_rank_levels(
            host_pagerank(host_link_edges(pages)),
            n_levels=args.hostrank_levels,
        ).localCheckpoint(eager=True)
    crawl = SparkCrawl(spark, pages, cfg, args.workdir, engine=engine,
                       host_rank_table=levels)
    rounds = crawl.run(max_rounds=args.max_rounds)
    fetched = crawl.fetch_log().count()
    print(json.dumps({
        "rounds_executed": rounds,
        "total_fetched": fetched,
        "committed_round": crawl.io.committed_round(),
        "done": crawl.io.checkpoint_meta().get("done", False),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
