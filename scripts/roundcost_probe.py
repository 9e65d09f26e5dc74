#!/usr/bin/env python
"""Round fixed-cost flatness probe: run a many-round crawl and report
per-round wall time, with the queued-set compaction on (merge-on-read
snapshot every 8 rounds) vs off (full-history anti-join every round).

The off-mode's queued view re-reads every previous frontier+crawl_result
round each round (plan depth and file listing grow with crawl age); the
on-mode reads the snapshot + ≤8 recent rounds. Usage:

  SPARK_GRAFT_CPUS=8 python scripts/roundcost_probe.py [rounds] [compact]

Prints one JSON line {mode, rounds, per_round_sec: [...], head_avg,
tail_avg} — head/tail = mean of rounds 3-7 vs last 5.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def main() -> None:
    import shutil
    import tempfile

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
    from webcrawl_spark.frontier.oracle import CrawlConfig
    from webcrawl_spark.session import get_spark

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    compact = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark(
        "webcrawl-roundcost-probe", master=f"local[{CPUS}]",
        extra_confs={"spark.sql.shuffle.partitions": str(max(8, CPUS))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    site = build_site(seed=23, n_hosts=6, pages_per_host=600, n_hot_hosts=0)
    rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
    pages = spark.createDataFrame(rows, "url string, html binary") \
        .repartition(CPUS).cache()
    pages.count()

    cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", limit=None,
                      max_depth=4, allow_backward_crawling=True,
                      allow_external_content_links=True, host_budget=8)
    workdir = tempfile.mkdtemp(prefix="roundcost_")
    per_round: list[float] = []
    try:
        crawl = SparkCrawl(
            spark, pages, cfg, workdir,
            engine=EngineConfig(num_buckets=CPUS,
                                compact_queued_every=compact),
        )
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            ran = crawl.run(max_rounds=1)
            per_round.append(round(time.perf_counter() - t0, 3))
            if not ran:
                break
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        pages.unpersist()
    head = per_round[2:7]
    tail = per_round[-5:]
    print(json.dumps({
        "mode": f"compact={compact}", "cpus": CPUS,
        "rounds": len(per_round),
        "per_round_sec": per_round,
        "head_avg": round(sum(head) / max(1, len(head)), 3),
        "tail_avg": round(sum(tail) / max(1, len(tail)), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
