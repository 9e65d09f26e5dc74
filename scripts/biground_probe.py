#!/usr/bin/env python
"""Big-round crawl probe: one large host, no politeness cap, distributed
admission forced (small_round_threshold=1) — the 10^10-scale codepath at a
round size where per-phase costs are signal, not noise.

Usage: SPARK_GRAFT_CPUS=32 python scripts/biground_probe.py [pages_per_host]
       [small_round_threshold]
Prints one JSON line {cpus, pages, wall_sec, fetched, rounds, urls_per_sec}.
Phase timings stream to stderr when SPARK_GRAFT_TRACE=1.
small_round_threshold defaults to 1 (every round forced through the fully
distributed path — the pessimal 10^10-shape config); pass 5000 to measure
the engine's default config (startup transients under the candidate-count
gate use the driver small-round path; big rounds stay distributed).

Run at 8 and 32 cpus (fresh process each) for the N-vs-4N comparison of the
round job's fixed cost (BENCH.md big-round table).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
    from webcrawl_spark.frontier.oracle import CrawlConfig
    from webcrawl_spark.session import get_spark

    pages_per_host = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    spark = get_spark(
        "webcrawl-biground-probe", master=f"local[{CPUS}]",
        extra_confs={"spark.sql.shuffle.partitions": str(max(8, CPUS))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    site = build_site(seed=17, n_hosts=1, pages_per_host=pages_per_host,
                      n_hot_hosts=0, density=4)
    urls = site.urls()
    spec_bc = spark.sparkContext.broadcast(site)

    @F.udf("binary")
    def render(u):
        return render_page_html(spec_bc.value, u).encode()

    pages = (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .repartition(CPUS * 4)
        .withColumn("html", render(F.col("url")))
        .cache()
    )
    n_pages = pages.count()

    cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", limit=None,
                      max_depth=4, allow_backward_crawling=True)
    workdir = tempfile.mkdtemp(prefix="biground_")
    try:
        t0 = time.perf_counter()
        crawl = SparkCrawl(
            spark, pages, cfg, workdir,
            engine=EngineConfig(num_buckets=CPUS,
                                small_round_threshold=threshold),
        )
        rounds = crawl.run()
        wall = time.perf_counter() - t0
        fetched = crawl.fetch_log().count()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps({
        "cpus": CPUS, "pages": n_pages, "wall_sec": round(wall, 2),
        "fetched": fetched, "rounds": rounds,
        "urls_per_sec": round(fetched / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
