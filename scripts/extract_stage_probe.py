#!/usr/bin/env python
"""Isolate the crawl round's fetch+extract+write stage: pages corpus
(cached) INNER JOIN broadcast(selection) -> markdown+links UDFs -> parquet
write. Measures ONLY this stage, best-of-N in one JVM, to separate its
scaling from crawl-state noise and VM variance.

Usage: SPARK_GRAFT_CPUS=32 python scripts/extract_stage_probe.py [n_pages] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.crawl import (_crawl_links_udf,
                                               _markdown_udf)
    from webcrawl_spark.frontier.oracle import CrawlConfig
    from webcrawl_spark.session import get_spark

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 18_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark(
        "extract-stage-probe", master=f"local[{CPUS}]",
        extra_confs={"spark.sql.shuffle.partitions": str(max(8, CPUS))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    site = build_site(seed=17, n_hosts=1, pages_per_host=n_pages,
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
    pages.count()

    cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", limit=None,
                      max_depth=4, allow_backward_crawling=True)
    selected = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, seq long"
    ).localCheckpoint(eager=True)

    crawl_shape = os.environ.get("SPARK_GRAFT_PROBE_SHAPE") == "crawl"
    times = []
    for rep in range(reps):
        out_dir = tempfile.mkdtemp(prefix="extract_probe_")
        t0 = time.perf_counter()
        hits = (
            pages.select(F.col("url").alias("page_url"), "html")
            .join(F.broadcast(selected),
                  F.col("page_url") == selected["url"], "inner")
            .drop("page_url")
        )
        if crawl_shape:
            # the full in-crawl shape: 404-misses anti-join + union,
            # status column, depth-guarded links input
            misses = (
                selected.join(pages.select(F.col("url").alias("page_url")),
                              selected["url"] == F.col("page_url"),
                              "left_anti")
                .withColumn("html", F.lit(None).cast("binary"))
            )
            fetched = hits.unionByName(misses).withColumn(
                "status",
                F.when(F.col("html").isNotNull(), 200).otherwise(404))
            expandable = F.col("status") == 200
            combined = fetched.select(
                "url", "seq", "status",
                _markdown_udf()(F.col("html"),
                                F.col("url")).alias("markdown"),
                _crawl_links_udf(cfg)(
                    F.when(expandable, F.col("html")), F.col("url")
                ).alias("links"),
            )
        else:
            combined = hits.select(
                "url", "seq",
                _markdown_udf()(F.col("html"),
                                F.col("url")).alias("markdown"),
                _crawl_links_udf(cfg)(F.col("html"),
                                      F.col("url")).alias("links"),
            )
        combined.write.mode("overwrite").parquet(out_dir)
        times.append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({
        "cpus": CPUS, "pages": n_pages, "reps": times,
        "best_sec": min(times),
        "best_pages_per_sec": round(n_pages / min(times), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
