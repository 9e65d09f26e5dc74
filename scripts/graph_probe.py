#!/usr/bin/env python
"""Scale probe for the host-graph operators (hostrank.py): PageRank and
HITS wall time vs graph size, plus the anchor/trap aggregations.

The synthetic graph is generated DISTRIBUTED (no driver edge list): a
power-law-ish host degree profile from pure Column expressions, so the
probe exercises the operators' real shuffle shapes. Usage:

    python scripts/graph_probe.py [n_hosts ...]   # default 10k 100k

Run on an otherwise idle machine (shared-host noise: see BENCH.md
measurement protocol).
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from webcrawl_spark.operators.hostrank import (     # noqa: E402
    host_hits, host_pagerank, host_rank_levels,
)
from webcrawl_spark.session import get_spark        # noqa: E402


def synth_edges(spark, n_hosts: int, avg_deg: int = 10):
    """Deterministic host→host edge table, skewed toward low host ids
    (hot hosts), generated executor-side from a range()."""
    n_edges = n_hosts * avg_deg
    e = spark.range(n_edges).select(
        # src: uniform-ish; dst: quadratic skew toward host 0
        F.concat(F.lit("h"),
                 F.pmod(F.xxhash64("id"), n_hosts).cast("string"),
                 F.lit(".com")).alias("src"),
        F.concat(F.lit("h"),
                 (F.pmod(F.xxhash64("id", F.lit(1)), n_hosts)
                  * F.pmod(F.xxhash64("id", F.lit(2)), n_hosts)
                  / n_hosts).cast("long").cast("string"),
                 F.lit(".com")).alias("dst"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 5) + 1).cast("double")
        .alias("weight"),
    ).where(F.col("src") != F.col("dst"))
    return e


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_spark("graph-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    print("| hosts | edges | pagerank 10it | hits 10it | levels |")
    print("|---|---|---|---|---|")
    for n in sizes:
        edges = synth_edges(spark, n).persist()
        n_e = edges.count()
        t0 = time.perf_counter()
        pr = host_pagerank(edges, n_iter=10)
        pr.count()
        t_pr = time.perf_counter() - t0
        t0 = time.perf_counter()
        host_hits(edges, n_iter=10).count()
        t_hits = time.perf_counter() - t0
        t0 = time.perf_counter()
        host_rank_levels(pr, n_levels=8).count()
        t_lv = time.perf_counter() - t0
        print(f"| {n:,} | {n_e:,} | {t_pr:.1f} s | {t_hits:.1f} s "
              f"| {t_lv:.2f} s |", flush=True)
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
