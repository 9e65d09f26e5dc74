#!/usr/bin/env python
"""End-to-end pipeline probe: the README quick start, measured.

Multi-file WARC glob (Common-Crawl layout: per-record-gzipped members,
one ~N/16-page file per task) → politeness-budgeted frontier crawl with
full extraction → corpus operators (exact dedup, CCNet line dedup,
MinHash-LSH, Gopher rules, decontamination, language sampling, PII
redaction) → training chunks written to parquet. Per-stage wall times
print as one JSON line; results land in BENCH.md's curated pipeline
section.

Usage: SPARK_GRAFT_CPUS=32 python scripts/pipeline_probe.py [n_pages]
(default 100_000 — the corpus-ops scale-probe size from round 4).

WARC generation is setup, not a measured stage (a real deployment reads
existing snapshot files); its wall time is reported separately as
`gen_sec`.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_WARC_FILES = 16


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
    from webcrawl_spark.frontier.oracle import CrawlConfig
    from webcrawl_spark.operators.corpus import (
        chunk_documents, decontaminate, stratified_sample,
    )
    from webcrawl_spark.operators.dedup import (
        exact_dedup, minhash_lsh_dedup, remove_boilerplate_lines,
    )
    from webcrawl_spark.operators.textstats import (
        gopher_quality_flags, language_guess, redact_pii,
    )
    from webcrawl_spark.session import get_spark
    from webcrawl_spark.sources.warc import warc_pages

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    # one host: the synthetic site's cross-host links are sparse (leaf
    # pages link other hosts with p~0.3), so a single-seed crawl covers
    # only the seed host; politeness still binds via host_budget below.
    n_hosts = 1
    per_host = n_pages // n_hosts

    spark = get_spark(
        "webcrawl-pipeline-probe", master=f"local[{CPUS}]",
        extra_confs={"spark.sql.shuffle.partitions": str(max(8, CPUS))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    workroot = tempfile.mkdtemp(prefix="pipeline_probe_")
    warc_dir = os.path.join(workroot, "warc")
    os.makedirs(warc_dir)

    # ---- setup (untimed as a pipeline stage): synthetic site → WARC files
    t_gen = time.perf_counter()
    site = build_site(seed=23, n_hosts=n_hosts, pages_per_host=per_host,
                      n_hot_hosts=0, density=4)
    urls = site.urls()
    spec_bc = spark.sparkContext.broadcast(site)

    def write_warc_partition(it):
        import datetime as dt
        import uuid

        from webcrawl_spark.sources.warc import build_warc_bytes

        recs = []
        for row in it:
            recs.append({
                "url": row.url,
                "warc_ts": dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
                "http_status": 200, "content_type": "text/html",
                "html": render_page_html(spec_bc.value, row.url).encode(),
            })
        if recs:
            path = os.path.join(warc_dir, f"{uuid.uuid4().hex}.warc.gz")
            with open(path, "wb") as f:
                f.write(build_warc_bytes(recs, gzip_members=True))

    (spark.createDataFrame([(u,) for u in urls], "url string")
     .repartition(N_WARC_FILES)
     .foreachPartition(write_warc_partition))
    gen_sec = time.perf_counter() - t_gen

    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        return out

    # ---- 1. WARC read (streamed paths, one file per task)
    pages = timed("warc_read", lambda: warc_pages(
        spark, os.path.join(warc_dir, "*.warc.gz"))
        .localCheckpoint(eager=True))
    rows["warc_read"] = pages.count()

    # ---- 2. politeness-budgeted crawl with full extraction
    cfg = CrawlConfig(
        seed_url=f"https://{site.hosts[0]}/", limit=None, max_depth=4,
        allow_backward_crawling=True, allow_external_content_links=True,
        host_budget=per_host // 6,
    )
    crawl_workdir = os.path.join(workroot, "crawl")
    crawl = SparkCrawl(
        spark, pages, cfg, crawl_workdir,
        engine=EngineConfig(num_buckets=CPUS),
    )
    n_rounds = timed("crawl", crawl.run)
    docs = crawl.results().select(
        F.col("url").alias("doc_id"), F.col("markdown").alias("text"))
    rows["crawl"] = docs.count()

    # ---- 3..8 corpus operators (each pinned so the timing is its own)
    docs = timed("exact_dedup", lambda: exact_dedup(docs, id_col="doc_id")
                 .localCheckpoint(eager=True))
    rows["exact_dedup"] = docs.count()

    docs = timed("line_dedup", lambda: remove_boilerplate_lines(
        docs, min_docs=16).localCheckpoint(eager=True))
    rows["line_dedup"] = docs.count()

    # threshold 0.85: the synthetic vocabulary is small, so UNRELATED
    # pages share enough 5-shingles to sit near est-Jaccard 0.7 — the
    # default 0.7 threshold would collapse the corpus wholesale and
    # starve the downstream stage timings.
    docs = timed("minhash_dedup", lambda: minhash_lsh_dedup(
        docs, id_col="doc_id", threshold=0.85).localCheckpoint(eager=True))
    rows["minhash_dedup"] = docs.count()

    # all Gopher rules except ok_stopwords: the synthetic vocabulary
    # contains no English stopwords, so that one rule rejects every page
    # by construction (the full gopher_pass is oracle-gated on the real
    # documents table in q_gopher_quality).
    gq = gopher_quality_flags(F.col("text"))
    keep = (gq["ok_word_count"] & gq["ok_mean_word_len"]
            & gq["ok_symbol_ratio"] & gq["ok_bullet_lines"]
            & gq["ok_ellipsis_lines"] & gq["ok_alpha_words"])
    docs = timed("gopher", lambda: docs.filter(keep)
                 .localCheckpoint(eager=True))
    rows["gopher"] = docs.count()

    bench_df = docs.limit(100).select(F.col("text"))
    docs = timed("decontaminate", lambda: decontaminate(
        docs, bench_df, n=13).localCheckpoint(eager=True))
    rows["decontaminate"] = docs.count()

    docs = timed("lang_sample", lambda: stratified_sample(
        docs.withColumn("lang", language_guess(F.col("text"))),
        {"en": 1.0, "de": 0.5, "und": 0.5}, strata_col="lang")
        .localCheckpoint(eager=True))
    rows["lang_sample"] = docs.count()

    out_dir = os.path.join(workroot, "chunks")
    chunks = chunk_documents(
        docs.withColumn("text", redact_pii(F.col("text"))))
    timed("redact_chunk_write",
          lambda: chunks.write.mode("overwrite").parquet(out_dir))
    rows["chunks"] = spark.read.parquet(out_dir).count()

    total = round(sum(stages.values()), 2)
    print(json.dumps({
        "cpus": CPUS, "n_pages": n_pages, "gen_sec": round(gen_sec, 2),
        "crawl_rounds": n_rounds, "stages_sec": stages, "rows": rows,
        "pipeline_sec": total,
        "pages_per_sec_end_to_end": round(rows["warc_read"] / total, 1),
    }))
    shutil.rmtree(workroot, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
