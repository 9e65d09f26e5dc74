#!/usr/bin/env python
"""Benchmark harness. Runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a crawl-
engine throughput round (synthetic site, politeness-budgeted frontier with
full extraction), and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, ...extras}

Scaling evidence (north rule: N vs 4N cores) is produced by running this
script twice with SPARK_GRAFT_CPUS=8 and =32 — see scripts/scaling_bench.py
and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_PAGES_PER_HOST = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "60"))

HEADLINE = [
    "q_round_metrics",      # TPC-H Q1 shape: scan-heavy agg
    "q_brand_revenue",      # broadcast dim join
    "q_segment_top_orders", # 3-way join + topk
    "q_perhost_topk",       # politeness window
    "q_frontier_antijoin",  # seen-set anti-join
    "q_hourly_events",      # windowed agg
    "q_token_stats",        # text ops
    "q_minhash_dedup",      # LSH dedup (Arrow UDF path)
    "q_cosine_topk",        # similarity
]


def _sf_from_dir(path: str) -> float:
    name = os.path.basename(path.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_queries(spark) -> dict[str, float]:
    """Interleaved best-of-2 (measurement protocol v2, BENCH.md): the full
    headline set runs twice, per-query time = min of the two passes — the
    same protocol as the probes, shedding the shared-host wall-clock noise
    the r3 verdict flagged (±60% swings documented in BENCH.md)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.count()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    return times


def bench_ann_recall(spark) -> dict:
    """Recall@k of the ANN scale configs vs the exact brute-force top-k
    (the r3 verdict's ask: a quantitative quality number for the
    approximate path alongside its exact-config oracle), plus the fraction
    of the table each config actually scans (the selectivity that makes it
    the 100-TB path)."""
    from pyspark.sql import functions as F

    from webcrawl_spark.operators.similarity import (
        ann_topk, cosine_topk, rp_lsh_buckets,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_total = emb.count()
    # query = a real row's embedding (the ANN workload: neighbors of a
    # document) — an arbitrary off-manifold vector has no neighbors for
    # LSH locality to find on these embeddings
    query = list(emb.orderBy("vec_id").select("embedding")
                 .first()["embedding"])
    dim = len(query)
    k = 10
    exact = {r["vec_id"] for r in cosine_topk(emb, query, k=k).collect()}
    out: dict[str, dict] = {"recall_at_10": {}, "scan_frac": {}}
    for n_bits, flips in [(8, 1), (8, 2), (12, 1), (12, 2)]:
        tag = f"nbits{n_bits}_probe{flips}"
        b = rp_lsh_buckets(emb, dim, n_bits=n_bits, seed=7)
        got = {r["vec_id"] for r in
               ann_topk(b, query, k=k, dim=dim, n_bits=n_bits, seed=7,
                        probe_flips=flips).collect()}
        import numpy as np

        from webcrawl_spark.operators.similarity import (
            _hyperplanes, _query_buckets,
        )
        targets = _query_buckets(np.asarray(query), _hyperplanes(dim, n_bits, 7),
                                 n_bits, flips)
        n_cand = b.filter(F.col("bucket").isin(targets)).count()
        out["recall_at_10"][tag] = round(len(got & exact) / k, 3)
        out["scan_frac"][tag] = round(n_cand / max(1, n_total), 4)
    # IVF quality path: trained k-means coarse quantizer at two nprobe
    # operating points (same recall-vs-scan trade reported for LSH).
    import numpy as np

    from webcrawl_spark.operators.similarity import (
        ivf_assign, ivf_topk, train_ivf_centroids,
    )

    n_cells = 64
    cents = train_ivf_centroids(emb, dim=dim, n_cells=n_cells, iters=8,
                                sample_cap=20_000)
    assigned = ivf_assign(emb, cents).localCheckpoint(eager=False)
    for nprobe in (4, 8):
        tag = f"ivf{n_cells}_nprobe{nprobe}"
        got = {r["vec_id"] for r in
               ivf_topk(assigned, query, cents, k=k, nprobe=nprobe).collect()}
        norm_c = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        probes = [int(c) for c in np.argsort(
            -(norm_c @ np.asarray(query, dtype="float64")),
            kind="stable")[:nprobe]]
        n_cand = assigned.filter(F.col("cell").isin(probes)).count()
        out["recall_at_10"][tag] = round(len(got & exact) / k, 3)
        out["scan_frac"][tag] = round(n_cand / max(1, n_total), 4)
    return out


def bench_corpus_ops(spark) -> dict[str, float]:
    """Per-op wall time for the corpus-pipeline family over the full
    documents table (non-headline: reported for visibility, not summed
    into `value` — the headline set predates these ops and stays
    comparable round-over-round)."""
    from pyspark.sql import functions as F

    from webcrawl_spark.operators.corpus import (
        chunk_documents, contamination_flags, remove_duplicate_passages,
    )
    from webcrawl_spark.operators.dedup import remove_boilerplate_lines
    from webcrawl_spark.operators.lm import (
        dsir_weights, pack_sequences, score_perplexity, train_unigram_lm,
    )
    from webcrawl_spark.operators.textstats import (
        normalize_for_dedup, redact_pii, with_c4_flags, with_gopher_flags,
        with_repetition_stats,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench_set = docs.filter(F.col("doc_id") % 100 == 0) \
        .select(F.substring("text", 1, 200).alias("text"))
    structured = docs.select(
        "doc_id", F.regexp_replace("text", " the ", "\n").alias("text"))
    workloads = {
        "line_dedup": lambda: remove_boilerplate_lines(
            structured, min_docs=8).count(),
        "pii_redact": lambda: docs.select(
            redact_pii(F.col("text")).alias("t")).count(),
        "repetition_stats": lambda: with_repetition_stats(docs).count(),
        "gopher_flags": lambda: with_gopher_flags(docs).count(),
        "chunking": lambda: chunk_documents(
            docs, max_words=128, overlap=16).count(),
        "decontaminate": lambda: contamination_flags(
            docs, bench_set, n=8).count(),
        # left-join-shaped outputs: aggregate a COMPUTED column, a bare
        # .count() would be join-eliminated and time nothing
        "c4_rules": lambda: with_c4_flags(docs).agg(
            F.sum(F.length("c4_text"))).collect(),
        "ccnet_normalize": lambda: docs.select(
            F.md5(normalize_for_dedup(F.col("text"))).alias("k")
        ).agg(F.count_distinct("k")).collect(),
        "perplexity": lambda: score_perplexity(
            docs, train_unigram_lm(docs)).agg(F.sum("ppl_nano")).collect(),
        "dsir": lambda: dsir_weights(
            docs, docs.filter(F.col("lang") == "en"), n=2
        ).agg(F.sum("dsir_weight_nano")).collect(),
        "seq_pack": lambda: pack_sequences(docs, seq_len=2048).agg(
            F.max("last_seq")).collect(),
        "passage_removal": lambda: remove_duplicate_passages(docs, n=7).agg(
            F.sum("n_removed")).collect(),
        "quality_clf": lambda: _score_quality_workload(docs),
        "semdedup": lambda: _semdedup_workload(spark),
    }
    times: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in workloads.items():
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    return times


def _score_quality_workload(docs) -> None:
    """fastText-style gate inference: seeded nano-weights (the q_quality_clf
    config), aggregated so the left-join shape can't be eliminated."""
    import numpy as np
    from pyspark.sql import functions as F

    from webcrawl_spark.operators.qualityclf import score_quality

    rng = np.random.RandomState(13)
    wn = [int(x) for x in
          np.round(rng.standard_normal(512) * 2e8).astype("int64")]
    score_quality(docs, wn, 38_000_000).agg(
        F.sum("logit_nano"), F.sum(F.col("quality").cast("int"))).collect()


def _semdedup_workload(spark) -> None:
    """SemDeDup over the embeddings table (anchor-quantizer config)."""
    from pyspark.sql import functions as F

    from webcrawl_spark.operators.similarity import random_anchors, semdedup

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    semdedup(emb, random_anchors(64, 16, seed=11), eps=0.35).agg(
        F.sum(F.col("removed").cast("int"))).collect()


def bench_graph(spark) -> dict:
    """Non-headline: the host-graph family (PageRank / HITS / levels)
    over a distributed synthetic skewed graph — single pass (the
    iteration loop amortizes noise internally; scripts/graph_probe.py
    carries the multi-size scaling table)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from graph_probe import synth_edges

    from webcrawl_spark.operators.hostrank import (
        host_hits, host_pagerank, host_rank_levels,
    )

    edges = synth_edges(spark, 5_000, avg_deg=8).persist()
    n_edges = edges.count()
    t0 = time.perf_counter()
    pr = host_pagerank(edges, n_iter=10)
    pr.count()
    t_pr = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    host_hits(edges, n_iter=10).count()
    t_hits = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    host_rank_levels(pr, n_levels=8).count()
    t_lv = round(time.perf_counter() - t0, 3)
    edges.unpersist()
    return {"edges": n_edges, "pagerank_10it_sec": t_pr,
            "hits_10it_sec": t_hits, "levels_sec": t_lv}


def bench_multimodal(spark) -> dict:
    """Non-headline: REAL decode throughput for the multimodal kernels
    (PNG zlib+unfilter, baseline-JPEG Huffman+IDCT, WAV PCM) through the
    image_features / audio_features operators at fake=False. Payloads are
    built once into a temp parquet so the timed passes measure scan +
    decode, not driver-side re-serialization of a LocalTableScan."""
    import shutil
    import tempfile

    import numpy as np

    from webcrawl_spark.kernels.audiokit import encode_wav
    from webcrawl_spark.kernels.imagekit import encode_png
    from webcrawl_spark.kernels.jpegkit import encode_jpeg
    from webcrawl_spark.operators.multimodal import (
        audio_features, image_features,
    )

    n = 192
    x, y = np.meshgrid(np.arange(96), np.arange(64))
    img_rows, wav_rows = [], []
    base_wav = (np.arange(8000) * 997 % 65536 - 32768).astype(np.int64)
    for i in range(n):
        gray = ((x * 3 + y * 5 + i * 7) % 256).astype(np.uint8)
        img_rows.append((f"png{i:03d}", bytearray(encode_png(gray))))
        img_rows.append((f"jpg{i:03d}", bytearray(encode_jpeg(gray))))
        wav_rows.append((f"wav{i:03d}",
                         bytearray(encode_wav(np.roll(base_wav, i), 16000))))
    tmp = tempfile.mkdtemp(prefix="bench_mm_")
    out: dict = {}
    try:
        spark.createDataFrame(img_rows, "media_id string, payload binary") \
            .repartition(CPUS).write.mode("overwrite") \
            .parquet(os.path.join(tmp, "img"))
        spark.createDataFrame(wav_rows, "media_id string, payload binary") \
            .repartition(CPUS).write.mode("overwrite") \
            .parquet(os.path.join(tmp, "wav"))
        img_df = spark.read.parquet(os.path.join(tmp, "img"))
        wav_df = spark.read.parquet(os.path.join(tmp, "wav"))
        best_img = best_wav = float("inf")
        for _pass in range(2):
            t0 = time.perf_counter()
            image_features(img_df, fake=False).count()
            best_img = min(best_img, time.perf_counter() - t0)
            t0 = time.perf_counter()
            audio_features(wav_df, fake=False).count()
            best_wav = min(best_wav, time.perf_counter() - t0)
        out = {
            "images_per_s": round(2 * n / best_img, 1),
            "image_decode_sec": round(best_img, 3),
            "wavs_per_s": round(n / best_wav, 1),
            "audio_decode_sec": round(best_wav, 3),
            "n_images": 2 * n,
            "n_wavs": n,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_scrape(spark) -> dict[str, float]:
    """Sustained extraction throughput: scrape (markdown+links+quality) over
    a dense synthetic pages table — one big Arrow-UDF stage, the engine's
    dominant cost at 100 TB. This is the primary scaling-efficiency metric:
    no per-round orchestration, pure parallel extraction."""
    from pyspark.sql import functions as F

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.kernels.scrape import ScrapeOptions
    from webcrawl_spark.operators.scrape import scrape

    n_pages_target = int(os.environ.get("SPARK_GRAFT_SCRAPE_PAGES", "8000"))
    site = build_site(seed=29, n_hosts=10,
                      pages_per_host=max(10, n_pages_target // 10),
                      n_hot_hosts=0, density=8)
    urls = site.urls()
    url_df = spark.createDataFrame([(u,) for u in urls], "url string") \
        .repartition(CPUS * 4)

    # distributed page rendering (pure function of (seed, url))
    spec_bc = spark.sparkContext.broadcast(site)

    @F.udf("binary")
    def render(u):
        return render_page_html(spec_bc.value, u).encode()

    pages = url_df.withColumn("html", render(F.col("url"))).cache()
    n = pages.count()
    total_bytes = pages.select(F.sum(F.length("html"))).first()[0]

    out = scrape(pages, ScrapeOptions(formats=("markdown", "links")))
    agg = out.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("markdown")).alias("md_bytes"),
    )
    # warm (python workers + codegen), then best-of-2 to shed VM noise
    warm_n = max(200, n // 20)
    scrape(pages.limit(warm_n), ScrapeOptions(formats=("markdown",))) \
        .select(F.sum(F.length("markdown"))).first()
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        stats = agg.first()
        elapsed = min(elapsed, time.perf_counter() - t0)
    pages.unpersist()
    return {
        "scrape_pages": int(stats["n"]),
        "scrape_html_mb": round((total_bytes or 0) / 1e6, 1),
        "scrape_sec": round(elapsed, 3),
        "scrape_pages_per_sec": round(n / elapsed, 2) if elapsed else 0.0,
        "scrape_mb_per_sec": round((total_bytes or 0) / 1e6 / elapsed, 2)
        if elapsed else 0.0,
    }


def bench_crawl(spark) -> dict[str, float]:
    """Frontier throughput: synthetic site → budgeted rounds with full
    markdown extraction; reports fetched URLs/sec and rounds/hour."""
    import shutil
    import tempfile

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.crawl import EngineConfig, SparkCrawl
    from webcrawl_spark.frontier.oracle import CrawlConfig

    site = build_site(seed=13, n_hosts=12, pages_per_host=CRAWL_PAGES_PER_HOST,
                      n_hot_hosts=2, hot_factor=3)
    rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
    pages = spark.createDataFrame(rows, "url string, html binary") \
        .repartition(CPUS).cache()
    pages.count()

    seed_host = site.hosts[0]
    cfg = CrawlConfig(
        seed_url=f"https://{seed_host}/", limit=None, max_depth=3,
        allow_backward_crawling=True, allow_external_content_links=True,
        host_budget=64,
    )
    workdir = tempfile.mkdtemp(prefix="crawl_bench_")
    try:
        t0 = time.perf_counter()
        crawl = SparkCrawl(spark, pages, cfg, workdir,
                           engine=EngineConfig(num_buckets=CPUS))
        rounds = crawl.run()
        elapsed = time.perf_counter() - t0
        fetched = crawl.fetch_log().count()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        pages.unpersist()
    return {
        "crawl_sec": round(elapsed, 3),
        "crawl_rounds": rounds,
        "crawl_fetched": fetched,
        "fetched_urls_per_sec": round(fetched / elapsed, 2) if elapsed else 0.0,
        "frontier_rounds_per_hour": round(rounds / elapsed * 3600, 1)
        if elapsed else 0.0,
    }


def main() -> None:
    from webcrawl_spark.session import get_spark

    spark = get_spark(
        "webcrawl-spark-bench", master=f"local[{CPUS}]",
        extra_confs={"spark.sql.shuffle.partitions": str(max(8, CPUS))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    try:
        t0 = time.perf_counter()
        qtimes = bench_queries(spark) if only in ("", "queries") else {}
        scrape_stats = (bench_scrape(spark)
                        if only in ("", "scrape") else {"scrape_sec": 0.0})
        crawl = (bench_crawl(spark)
                 if only in ("", "crawl") else {"crawl_sec": 0.0})
        ann = bench_ann_recall(spark) if only in ("", "queries") else {}
        corpus_ops = bench_corpus_ops(spark) if only in ("", "queries") else {}
        multimodal = bench_multimodal(spark) if only in ("", "queries") else {}
        graph = bench_graph(spark) if only in ("", "queries") else {}
        wall = round(time.perf_counter() - t0, 3)
        # protocol v2 (see BENCH.md measurement protocol): value = sum of
        # per-workload best times — what r2/r3's per-query rows already
        # measured, freed of datagen/warmup wall time; wall_sec keeps the
        # raw clock for the old protocol's comparison
        total = round(sum(qtimes.values())
                      + scrape_stats["scrape_sec"] + crawl["crawl_sec"], 3)
        out = {
            "metric": "webcrawl_spark_bench_total",
            "value": total,
            "unit": "sec",
            "protocol": "v2: best-of-2 interleaved queries; "
                        "value = sum of per-workload best times",
            "wall_sec": wall,
            "queries": {**qtimes,
                        "scrape_extraction": scrape_stats["scrape_sec"],
                        "crawl_round_job": crawl["crawl_sec"]},
            "sf": _sf_from_dir(SF_DIR),
            "cpus": CPUS,
            "scrape": scrape_stats,
            "crawl": crawl,
            "ann": ann,
            "corpus_ops": corpus_ops,
            "multimodal": multimodal,
            "graph": graph,
        }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
