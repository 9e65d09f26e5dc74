"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator family from SURVEY.md §2 to a
DataFrame query over /root/testdata tables; ``oracle_sql()`` gives the
DuckDB twin. Column names and float rounding are aligned on both sides
(aggregates rounded so accumulation-order float noise can't break the
value-hash compare). Operators with no SQL expression (MinHash-LSH, SimHash,
ANN probing, multimodal decode) are rows-only checks.

Operator-family mapping (SURVEY.md §2 → query):
  F1 predicate chain w/ denial reasons → q_admission_reasons
  J1 anti-join dedup                   → q_frontier_antijoin
  J5/J6 equi joins (broadcast dim)     → q_brand_revenue, q_segment_top_orders
  W1/W2 FIFO seq + ordered limit       → q_fifo_head
  W5 per-host top-k under budget       → q_perhost_topk
  A1 metrics aggregation               → q_round_metrics (TPC-H Q1 shape)
  2.6 union + dedup                    → q_union_dedup
  U2 canonicalization analogue         → q_norm_dedup (exact dedup)
  S3/U6 PDF engine                     → q_pdf_text (full build→extract oracle)
  S4 document converter                → q_doc_convert (xlsx→HTML oracle),
                                         q_docx_notes (docx incl. styling +
                                         footnotes → HTML oracle)
  text ops (tokens/quality/lang/fp)    → q_token_stats (word + BPE-ish),
                                         q_quality_filter, q_lang_id,
                                         q_exact_dedup_docs
  similarity (brute-force cosine)      → q_cosine_topk
  streaming-ish window agg             → q_hourly_events
  SimHash near-dup                     → q_simhash_pairs (exact SQL oracle —
                                         md5 token hash + pigeonhole banding)
  MinHash-LSH dedup                    → q_minhash_oracle (exact SQL oracle,
                                         pigeonhole config) + q_minhash_dedup
                                         (scale config, rows-only)
  near-dup clustering (components)     → q_dup_groups (recursive-CTE oracle)
                                         + q_dup_degree_cap (skew-guarded
                                         variant, directed-reach oracle)
  SSRF guard classify (live fetch)     → q_ssrf_classify (octet-range oracle)
  embedding near-dup (bucketed cosine) → q_embed_neardup (bucket+cosine
                                         recomputed in SQL from shared
                                         hyperplane constants)
  n-gram Jaccard (exact, verification) → q_ngram_jaccard (tokenization +
                                         set-ratio twin in SQL)
  ANN top-k (RP-LSH bucketed)          → q_ann_topk (FULL oracle: bucketing
                                         recomputed in SQL from shared plane
                                         constants + exact rerank)
  SemDeDup (semantic dedup)            → q_semdedup (cells, pair cosines and
                                         the keep-lowest-centroid-sim rule
                                         recomputed from anchor constants)
  quality classifier (fastText-style)  → q_quality_clf (hashed-gram logistic
                                         gate; integer nano-weights, exact
                                         int64 oracle; trainer pytest-gated)
  image near-dup dedup (dHash)         → q_image_dhash (decode → integer
                                         dHash bands → banded pairs →
                                         Hamming, recomputed in integer SQL)
  audio near-dup dedup (contour hash)  → q_audio_ahash (WAV decode → 1-D
                                         loudness-contour bands → same
                                         banded pairing, integer oracle)
  byte-level CDC dedup                 → q_cdc (content-defined chunk
                                         boundaries + dup-bytes stats,
                                         rebuilt verbatim in SQL)
  bigram LM perplexity (CCNet order-2) → q_bigram_ppl (conditional add-1
                                         scores + percentile buckets,
                                         full SQL twin)
  multimodal (real PNG/GIF/JPEG + WAV  → q_image_plumbing / q_audio_plumbing
  + MP4 metadata)                        / q_video_plumbing (integer counts
                                         and metadata recomputed in SQL
                                         from shared seed formulas)
  crawl rounds                         → q_crawl_round (unrolled round-loop
                                         replay in SQL, limit=None config)
  crawl engine end-to-end              → entry() (frontier round on the
                                         synthetic site; pytest gates parity)
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings")


def _load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
            for n in names}


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one politeness-budgeted frontier-style scheduling round,
    expressed over the events stream as the candidate source — anti-join
    'seen' users (customers with high balance), per-type top-k under budget,
    FIFO-ordered output. Exercises the engine's core pipeline shape
    (dedup anti-join → per-key window top-k → ordered output)."""
    t = _load(spark, "/root/testdata/sf0.001", "events", "customer")
    seen = t["customer"].filter(F.col("c_acctbal") > 9000) \
                        .select(F.col("c_custkey").alias("user_id"))
    candidates = t["events"].join(F.broadcast(seen), "user_id", "left_anti")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).drop("rn")
        .orderBy("ts", "event_id")
        .select("event_id", "ts", "user_id", "event_type",
                F.round("value", 4).alias("value"))
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------

def q_admission_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1's ordered predicate chain with first-failure denial reasons
    (crawler.rs:266-372), over lineitem rows."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    reason = (
        F.when(F.col("l_quantity") > 45, F.lit("DEPTH_LIMIT"))
        .when(F.col("l_returnflag") == "R", F.lit("FILE_TYPE"))
        .when(F.col("l_discount") > 0.08, F.lit("EXCLUDE_PATTERN"))
        .when(F.col("l_tax") > 0.06, F.lit("ROBOTS_TXT"))
        .otherwise(F.lit("ALLOWED"))
    )
    return (
        li.select(reason.alias("denial_reason"))
        .groupBy("denial_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("denial_reason")
    )


def q_frontier_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 frontier dedup as a left anti-join: orders whose customer is
    already in the 'seen set'."""
    t = _load(spark, sf_dir, "orders", "customer")
    seen = t["customer"].filter(F.col("c_acctbal") > 5000)
    return (
        t["orders"].join(seen, t["orders"]["o_custkey"] == seen["c_custkey"],
                         "left_anti")
        .agg(F.count(F.lit(1)).alias("n_unseen"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


def q_perhost_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 per-host top-k under politeness budget: top-3 orders per customer
    by price (Window.partitionBy ≙ per-host budget selection)."""
    orders = _load(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_top"),
             F.round(F.sum("o_totalprice"), 2).alias("top_price"))
        .orderBy("o_custkey")
    )


def q_fifo_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 FIFO ordering + limit: first 100 events in stream order."""
    events = _load(spark, sf_dir, "events")["events"]
    return (
        events.orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", "user_id", "event_type")
    )


def q_round_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 metrics aggregation in TPC-H Q1 shape (pricing summary)."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join (J6 synthetic-fetch shape): revenue per part brand."""
    t = _load(spark, sf_dir, "lineitem", "part")
    return (
        t["lineitem"].join(F.broadcast(t["part"]),
                           t["lineitem"]["l_partkey"] == t["part"]["p_partkey"])
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand")
    )


def q_segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + ordered top-k (TPC-H Q3 shape)."""
    t = _load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], t["customer"]["c_custkey"] == t["orders"]["o_custkey"])
        .join(t["lineitem"],
              t["orders"]["o_orderkey"] == t["lineitem"]["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd")
                .alias("o_orderdate"), "revenue")
    )


def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2.6 union + dedup: high-balance customers ∪ suppliers' nations."""
    t = _load(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct().orderBy("nationkey")


def q_norm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2 normalize-then-dedup analogue: distinct normalized event props
    domains per event_type."""
    events = _load(spark, sf_dir, "events")["events"]
    return (
        events.select("event_type",
                      F.lower(F.trim(F.col("props"))).alias("norm"))
        .groupBy("event_type")
        .agg(F.countDistinct("norm").alias("n_distinct"))
        .orderBy("event_type")
    )


def q_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-analogue tumbling window: hourly event counts/values
    (the batch twin of the structured-streaming rollup)."""
    events = _load(spark, sf_dir, "events")["events"]
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace-word and BPE-ish pre-tokenizer token
    counting over documents (JVM-side split / regexp_extract_all)."""
    from webcrawl_spark.operators.textstats import bpe_token_count, token_count

    docs = _load(spark, sf_dir, "documents")["documents"]
    return (
        docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"),
                    bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
                    F.length("text").alias("n_chars_actual"))
        .orderBy("doc_id")
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: per-lang counts of documents passing quality ≥ 0.4."""
    from webcrawl_spark.operators.textstats import quality_score

    docs = _load(spark, sf_dir, "documents")["documents"]
    return (
        docs.withColumn("q", quality_score(F.col("text")))
        .filter(F.col("q") >= 0.4)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_pass"))
        .orderBy("lang")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic distribution over documents."""
    from webcrawl_spark.operators.textstats import language_guess

    docs = _load(spark, sf_dir, "documents")["documents"]
    return (
        docs.select(language_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_guess")
    )


def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: kept doc_ids (lowest id per group)."""
    from webcrawl_spark.operators.dedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")["documents"]
    return exact_dedup(docs).select("doc_id").orderBy("doc_id")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a fixed unit query vector."""
    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    dim = 64
    query = [1.0 if i == 0 else 0.0 for i in range(dim)]
    from webcrawl_spark.operators.similarity import cosine_sim_col

    return (
        emb.select("vec_id",
                   F.round(cosine_sim_col("embedding", query), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(20)
    )


def q_engpicker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 engpicker per-URL verdicts (Levenshtein similarity) over document
    pairs synthesized deterministically from the documents table."""
    from webcrawl_spark.operators.engpicker import engpicker_url_verdicts

    docs = _load(spark, sf_dir, "documents")["documents"]
    pairs = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(None))
        .otherwise(F.col("text")).alias("cdp_markdown"),
        F.when(F.col("doc_id") % 13 == 0, F.lit(""))
        .when(F.col("doc_id") % 3 == 0,
              F.expr("substring(text, 1, greatest(length(text) - 8, 1))"))
        .otherwise(F.col("text")).alias("tls_markdown"),
    )
    return engpicker_url_verdicts(pairs, similarity_threshold=0.9) \
        .orderBy(F.col("url").cast("long"))


def q_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/U6 PDF engine end-to-end: synthesize deterministic PDFs from the
    documents table (fixed 100-char line layout, 40 lines/page, title
    'doc-<id>'), run the pdf scrape engine (page count, Info title,
    HTML-escaped text as markdown, 150 ms/page time budget), and emit the
    extracted results. The DuckDB oracle reconstructs the expected text from
    the same layout contract — a full build→parse→extract→escape check."""
    from webcrawl_spark.operators.pdf import (
        build_pdf_udf, pdf_lines_col, pdf_scrape_udf,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    # repeat text per doc so page counts vary (1..~4 pages)
    docs = docs.select(
        "doc_id",
        F.expr("repeat(text, 1 + cast(doc_id % 4 as int))").alias("text"),
    )
    pdfs = docs.select(
        "doc_id",
        build_pdf_udf(40)(
            pdf_lines_col(F.col("text"), 100),
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")),
        ).alias("payload"),
    )
    res = pdfs.withColumn(
        "pdf", pdf_scrape_udf(timeout_ms=30000)(F.col("payload")))
    return res.select(
        "doc_id",
        F.col("pdf.num_pages").alias("num_pages"),
        F.col("pdf.title").alias("title"),
        F.col("pdf.markdown").alias("pdf_markdown"),
        F.col("pdf.insufficient_time").alias("insufficient_time"),
    ).orderBy("doc_id")


def q_doc_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 document converter end-to-end: build a real xlsx per nation row
    (zip + OOXML sheet), parse it back and render the reference HTML shape
    (xlsx.rs:19-73 + renderers/html.rs:11-237). The oracle reconstructs the
    exact HTML string in SQL — a full build→parse→render check."""
    from webcrawl_spark.operators.document import (
        build_xlsx_rows_udf, xlsx_html_udf,
    )

    nation = _load(spark, sf_dir, "nation")["nation"]
    cells = F.array(
        F.array(F.lit("key"), F.lit("name"), F.lit("region")),
        F.array(F.col("n_nationkey").cast("string"), F.col("n_name"),
                F.col("n_regionkey").cast("string")),
    )
    pay = nation.select(
        "n_nationkey",
        build_xlsx_rows_udf("Nations")(cells).alias("payload"),
    )
    return pay.select(
        "n_nationkey",
        xlsx_html_udf()(F.col("payload")).alias("doc_html"),
    ).orderBy("n_nationkey")


def q_docx_notes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 word-processor converter end-to-end: build a real docx per
    nation row (OOXML package with heading, bold run, footnote reference
    run and word/footnotes.xml incl. Word's separator pseudo-notes),
    convert via provider sniffing, render the reference HTML shape
    (docx.rs provider + html.rs:41-80 footnote section). The oracle
    reconstructs the exact HTML string in SQL — a full
    build→parse→render check covering styling runs, the superscripted
    footnote ref, and the end-of-body footnotes section."""
    from webcrawl_spark.operators.document import (
        build_docx_notes_udf, document_html_udf,
    )

    nation = _load(spark, sf_dir, "nation")["nation"]
    return nation.select(
        "n_nationkey",
        document_html_udf()(
            build_docx_notes_udf()(F.col("n_name"))).alias("doc_html"),
    ).orderBy("n_nationkey")


def q_minhash_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup in its oracle-checkable configuration: md5-shingle
    signatures with mod-2^64 permutations (recomputable in DuckDB HUGEINT
    arithmetic), and bands(8) > max disagreements(6) at threshold 0.8 so the
    banding is an exact pigeonhole — the LSH output EQUALS the brute-force
    signature comparison the oracle runs. max_bucket is lifted so no
    truncation breaks completeness."""
    from webcrawl_spark.operators.dedup import (
        minhash_lsh_dedup, minhash_signatures_md5,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    return minhash_lsh_dedup(
        docs, num_perm=32, bands=8, threshold=0.8, max_bucket=1_000_000_000,
        signatures=minhash_signatures_md5(32, shingle_k=5, seed=1),
    ).select("doc_id").orderBy("doc_id")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs — fully oracle-checked: the 4-block pigeonhole
    banding is exact for hamming ≤ 3, and the md5 token hash makes the
    simhash recomputable in SQL, so the output equals the brute-force
    all-pairs comparison."""
    from pyspark.sql import functions as F

    from webcrawl_spark.operators.dedup import (
        simhash_column, simhash_near_dup_pairs,
    )

    docs = _load(spark, sf_dir, "documents")["documents"] \
        .filter(F.trim("text") != "")
    return simhash_near_dup_pairs(docs, max_hamming=3,
                                  simhash=simhash_column()) \
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")) \
        .orderBy("doc_a", "doc_b")


# ---- rows-only (non-SQL-expressible) ----

def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: MinHash-LSH pairs (exact-pigeonhole oracle
    config) → connected components via distributed min-label propagation
    with pointer doubling (operators/dedup.py:dup_components). Output =
    (doc, component) for every doc that appears in a near-dup pair;
    component = min doc id of its cluster — the canonical-representative
    step of a corpus dedup pipeline. The oracle recomputes the SAME pairs
    in SQL and closes them transitively with a recursive CTE."""
    from webcrawl_spark.operators.dedup import (
        dup_components, minhash_lsh_pairs, minhash_signatures_md5,
    )

    docs = _load(spark, sf_dir, "documents")["documents"]
    pairs = minhash_lsh_pairs(
        docs, num_perm=32, bands=8, threshold=0.8,
        max_bucket=1_000_000_000,
        signatures=minhash_signatures_md5(32, shingle_k=5, seed=1),
    )
    return dup_components(pairs).orderBy("doc")


def q_dup_degree_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-capped connected components — the giant-component skew guard
    (operators/dedup.py dup_components(max_degree=...)), exercised on a
    graph where the cap actually BITES: customer↔order edges make every
    customer a hub of ~10 neighbors (the minhash pair graph at this SF
    maxes out at degree 2). Each node keeps only its 4 lowest-id
    neighbors after symmetrization; pull edges stay directed (no
    re-symmetrization), so hot-key fan-in is capped. The converged
    min-label + pointer-doubling fixpoint is exactly min(id reachable
    along directed pull edges), which the oracle recomputes with the same
    capped edge derivation + a directed recursive reachability CTE."""
    from webcrawl_spark.operators.dedup import dup_components

    orders = _load(spark, sf_dir, "orders")["orders"] \
        .filter(F.col("o_custkey") <= 300)   # SF-stable graph size
    pairs = orders.select(
        F.least("o_custkey", "o_orderkey").alias("doc_a"),
        F.greatest("o_custkey", "o_orderkey").alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b")).distinct()
    return dup_components(pairs, max_degree=4).orderBy("doc")


def q_ssrf_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSRF guard as a classify column (kernels/classify.is_unsafe_host,
    safeFetch.ts semantics — the live fetch mode's pre-dial deny): a
    deterministic host fabric derived from customer keys spans private
    (10/8, 172.16/12, 192.168/16), loopback-adjacent names (.localhost,
    .internal), link-local (169.254/16), CGNAT (100.64/10), and GLOBAL
    decoys (8/8, 172.32+ — just outside the private block, public names).
    The oracle re-derives the identical hosts and classifies them by
    parsing octets against the non-global IPv4 ranges + name-suffix rules
    in pure SQL — it tests the classifier, not the construction."""
    from webcrawl_spark.frontier.crawl import _unsafe_host_udf

    cust = _load(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    s = lambda K: K.cast("string")  # noqa: E731
    m = k % 10
    host = (
        F.when(m == 0, F.concat(F.lit("10."), s(k % 200), F.lit("."),
                                s((k * 7) % 200), F.lit("."), s(k % 250 + 1)))
        .when(m == 1, F.concat(F.lit("site"), s(k), F.lit(".example.com")))
        .when(m == 2, F.concat(F.lit("192.168."), s(k % 200), F.lit("."),
                               s(k % 250 + 1)))
        .when(m == 3, F.concat(F.lit("svc"), s(k), F.lit(".localhost")))
        .when(m == 4, F.concat(F.lit("172."), s(16 + k % 16), F.lit("."),
                               s(k % 200), F.lit("."), s(k % 250 + 1)))
        .when(m == 5, F.concat(F.lit("8."), s(k % 200), F.lit("."),
                               s((k * 3) % 200), F.lit("."), s(k % 250 + 1)))
        .when(m == 6, F.concat(F.lit("api"), s(k), F.lit(".internal")))
        .when(m == 7, F.concat(F.lit("169.254."), s(k % 200), F.lit("."),
                               s(k % 250 + 1)))
        .when(m == 8, F.concat(F.lit("100."), s(64 + k % 64), F.lit("."),
                               s(k % 200), F.lit("."), s(k % 250 + 1)))
        .otherwise(F.concat(F.lit("172."), s(32 + k % 100), F.lit("."),
                            s(k % 200), F.lit("."), s(k % 250 + 1)))
    )
    return (
        cust.select(host.alias("host"))
        .select("host", _unsafe_host_udf()(F.col("host")).alias("unsafe"))
        .orderBy("host")
    )


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (bucket self-join + exact
    cosine verify, operators/similarity.py) — FULL oracle: the DuckDB twin
    recomputes every vector's sign-bit bucket from the SAME hyperplane
    constants (imported), self-joins on bucket, and verifies with the same
    sequential-order cosine. Threshold chosen so the synthetic (near-
    random) embeddings yield a non-trivial pair set; cosine rounded to 6
    in the projection only."""
    from webcrawl_spark.operators.similarity import embedding_near_dup_pairs

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    return (
        embedding_near_dup_pairs(emb, dim=64, threshold=0.18, n_bits=6,
                                 seed=7, id_col="vec_id")
        .select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("doc_a", "doc_b")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs (verification-scale operator) over a
    bounded doc subset — FULL oracle: the DuckDB twin replicates the
    tokenization (lower, \\s+ split of the trimmed text), the partial-gram
    edge for short docs, and the set-semantics intersect/union ratio."""
    from webcrawl_spark.operators.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf_dir, "documents")["documents"] \
        .filter((F.col("doc_id") < 200) & (F.trim("text") != "")) \
        .withColumn("text", F.trim(F.col("text")))
    return (
        ngram_jaccard_pairs(docs, n=3, threshold=0.3)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path MinHash configuration (vectorized FNV shingle hash +
    Mersenne permutations — no per-shingle md5), now with a FULL oracle by
    CONFIG-AGREEMENT INVARIANT: any correct MinHash implementation at
    threshold 0.8 with est-Jaccard verification reaches the same dedup
    verdicts on this corpus, because the synthetic documents' pairwise
    similarities sit far from the threshold (near-dups ≥ ~0.95 Jaccard,
    unrelated ≤ ~0.3; FN prob per true pair ≈ (1-0.95^4)^8 ≈ 1e-6, FP
    candidates are killed by the ≥26/32 signature-agreement filter). The
    DuckDB oracle therefore recomputes the md5-config ground truth — a
    hash mismatch means the FNV/Mersenne scale path mis-deduped a doc the
    margin says it cannot. Verified equal at sf0.01 AND sf0.1."""
    from webcrawl_spark.operators.dedup import minhash_lsh_dedup

    docs = _load(spark, sf_dir, "documents")["documents"]
    return minhash_lsh_dedup(docs, num_perm=32, bands=8, threshold=0.8) \
        .select("doc_id").orderBy("doc_id")


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k (RP-LSH sign buckets + 1-bit-flip probing + exact cosine
    rerank) — now a FULL equality oracle: the DuckDB twin recomputes the
    identical random-hyperplane bucketing (plane constants shared verbatim
    via rp-LSH's _hyperplanes), restricts to the same probed buckets, and
    exact-reranks — bucketing, probing, and rerank all independently
    verified in SQL."""
    from webcrawl_spark.operators.similarity import ann_topk

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    query = [1.0 if i == 0 else 0.0 for i in range(64)]
    return ann_topk(emb, query, k=10, dim=64, n_bits=8) \
        .select("vec_id", F.round("cosine", 6).alias("cosine"))


_GOPHER_FLAG_COLS = [
    "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
    "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
    "ok_stopwords", "gopher_pass",
]


def q_interdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document duplicate-passage fraction (word 8-gram windows
    shared across >= 2 docs) — the across-corpus complement of
    q_repetition's within-doc signals."""
    from webcrawl_spark.operators.corpus import duplicate_passage_fraction

    docs = _load(spark, sf_dir, "documents")["documents"]
    return duplicate_passage_fraction(docs, n=8).orderBy("doc_id")


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher quality rules, one boolean per rule + the
    conjunction, per document."""
    from webcrawl_spark.operators.textstats import with_gopher_flags

    docs = _load(spark, sf_dir, "documents")["documents"]
    return with_gopher_flags(docs) \
        .select("doc_id", *_GOPHER_FLAG_COLS).orderBy("doc_id")


_C4_FLAG_COLS = ["ok_sentences", "ok_lorem", "ok_brace", "ok_badwords",
                 "c4_pass"]


def q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020): line filter (terminal
    punctuation, >=3 words, no javascript) re-joined as c4_text, plus the
    document-level rule flags. Pure Column pipeline; SQL twin recomputes
    the line filter with list_filter."""
    from webcrawl_spark.operators.textstats import with_c4_flags

    docs = _load(spark, sf_dir, "documents")["documents"]
    return with_c4_flags(docs) \
        .select("doc_id", "c4_text", *_C4_FLAG_COLS).orderBy("doc_id")


def q_ccnet_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet dedup normalization: the canonical dedup key (lowercase,
    digits->0, punctuation stripped, whitespace collapsed) hashed with md5,
    plus the per-key duplicate-group size the dedup pass would act on."""
    from pyspark.sql import Window

    from webcrawl_spark.operators.textstats import normalize_for_dedup

    docs = _load(spark, sf_dir, "documents")["documents"]
    norm = normalize_for_dedup(F.col("text"))
    out = docs.select(
        "doc_id",
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_key"),
    )
    w = Window.partitionBy("norm_key")
    return out.withColumn("n_dups", F.count("*").over(w)).orderBy("doc_id")


def q_passage_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-document duplicate-passage REMOVAL (Lee et al. exact-substring
    dedup at word granularity, n=7 to hit the synthetic corpus's overlap):
    words covered by any 7-gram shared across >=2 distinct docs are cut,
    survivors re-joined. SQL twin recomputes windows on the gram strings
    (Spark side hashes them — 64-bit xxhash64, collision-free here)."""
    from webcrawl_spark.operators.corpus import remove_duplicate_passages

    docs = _load(spark, sf_dir, "documents")["documents"]
    return remove_duplicate_passages(docs, n=7).orderBy("doc_id")


def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity scoring: unigram LM trained on the corpus
    itself (add-1 smoothing over V known types + one OOV type), per-doc
    mean token log-prob and perplexity on the 1e-9 integer grid, plus the
    head/middle/tail percentile buckets. SQL twin recomputes the LM, the
    scores and the quantile_cont cutoffs from the same parquet."""
    from webcrawl_spark.operators.lm import (
        perplexity_buckets, score_perplexity, train_unigram_lm)

    docs = _load(spark, sf_dir, "documents")["documents"]
    lm = train_unigram_lm(docs)
    return perplexity_buckets(score_perplexity(docs, lm)).orderBy("doc_id")


def q_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 CCNet scoring: conditional bigram perplexity
    p(w2|w1) = (c(w1 w2)+1)/(c_ctx(w1)+V_cont+1) with context and
    continuation-vocab counts derived from the trained table, plus the
    same head/middle/tail buckets. The SQL twin recomputes the bigram
    table, both denominator counts, the scores, and the quantile
    cutoffs."""
    from webcrawl_spark.operators.lm import (
        perplexity_buckets, score_perplexity_bigram, train_bigram_lm)

    docs = _load(spark, sf_dir, "documents")["documents"]
    lm = train_bigram_lm(docs)
    return perplexity_buckets(
        score_perplexity_bigram(docs, lm)).orderBy("doc_id")


def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights toward the English sub-corpus: hashed word
    bigrams (md5-salted buckets so DuckDB recomputes them bit-for-bit),
    add-1 smoothed bucket distributions on target (lang='en') vs source
    (all docs), per-doc sum of log-ratios on the 1e-9 grid."""
    from webcrawl_spark.operators.lm import dsir_weights

    docs = _load(spark, sf_dir, "documents")["documents"]
    target = docs.filter(F.col("lang") == "en")
    return dsir_weights(docs, target, n=2, n_buckets=4096).orderBy("doc_id")


def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: documents laid end-to-end in doc_id
    order (one separator token each) and cut into 512-token training
    windows; per-doc token_offset / first_seq / last_seq / n_seqs via the
    two-phase distributed prefix sum (no single-partition window —
    plan-gated in tests/test_lm.py). SQL twin is the naive global window
    cumsum."""
    from webcrawl_spark.operators.lm import pack_sequences

    docs = _load(spark, sf_dir, "documents")["documents"]
    return pack_sequences(docs, seq_len=512).orderBy("doc_id")


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-doc count of word 8-grams shared with
    a 'benchmark' set (deterministically derived: the first 200 chars of
    every 100th document), i.e. the eval-leak probe. Both sides reduce to
    n-gram hashes before the broadcast join; the oracle recomputes the
    overlap on the gram strings themselves."""
    from webcrawl_spark.operators.corpus import contamination_flags

    docs = _load(spark, sf_dir, "documents")["documents"]
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) == 0) \
        .select(F.substring("text", 1, 200).alias("text"))
    return contamination_flags(docs, bench, n=8).orderBy("doc_id")


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k in its oracle configuration: the coarse quantizer is the
    seed-derived random-anchor set (data-independent, so the DuckDB twin
    recomputes cell assignment, the nprobe probe set, and the exact rerank
    from the same constants). The trained-k-means configuration is the
    quality path, recall-gated in tests/test_operators.py::TestIvf and
    measured by bench.py."""
    from webcrawl_spark.operators.similarity import ivf_topk, random_anchors

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    anchors = random_anchors(64, 16, seed=11)
    query = [1.0 if i == 0 else 0.0 for i in range(64)]
    return ivf_topk(emb, query, anchors, k=10, nprobe=4) \
        .select("vec_id", F.round("cosine", 6).alias("cosine"))


#: q_quality_clf config constants, shared with the generated SQL oracle:
#: seed-derived nano-unit weights (data-independent, the anchors trick) —
#: the TRAINED-weights path is pytest-gated (tests/test_qualityclf.py
#: trains distributed LR to >=95% and to 1e-9 numpy parity).
_QCLF_BUCKETS, _QCLF_SEED, _QCLF_BIAS_NANO = 512, 13, 38_000_000


def _qclf_weights_nano() -> list[int]:
    import numpy as np

    rng = np.random.RandomState(_QCLF_SEED)
    return [int(x) for x in
            np.round(rng.standard_normal(_QCLF_BUCKETS) * 2e8)
            .astype("int64")]


def q_quality_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-n-gram logistic quality gate in its oracle
    configuration (seeded integer nano-weights, so scoring is pure int64
    and the DuckDB twin recomputes buckets, counts, and the cleared-
    division decision rule exactly)."""
    from webcrawl_spark.operators.qualityclf import score_quality

    docs = _load(spark, sf_dir, "documents")["documents"]
    return (
        score_quality(docs, _qclf_weights_nano(), _QCLF_BIAS_NANO)
        .orderBy("doc_id")
    )


#: q_semdedup config constants, shared with the generated SQL oracle.
_SEMDEDUP_CELLS, _SEMDEDUP_SEED, _SEMDEDUP_EPS, _SEMDEDUP_DIM = 16, 11, 0.35, 64


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (semantic dedup, Abbas et al. 2023) in its oracle
    configuration: seed-derived anchor cells (data-independent — the
    DuckDB twin recomputes assignment, within-cell pair cosines, and the
    keep-lowest-centroid-sim removal rule from the same constants). The
    trained-k-means quantizer is the quality path, covered by
    tests/test_semdedup.py."""
    from webcrawl_spark.operators.similarity import random_anchors, semdedup

    emb = _load(spark, sf_dir, "embeddings")["embeddings"]
    anchors = random_anchors(_SEMDEDUP_DIM, _SEMDEDUP_CELLS,
                             seed=_SEMDEDUP_SEED)
    return (
        semdedup(emb, anchors, eps=_SEMDEDUP_EPS)
        .select("vec_id", "cell", F.round("csim", 6).alias("csim"),
                "removed")
        .orderBy("vec_id")
    )


#: q_crawl_round site/config constants — shared by the Spark query and the
#: generated SQL oracle so the two sides cannot drift. limit=None: the
#: SQL round sim is exact without the sequential limit-replay semantics,
#: which stay pytest-gated (limit-replay parity in tests/test_frontier.py).
_CRAWL_Q_SITE = dict(seed=5, n_hosts=2, pages_per_host=18, n_hot_hosts=0)
_CRAWL_Q_CFG = dict(limit=None, max_depth=3, allow_backward_crawling=True,
                    host_budget=4)
_CRAWL_Q_UNROLL = 10  # fixed SQL round unroll; sim needs 6, tail rounds empty


def q_crawl_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl engine itself: a politeness-budgeted frontier crawl over a
    small deterministic synthetic site, returning the ordered fetch log.
    Full oracle: the admitted-link edge list is exported through the same
    (oracle-tested) classify/extract kernels, and the DuckDB side replays
    the round loop — per-host budget top-k, first-discovery-wins seen set,
    dense FIFO seq — as an unrolled WITH chain (_crawl_round_oracle_sql).
    Sequential limit-replay semantics are pytest-gated separately."""
    import shutil
    import tempfile

    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.crawl import SparkCrawl
    from webcrawl_spark.frontier.oracle import CrawlConfig

    site = build_site(**_CRAWL_Q_SITE)
    rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
    pages = spark.createDataFrame(rows, "url string, html binary")
    cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", **_CRAWL_Q_CFG)
    workdir = tempfile.mkdtemp(prefix="q_crawl_round_")
    try:
        crawl = SparkCrawl(spark, pages, cfg, workdir)
        crawl.run()
        log = crawl.fetch_log().orderBy("seq") \
            .select("url", "host", "depth", "round", "seq", "status")
        out = spark.createDataFrame(log.collect(), log.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return out


#: q_hostrank site/config constants — shared by the Spark query and the
#: generated SQL oracle (same no-drift trick as q_crawl_round). Hot hosts
#: give the rank distribution real spread; 10 fixed iterations keep the
#: SQL unroll exact (no convergence test on either side).
_HR_Q_SITE = dict(seed=13, n_hosts=6, pages_per_host=12,
                  n_hot_hosts=2, hot_factor=3)
_HR_Q_ITER = 10


def q_hostrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-rank (operators/hostrank.py): weighted PageRank over the
    host→host link graph of a deterministic synthetic site — the computed
    input to the north star's priority = depth + host-rank. Full oracle:
    the raw link pairs are exported through the same extraction kernel
    (extract_links + url_host) into VALUES literals and the DuckDB side
    re-derives edge weights, out-weight normalization, dangling mass and
    all 10 power iterations as an unrolled MATERIALIZED WITH chain.
    Ranks are emitted as integer nano-rank (round(rank*1e9)) so the
    comparison is integer-exact despite double summation-order jitter."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.operators.hostrank import (
        host_link_edges, host_pagerank,
    )

    site = build_site(**_HR_Q_SITE)
    rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
    pages = spark.createDataFrame(rows, "url string, html binary")
    ranks = host_pagerank(host_link_edges(pages), n_iter=_HR_Q_ITER)
    return ranks.select(
        "host",
        F.round(F.col("rank") * 1e9).cast("long").alias("rank_e9"))


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted HITS hubs/authorities (operators/hostrank.py host_hits)
    over the same synthetic host graph as q_hostrank. Full oracle: the
    10 mutual-reinforcement iterations — including both L2
    normalizations per iteration — unroll as a MATERIALIZED WITH chain;
    scores compare integer-exact in nano-units."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.operators.hostrank import (
        host_hits, host_link_edges,
    )

    site = build_site(**_HR_Q_SITE)
    rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
    pages = spark.createDataFrame(rows, "url string, html binary")
    scores = host_hits(host_link_edges(pages), n_iter=_HR_Q_ITER)
    return scores.select(
        "host",
        F.round(F.col("hub") * 1e9).cast("long").alias("hub_e9"),
        F.round(F.col("authority") * 1e9).cast("long").alias("auth_e9"))


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index (operators/anchors.py): the (target, anchor)
    corpus of the synthetic site's link graph with occurrence and
    endorsing-host counts. Full oracle: raw (src_host, target_host,
    target, anchor) quadruples are exported through the SAME kernels
    (extract_anchors + url_host) into VALUES; the intra-host drop, the
    length cap and the two-level aggregation are re-derived in SQL."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.operators.anchors import anchor_text_index

    site = build_site(**_HR_Q_SITE)
    rows = [(u, render_page_html(site, u).encode()) for u in site.urls()]
    pages = spark.createDataFrame(rows, "url string, html binary")
    return anchor_text_index(pages, max_len=64)


def _anchor_oracle_sql() -> str:
    """SQL replay of anchor_text_index over the kernel-exported pairs."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.kernels.htmlkit import extract_anchors
    from webcrawl_spark.kernels import urlkit

    site = build_site(**_HR_Q_SITE)
    quads: list[tuple[str, str, str, str]] = []
    for u in site.urls():
        src = urlkit.url_host(u)
        for href, text in extract_anchors(render_page_html(site, u), u):
            quads.append((src, urlkit.url_host(href), href, text))

    def q(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(
        f"('{q(a)}', '{q(b)}', '{q(c)}', '{q(d)}')" for a, b, c, d in quads)
    return (
        f"WITH pairs(src_host, target_host, target, anchor) AS "
        f"(VALUES {vals})\n"
        "SELECT target, substr(anchor, 1, 64) AS anchor,\n"
        "       count(*) AS n,\n"
        "       count(DISTINCT src_host) AS n_hosts\n"
        "FROM pairs\n"
        "WHERE target_host <> src_host AND src_host <> '' AND target <> ''\n"
        "GROUP BY target, substr(anchor, 1, 64)")


def _trap_urls() -> list[str]:
    """Deterministic URL corpus for q_trap_detect, shared by the Spark
    query and the generated SQL oracle: one calendar trap, one session-id
    trap, one clean host whose biggest template misses the population
    floor."""
    urls = [f"https://trap.example.com/cal/{y}/{m:02d}/{d:02d}"
            for y in (2023, 2024) for m in range(1, 13) for d in range(1, 8)]
    urls += [f"https://trap.example.com/{p}" for p in ("about", "contact")]
    urls += ["https://sess.example.com/s/%016x" % (i * 2654435761 % (1 << 64))
             for i in range(40)]
    urls += [f"https://sess.example.com/help/page{i}" for i in range(30)]
    urls += [f"https://clean.example.com/{s}/art{i}"
             for s in ("news", "blog") for i in range(20)]
    urls += ["https://clean.example.com", "https://clean.example.com/?q=1"]
    return urls


def q_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection (operators/traps.py): URL-template collapse
    (digit/hex runs) + the two-condition flag (population floor AND host
    share). Full oracle: the same URL corpus as VALUES; DuckDB re-derives
    the path extraction, both regexp collapses, the per-(host, template)
    aggregation and the flag logic."""
    from webcrawl_spark.operators.traps import trap_templates

    urls = spark.createDataFrame([(u,) for u in _trap_urls()],
                                 "url string")
    return (trap_templates(urls, min_urls=40, min_share=0.5)
            .select("host", "template", "n_urls", "host_urls",
                    F.round("share", 6).alias("share_r6"), "is_trap"))


def _trap_oracle_sql() -> str:
    vals = ", ".join(f"('{u}')" for u in _trap_urls())
    return f"""
WITH urls(url) AS (VALUES {vals}),
t AS (
  SELECT regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1)
           AS host,
         regexp_replace(
           regexp_replace(
             CASE WHEN regexp_extract(url,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(url,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) END,
             '[0-9a-fA-F]{{8,}}', '{{hex}}', 'g'),
           '[0-9]+', '{{n}}', 'g') AS template
  FROM urls WHERE regexp_extract(url,
    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1) <> ''),
stats AS (
  SELECT host, template, count(*) AS n_urls
  FROM t GROUP BY host, template),
totals AS (SELECT host, CAST(sum(n_urls) AS BIGINT) AS host_urls
           FROM stats GROUP BY host)
SELECT s.host, s.template, s.n_urls, tt.host_urls,
       ROUND(CAST(s.n_urls AS DOUBLE) / tt.host_urls, 6) AS share_r6,
       (s.n_urls >= 40
        AND CAST(s.n_urls AS DOUBLE) / tt.host_urls >= 0.5) AS is_trap
FROM stats s JOIN totals tt USING (host)"""


#: q_recrawl constants (shared generator — no drift between sides)
_RC_NOW = 1_700_600_000
_RC_MIN, _RC_MAX, _RC_DEF = 3600, 30 * 86400, 7 * 86400


def _recrawl_history() -> list[tuple[str, int, str]]:
    """Deterministic (url, fetch_ts, fingerprint) fetch history: varying
    fetch counts/cadences, fingerprint-change patterns from never to
    every-fetch, plus single-fetch URLs with no estimable rate."""
    rows: list[tuple[str, int, str]] = []
    for i in range(40):
        url = f"https://h{i % 5}.example.com/p{i}"
        n = 2 + (i % 6)
        step = 3600 * (1 + i % 9)
        for k in range(n):
            fp = f"v{(k * (i % 3 + 1)) // (i % 4 + 1)}"
            rows.append((url, 1_700_000_000 + k * step + i, fp))
    rows += [(f"https://h9.example.com/once{j}", 1_700_000_000 + j, "q")
             for j in range(3)]
    return rows


def q_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduling (operators/recrawl.py): Cho & Garcia-Molina
    change-rate estimation over consecutive-fetch fingerprints + the
    clamped due-time schedule. Full oracle: same history as VALUES;
    DuckDB re-derives the lag-window change detection, the lambda
    formula (ln both sides — libm vs Math.log agree far inside the e12
    rounding grid) and the clamp/default/due logic."""
    from webcrawl_spark.operators.recrawl import (
        recrawl_schedule, url_change_rates,
    )

    hist = spark.createDataFrame(
        _recrawl_history(), "url string, fetch_ts long, fingerprint string")
    out = recrawl_schedule(url_change_rates(hist), now=_RC_NOW,
                           min_interval=_RC_MIN, max_interval=_RC_MAX,
                           default_interval=_RC_DEF)
    return out.select(
        "url", "n_fetches", "n_changes", "span",
        F.coalesce(F.round(F.col("lam") * 1e12).cast("long"), F.lit(-1))
        .alias("lam_e12"),
        F.round("interval", 3).alias("interval_r3"),
        "due_now")


def _recrawl_oracle_sql() -> str:
    vals = ", ".join(f"('{u}', {t}, '{fp}')"
                     for u, t, fp in _recrawl_history())
    return f"""
WITH hist(url, ts, fp) AS (VALUES {vals}),
marked AS (
  SELECT url, ts,
         (lag(fp) OVER w IS NOT NULL AND fp <> lag(fp) OVER w) AS changed
  FROM hist WINDOW w AS (PARTITION BY url ORDER BY ts)),
stats AS (
  SELECT url, count(*) AS n_fetches,
         CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changes,
         max(ts) - min(ts) AS span, max(ts) AS last_ts
  FROM marked GROUP BY url),
rates AS (
  SELECT *, CASE WHEN n_fetches > 1 AND span > 0 THEN
      -(n_fetches - 1.0)
      * ln((n_fetches - 1.0 - n_changes + 0.5) / (n_fetches - 1.0 + 0.5))
      / span END AS lam
  FROM stats),
sched AS (
  SELECT *, CASE WHEN lam > 0 THEN
                   least(greatest(1.0 / lam, {float(_RC_MIN)}),
                         {float(_RC_MAX)})
                 WHEN lam = 0 THEN {float(_RC_MAX)}
                 ELSE {float(_RC_DEF)} END AS interval
  FROM rates)
SELECT url, n_fetches, n_changes, span,
       COALESCE(CAST(ROUND(lam * 1e12) AS BIGINT), -1) AS lam_e12,
       ROUND(interval, 3) AS interval_r3,
       (last_ts + interval <= {_RC_NOW}) AS due_now
FROM sched"""


#: q_image_plumbing synthetic-PNG constants (data-independent, shared by
#: the Spark side and the generated SQL oracle). Pixel formula:
#: gray(x, y, i) = (x*5 + y*7 + i*13) % 256. h is always ODD so n_pix
#: never carries 2^6 — no value of count/n_pix can land exactly on a
#: rounding boundary (documented in _image_oracle_sql).
_IMG_N = 25
_IMG_W = "8 + (i % 5) * 3"            # {8, 11, 14, 17, 20}
_IMG_H = "5 + ((i * 3) % 7) * 2"      # {5, 7, ..., 17} — odd
_IMG_PIX = "(x * 5 + y * 7 + i * 13) % 256"
#: JPEG rows: BLOCK-CONSTANT pixels (value fixed within each 8x8 tile) so
#: every block is DC-only and the quantize→IDCT roundtrip is EXACT by
#: arithmetic (DC = 8*(v-128) is an integer; q=2 divides it after round;
#: AC all zero) — not an empirical coincidence. The decode still runs the
#: full real pipeline (marker parse, Huffman, dequant, vectorized IDCT).
_IMG_JN = 10
_IMG_JW = "10 + (i % 4) * 9"          # {10, 19, 28, 37}
_IMG_JH = "7 + ((i * 5) % 6) * 4"     # odd
_IMG_JPIX = "(x // 8 * 11 + y // 8 * 17 + i * 29) % 256"


def q_image_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (kernels/imagekit.py + jpegkit.py): deterministic
    synthetic PNGs (from the _IMG_* seed formulas — actual zlib inflate +
    unfilter + luminance + histogram) AND JPEGs (from the _IMG_J*
    block-constant formulas — actual Huffman entropy decode + dequant +
    IDCT, cycling grayscale / 4:4:4 / 4:2:0 / restart-interval /
    progressive-SA stream shapes), plus refusal rows (arithmetic jpeg +
    webp → unsupported, garbage → error). Output is integer-exact: per-bin pixel COUNTS
    (feature[i] * n_pix rounded back to int — float32 relative error
    ~1e-7 can never move an integer by 0.5), so the DuckDB oracle
    recomputes everything from the same pixel formulas with no
    float-format hazards."""
    import numpy as np

    from webcrawl_spark.kernels.imagekit import encode_png
    from webcrawl_spark.kernels.jpegkit import (
        encode_jpeg, encode_jpeg_progressive,
    )
    from webcrawl_spark.operators.multimodal import image_features

    rows = []
    for i in range(_IMG_N):
        w = eval(_IMG_W)                      # noqa: S307 — module constants
        h = eval(_IMG_H)
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        gray = eval(_IMG_PIX).astype(np.uint8)  # noqa: S307
        rows.append((f"img{i:02d}", bytearray(encode_png(gray))))
    for i in range(_IMG_JN):
        w = eval(_IMG_JW)                     # noqa: S307
        h = eval(_IMG_JH)
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        gray = eval(_IMG_JPIX).astype(np.uint8)  # noqa: S307
        variant = i % 6
        cb = np.full_like(gray, (60 + i * 7) % 256)
        cr = np.full_like(gray, (200 - i * 5) % 256)
        if variant == 0:
            data = encode_jpeg(gray)
        elif variant == 1:
            data = encode_jpeg(gray, cb, cr)
        elif variant == 2:
            data = encode_jpeg(gray, cb, cr, subsample=True)
        elif variant == 3:
            data = encode_jpeg(gray, restart_interval=2)
        elif variant == 4:
            # progressive: spectral selection + successive approximation
            data = encode_jpeg_progressive(gray, al=1)
        else:
            data = encode_jpeg_progressive(gray, cb, cr, subsample=True,
                                           al=2)
        rows.append((f"jpg{i:02d}", bytearray(data)))
    rows.append(("img_arith", bytearray(      # arithmetic coding: refusal
        b"\xff\xd8\xff\xc9\x00\x08\x08\x00\x10\x00\x10\x00")))
    rows.append(("img_webp", bytearray(b"RIFF\x00\x10\x00\x00WEBPVP8 ")))
    rows.append(("img_bad", bytearray(b"not an image at all")))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = image_features(df, fake=False)
    npix = (F.col("width") * F.col("height")).cast("double")
    return out.select(
        "media_id", "width", "height", "format",
        (F.col("width") * F.col("height")).alias("n_pix"),
        *[F.round(F.col("feature")[b] * npix).cast("int").alias(f"c{b}")
          for b in range(8)],
    ).orderBy("media_id")


#: q_image_dhash constants: the q_image_plumbing PNG family plus a "twin"
#: per image (last two pixel columns brightened by 1) — near-duplicates
#: whose dHash bands, pair candidates, and Hamming distances the DuckDB
#: oracle recomputes from the same integer formulas.
_DHASH_MAXHAM = 16


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection end-to-end: REAL PNG decode → integer
    dHash (block-sum cross-multiplication, no float averaging) → banded
    pigeonhole pair candidates → exact Hamming verify. The oracle
    recomputes the whole chain — block sums from the _IMG_PIX formula,
    band ints, the band-equality candidate set, and bit_count Hamming —
    in pure integer SQL."""
    import numpy as np

    from webcrawl_spark.kernels.imagekit import encode_png
    from webcrawl_spark.operators.multimodal import (
        dhash_near_dup_pairs, image_dhash,
    )

    rows = []
    for i in range(_IMG_N):
        w = eval(_IMG_W)                      # noqa: S307 — module constants
        h = eval(_IMG_H)
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        gray = (eval(_IMG_PIX) % 256).astype(np.uint8)  # noqa: S307
        rows.append((f"img{i:02d}", bytearray(encode_png(gray))))
        twin = ((eval(_IMG_PIX) + (x >= w - 2) * 37) % 256).astype(np.uint8)  # noqa: S307
        rows.append((f"img{i:02d}t", bytearray(encode_png(twin))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return (
        dhash_near_dup_pairs(image_dhash(df), max_hamming=_DHASH_MAXHAM)
        .orderBy("id_a", "id_b")
    )


#: q_cdc payload constants: 20 ASCII payloads from per-doc char formulas
#: with a SHARED middle segment (positions 200-399) so cross-document
#: duplicate chunks exist; the oracle rebuilds payloads, boundaries,
#: chunk hashes, and the dup-bytes stats in SQL.
_CDC_N, _CDC_SHARED = 20, (200, 400)
_CDC_LEN = "600 + i * 37"
_CDC_CHR = "65 + (j * 7 + i * 13) % 26"       # per-doc stream
_CDC_CHR_SHARED = "65 + (j * 11) % 26"        # common segment


def q_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (the WARC-store byte-dedup
    primitive): md5-window boundaries, chunk hashes, per-doc
    duplicate-bytes stats — every stage pure integer/string work the
    DuckDB twin recomputes from the shared payload formulas."""
    from webcrawl_spark.operators.cdc import (
        cdc_chunks, duplicate_bytes_fraction,
    )

    lo, hi = _CDC_SHARED
    rows = []
    for i in range(_CDC_N):
        n = eval(_CDC_LEN)                    # noqa: S307 — module constants
        payload = bytes(
            eval(_CDC_CHR_SHARED if lo <= j < hi else _CDC_CHR,  # noqa: S307
                 None, {"i": i, "j": j})      # genexp scope can't see i
            for j in range(n))
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return duplicate_bytes_fraction(cdc_chunks(df)).orderBy("doc_id")


def q_audio_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection: REAL WAV decode → integer loudness-
    contour hash (1-D dHash over |amplitude| block sums) → the same
    banded pigeonhole pairing as images. The _AUD_* sample formulas plus
    a clipped +977 offset twin per clip are recomputed by the oracle in
    pure integer SQL."""
    import numpy as np

    from webcrawl_spark.kernels.audiokit import encode_wav
    from webcrawl_spark.operators.multimodal import (
        audio_ahash, dhash_near_dup_pairs,
    )

    rows = []
    for i in range(_AUD_N):
        rate = eval(_AUD_RATE)                # noqa: S307 — module constants
        n = eval(_AUD_LEN)                    # noqa: S307
        t = np.arange(n, dtype=np.int64)
        s = (eval(_AUD_SAMP) - 32768).astype(np.int64)  # noqa: S307
        rows.append((f"aud{i:02d}", bytearray(encode_wav(s, rate))))
        twin = np.minimum(s + 977, 32767)
        rows.append((f"aud{i:02d}t", bytearray(encode_wav(twin, rate))))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    return (
        dhash_near_dup_pairs(audio_ahash(df), max_hamming=_DHASH_MAXHAM)
        .orderBy("id_a", "id_b")
    )


#: q_audio_plumbing synthetic-WAV constants (data-independent, shared by
#: the Spark side and the generated SQL oracle). Sample formula (already
#: in the canonical 16-bit domain): s(t, i) = ((t*2657 + i*911) % 65536)
#: - 32768, so bin = (s + 32768) // 8192 = ((t*2657 + i*911) % 65536)
#: // 8192 is non-negative integer math on both sides. n is always ODD
#: (step 38 from 401) so count/n can't hit a rounding boundary.
_AUD_N = 20
_AUD_RATE = "8000 + (i % 5) * 4000"          # {8000, ..., 24000}
_AUD_LEN = "401 + i * 38"                    # odd
_AUD_SAMP = "(t * 2657 + i * 911) % 65536"   # canonical-domain + 32768


def q_audio_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (kernels/audiokit.py): deterministic synthetic
    16-bit mono WAVs built from the _AUD_* seed formulas are decoded by the
    engine (fake=False — actual RIFF walk + amplitude histogram), plus two
    refusal rows (mp3 → unsupported, garbage → error). Output is
    integer-exact per-bin sample COUNTS (feature[b] * n_samples rounded
    back to int), so the DuckDB oracle recomputes everything from the same
    sample formula with no float hazards."""
    import numpy as np

    from webcrawl_spark.kernels.audiokit import encode_wav
    from webcrawl_spark.operators.multimodal import audio_features

    rows = []
    for i in range(_AUD_N):
        rate = eval(_AUD_RATE)                # noqa: S307 — module constants
        n = eval(_AUD_LEN)
        t = np.arange(n)
        samples = eval(_AUD_SAMP) - 32768     # noqa: S307
        rows.append((f"aud{i:02d}", bytearray(encode_wav(samples, rate))))
    rows.append(("aud_mp3", bytearray(b"\xff\xfb\x90\x00 not real mpeg")))
    rows.append(("aud_bad", bytearray(b"not audio at all")))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = audio_features(df, fake=False)
    nsamp = F.col("n_samples").cast("double")
    return out.select(
        "media_id", "sample_rate", "n_samples", "format",
        *[F.round(F.col("feature")[b] * nsamp).cast("int").alias(f"c{b}")
          for b in range(8)],
    ).orderBy("media_id")


#: q_video_plumbing synthetic-MP4 constants (data-independent, shared by
#: the Spark side and the generated SQL oracle). Durations are exact
#: milliseconds at timescale 1000, so duration_ms round-trips as an
#: integer with no float hazards; n_frames mirrors frame_sample_plan's
#: greatest(floor(duration * fps), 1) at fps = 0.5.
_VID_N = 15
_VID_MS = "1500 + i * 777"
_VID_W = "160 * (1 + i % 4)"
_VID_H = "90 * (1 + i % 3)"
_VID_CODECS = ("avc1", "hev1", "av01")
#: WebM family (EBML walk): integer-ms durations at the default 1e6-ns
#: timestamp scale round-trip exactly through the stored float64.
_VID_WN = 6
_VID_WMS = "2200 + i * 911"
_VID_WW = "128 * (1 + i % 3)"
_VID_WH = "72 * (1 + i % 2)"
_VID_WCODECS = ("V_VP8", "V_VP9", "V_AV1")


def q_video_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video metadata (kernels/videokit.py): deterministic synthetic
    MP4s (ISO-BMFF box walk, mvhd v0/v1 alternating) AND WebM files (EBML
    varint walk, Segment>Info duration + video TrackEntry dims/codec),
    both from the _VID_* seed formulas, composed with frame_sample_plan
    at fps=0.5, plus refusal rows (avi → unsupported, garbage → error).
    All output columns are integers/strings — exact."""
    from webcrawl_spark.kernels.videokit import build_mp4, build_webm
    from webcrawl_spark.operators.multimodal import (
        frame_sample_plan, video_metadata,
    )

    rows = []
    for i in range(_VID_N):
        ms = eval(_VID_MS)                    # noqa: S307 — module constants
        w = eval(_VID_W)                      # noqa: S307
        h = eval(_VID_H)                      # noqa: S307
        rows.append((f"vid{i:02d}", bytearray(build_mp4(
            ms / 1000.0, timescale=1000, width=w, height=h,
            codec=_VID_CODECS[i % 3], mvhd_version=i % 2))))
    for i in range(_VID_WN):
        ms = eval(_VID_WMS)                   # noqa: S307
        w = eval(_VID_WW)                     # noqa: S307
        h = eval(_VID_WH)                     # noqa: S307
        rows.append((f"vidw{i:02d}", bytearray(build_webm(
            ms / 1000.0, width=w, height=h,
            codec=_VID_WCODECS[i % 3]))))
    rows.append(("vid_avi", bytearray(b"RIFF\x00\x00\x00\x00AVI LIST")))
    rows.append(("vid_bad", bytearray(b"not a video")))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    meta = video_metadata(df)
    plan = frame_sample_plan(
        meta.filter(F.col("duration_s").isNotNull()), fps=0.5)
    counts = plan.groupBy("media_id").agg(
        F.count("*").cast("int").alias("n_frames"))
    return meta.join(counts, "media_id", "left").select(
        "media_id",
        F.round(F.col("duration_s") * 1000).cast("int").alias("duration_ms"),
        "width", "height", "codec", "format", "n_frames",
    ).orderBy("media_id")


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition signals: duplicate 2/3-gram
    fractions + top-word fraction (linear sorted-run fold, no shuffle)."""
    from webcrawl_spark.operators.textstats import repetition_stats

    docs = _load(spark, sf_dir, "documents")["documents"]
    stats = repetition_stats(F.col("text"))
    return docs.select(
        "doc_id",
        stats["n_words"].alias("n_words"),
        F.round(stats["dup_2gram_frac"], 6).alias("dup_2gram_frac"),
        F.round(stats["dup_3gram_frac"], 6).alias("dup_3gram_frac"),
        F.round(stats["top_word_frac"], 6).alias("top_word_frac"),
    ).orderBy("doc_id")


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: deterministic per-doc email/IP/card/phone suffixes are
    appended (documents carry none natively), then redacted with the
    chained native regexp passes."""
    from webcrawl_spark.operators.textstats import redact_pii

    docs = _load(spark, sf_dir, "documents")["documents"]
    suffix = F.format_string(
        " contact u%d@mail.example.com or 10.0.%d.7,"
        " card 4111111111%06d, tel +1 (555) %03d-0199",
        F.col("doc_id"), F.pmod(F.col("doc_id"), F.lit(256)),
        F.pmod(F.col("doc_id"), F.lit(1000000)),
        F.pmod(F.col("doc_id"), F.lit(1000)),
    )
    seeded = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("seeded"))
    return seeded.select(
        "doc_id", redact_pii(F.col("seeded")).alias("clean_text")
    ).orderBy("doc_id")


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet-style): documents are given a
    line structure by splitting on ' the ', then lines shared by >= 8
    distinct docs are dropped corpus-wide."""
    from webcrawl_spark.operators.dedup import remove_boilerplate_lines

    docs = _load(spark, sf_dir, "documents")["documents"]
    structured = docs.select(
        "doc_id", F.regexp_replace("text", " the ", "\n").alias("text"))
    out = remove_boilerplate_lines(structured, min_docs=8)
    return out.select(
        "doc_id", F.col("text").alias("clean_text"), "n_lines_removed"
    ).orderBy("doc_id")


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per (source, lang): the numbers a
    data-mixing decision reads."""
    from webcrawl_spark.operators.corpus import corpus_mixture

    docs = _load(spark, sf_dir, "documents")["documents"]
    return corpus_mixture(docs).orderBy("source", "lang")


def q_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (hash-salted md5 draw): per-lang
    rates with a default for unlisted strata — reproducible across runs,
    partitionings and cluster sizes, and exactly recomputable in SQL."""
    from webcrawl_spark.operators.corpus import stratified_sample

    docs = _load(spark, sf_dir, "documents")["documents"]
    out = stratified_sample(docs, {"en": 0.8, "de": 0.5},
                            strata_col="lang", default_frac=0.25)
    return out.select("doc_id", "lang").orderBy("doc_id")


def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (32-word windows, 8-word overlap) — the
    embedding/context-packing prep step."""
    from webcrawl_spark.operators.corpus import chunk_documents

    docs = _load(spark, sf_dir, "documents")["documents"]
    return chunk_documents(docs, max_words=32, overlap=8) \
        .orderBy("doc_id", "chunk_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_admission_reasons": q_admission_reasons,
        "q_frontier_antijoin": q_frontier_antijoin,
        "q_perhost_topk": q_perhost_topk,
        "q_fifo_head": q_fifo_head,
        "q_round_metrics": q_round_metrics,
        "q_brand_revenue": q_brand_revenue,
        "q_segment_top_orders": q_segment_top_orders,
        "q_union_dedup": q_union_dedup,
        "q_norm_dedup": q_norm_dedup,
        "q_hourly_events": q_hourly_events,
        "q_token_stats": q_token_stats,
        "q_quality_filter": q_quality_filter,
        "q_lang_id": q_lang_id,
        "q_exact_dedup_docs": q_exact_dedup_docs,
        "q_cosine_topk": q_cosine_topk,
        "q_engpicker": q_engpicker,
        "q_pdf_text": q_pdf_text,
        "q_doc_convert": q_doc_convert,
        "q_docx_notes": q_docx_notes,
        "q_minhash_oracle": q_minhash_oracle,
        "q_dup_groups": q_dup_groups,
        "q_dup_degree_cap": q_dup_degree_cap,
        "q_ssrf_classify": q_ssrf_classify,
        "q_embed_neardup": q_embed_neardup,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_simhash_pairs": q_simhash_pairs,
        "q_minhash_dedup": q_minhash_dedup,
        "q_ann_topk": q_ann_topk,
        "q_crawl_round": q_crawl_round,
        "q_hostrank": q_hostrank,
        "q_hits": q_hits,
        "q_anchor_text": q_anchor_text,
        "q_trap_detect": q_trap_detect,
        "q_recrawl": q_recrawl,
        "q_image_plumbing": q_image_plumbing,
        "q_audio_plumbing": q_audio_plumbing,
        "q_video_plumbing": q_video_plumbing,
        "q_repetition": q_repetition,
        "q_pii_redact": q_pii_redact,
        "q_line_dedup": q_line_dedup,
        "q_corpus_mixture": q_corpus_mixture,
        "q_sample_mix": q_sample_mix,
        "q_chunking": q_chunking,
        "q_ivf_topk": q_ivf_topk,
        "q_semdedup": q_semdedup,
        "q_quality_clf": q_quality_clf,
        "q_image_dhash": q_image_dhash,
        "q_audio_ahash": q_audio_ahash,
        "q_cdc": q_cdc,
        "q_bigram_ppl": q_bigram_ppl,
        "q_decontaminate": q_decontaminate,
        "q_gopher_quality": q_gopher_quality,
        "q_interdup": q_interdup,
        "q_c4_quality": q_c4_quality,
        "q_ccnet_normalize": q_ccnet_normalize,
        "q_perplexity": q_perplexity,
        "q_dsir": q_dsir,
        "q_seq_pack": q_seq_pack,
        "q_passage_removal": q_passage_removal,
    }


_WORDS_SQL = r"list_filter(regexp_split_to_array(lower({col}), '[^\w]+'), x -> x != '')"

_EN_STOP = "['the','and','of','to','in','is','that','it','for','with']"
_DE_STOP = "['der','die','und','das','nicht','ist','ich','ein','mit','zu']"
_FR_STOP = "['le','la','les','et','des','est','une','dans','que','pour']"
_ES_STOP = "['el','la','los','las','que','de','en','una','por','con']"


def _quality_sql(col: str) -> str:
    words = _WORDS_SQL.format(col=col)
    return f"""(
      CASE WHEN length({col}) BETWEEN 200 AND 100000 THEN 0.4 ELSE 0.0 END
      + CASE WHEN length({col}) > 0
             AND (length({col}) - length(regexp_replace({col}, '[.,;:!?]', '', 'g')))::DOUBLE / length({col}) > 0.001
             AND (length({col}) - length(regexp_replace({col}, '[.,;:!?]', '', 'g')))::DOUBLE / length({col}) < 0.2
             THEN 0.2 ELSE 0.0 END
      + CASE WHEN len(list_intersect({words}, {_EN_STOP})) >= 2 THEN 0.2 ELSE 0.0 END
      + CASE WHEN len({words}) >= 30 THEN 0.2 ELSE 0.0 END
    )"""


def _minhash_pairs_cte() -> str:
    """The md5-shingle + HUGEINT-permutation pair derivation shared by the
    minhash dedup oracle and the dup-groups (connected components) oracle —
    one source of truth, constants imported from the operator."""
    from webcrawl_spark.operators.dedup import minhash_md5_params

    values = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_md5_params(32, seed=1))
    )
    return f"""
        N AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n0
          FROM documents
        ), NN AS (
          SELECT doc_id,
                 CASE WHEN length(n0) < 5 THEN rpad(n0, 5, ' ')
                      ELSE n0 END AS norm
          FROM N
        ), S AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(0, length(norm) - 4),
                   i -> substring(norm, (i+1)::INT, 5)))) AS sh
          FROM NN
        ), H AS (
          SELECT doc_id, ('0x' || substr(md5(sh), 1, 16))::UBIGINT AS h
          FROM S
        ), P(p, a, b) AS (VALUES {values}),
        M AS (
          SELECT doc_id, p,
                 min(((a::HUGEINT * h::HUGEINT + b)
                      % 18446744073709551616)::UBIGINT) AS mh
          FROM H CROSS JOIN P GROUP BY doc_id, p
        ), pairs AS (
          SELECT x.doc_id AS da, y.doc_id AS db
          FROM M x JOIN M y ON x.p = y.p AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id
          HAVING sum((x.mh = y.mh)::INT)::DOUBLE / 32 >= 0.8
        )"""


def _minhash_oracle_sql() -> str:
    """Brute-force twin of q_minhash_oracle: same md5 shingles, same (a,b)
    constants (imported from the operator so they can't drift), mod-2^64 in
    HUGEINT; pairs by exact signature agreement >= threshold. Valid because
    the query's LSH config is an exact pigeonhole (see q_minhash_oracle)."""
    return f"""
        WITH {_minhash_pairs_cte()}
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT db FROM pairs)
        ORDER BY doc_id
    """


def _dup_groups_oracle_sql() -> str:
    """Connected components over the SAME oracle pair set via a recursive
    CTE (transitive closure, min reachable id per node) — the exact twin
    of q_dup_groups' distributed label propagation."""
    return f"""
        WITH RECURSIVE {_minhash_pairs_cte()},
        nodes AS (
          SELECT da AS id FROM pairs UNION SELECT db FROM pairs
        ), edges AS (
          SELECT da AS a, db AS b FROM pairs
          UNION ALL SELECT db, da FROM pairs
        ), reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
        )
        SELECT id AS doc, min(r) AS component
        FROM reach GROUP BY id ORDER BY doc
    """


_DUP_DEGREE_CAP_ORACLE_SQL = """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT least(o_custkey, o_orderkey) AS da,
                      greatest(o_custkey, o_orderkey) AS db
      FROM orders WHERE o_custkey != o_orderkey AND o_custkey <= 300
    ), nodes AS (
      SELECT da AS id FROM pairs UNION SELECT db FROM pairs
    ), sym AS (
      SELECT da AS a, db AS b FROM pairs
      UNION SELECT db, da FROM pairs
    ), capped AS (
      SELECT a, b FROM (
        SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b) AS rn
        FROM sym) WHERE rn <= 4
    ), reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT c.a, reach.r FROM capped c JOIN reach ON c.b = reach.id
    )
    SELECT id AS doc, min(r) AS component
    FROM reach GROUP BY id ORDER BY doc
"""
def _embed_neardup_oracle_sql() -> str:
    """Bucketed near-dup twin: sign-bit buckets from the shared hyperplane
    constants, bucket self-join with vec_id ordering, exact cosine — the
    same sequential summation the ann oracle already proved
    order-identical across engines."""
    import numpy as np  # noqa: F401  (parity with _ann_oracle_sql imports)

    from webcrawl_spark.operators.similarity import _hyperplanes

    n_bits, seed, dim = 6, 7, 64
    planes = _hyperplanes(dim, n_bits, seed)
    bits = " + ".join(
        "(CASE WHEN ("
        + " + ".join(f"embedding[{i + 1}]*({planes[j, i]!r})"
                     for i in range(dim))
        + f") > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
        WITH b AS (
          SELECT vec_id, embedding, ({bits}) AS bucket,
                 sqrt(list_aggregate(
                   list_transform(embedding, x -> x*x), 'sum')) AS nrm
          FROM embeddings
        ), pairs AS (
          SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
                 list_aggregate(list_transform(range(1, {dim + 1}),
                   i -> x.embedding[i::INT] * y.embedding[i::INT]), 'sum')
                 / (x.nrm * y.nrm) AS cosine
          FROM b x JOIN b y
            ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        )
        SELECT DISTINCT doc_a, doc_b, round(cosine, 6) AS cosine
        FROM pairs WHERE cosine >= 0.18
        ORDER BY doc_a, doc_b
    """


_NGRAM_JACCARD_ORACLE_SQL = r"""
    WITH W AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents WHERE doc_id < 200 AND trim(text) != ''
    ), G AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(w) - 3, 0) + 1),
               i -> array_to_string(w[(i+1)::INT:(i+3)::INT], ' '))) AS g
      FROM W
    ), P AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.g, b.g))::DOUBLE
             / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
      FROM G a JOIN G b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
    FROM P WHERE jaccard >= 0.3
    ORDER BY doc_a, doc_b
"""
# q_dup_degree_cap oracle: the same cap derivation as
# dup_components(max_degree=4) — symmetrize, row_number per node ordered by
# neighbor id, keep 4; directed pull edges, NOT re-symmetrized. label(u) =
# min id reachable along pull edges = the distributed min-label +
# pointer-doubling fixpoint.


_SSRF_ORACLE_SQL = """
    WITH hosts AS (
      SELECT CASE c_custkey % 10
        WHEN 0 THEN '10.' || (c_custkey % 200)::VARCHAR || '.'
                    || ((c_custkey * 7) % 200)::VARCHAR || '.'
                    || (c_custkey % 250 + 1)::VARCHAR
        WHEN 1 THEN 'site' || c_custkey::VARCHAR || '.example.com'
        WHEN 2 THEN '192.168.' || (c_custkey % 200)::VARCHAR || '.'
                    || (c_custkey % 250 + 1)::VARCHAR
        WHEN 3 THEN 'svc' || c_custkey::VARCHAR || '.localhost'
        WHEN 4 THEN '172.' || (16 + c_custkey % 16)::VARCHAR || '.'
                    || (c_custkey % 200)::VARCHAR || '.'
                    || (c_custkey % 250 + 1)::VARCHAR
        WHEN 5 THEN '8.' || (c_custkey % 200)::VARCHAR || '.'
                    || ((c_custkey * 3) % 200)::VARCHAR || '.'
                    || (c_custkey % 250 + 1)::VARCHAR
        WHEN 6 THEN 'api' || c_custkey::VARCHAR || '.internal'
        WHEN 7 THEN '169.254.' || (c_custkey % 200)::VARCHAR || '.'
                    || (c_custkey % 250 + 1)::VARCHAR
        WHEN 8 THEN '100.' || (64 + c_custkey % 64)::VARCHAR || '.'
                    || (c_custkey % 200)::VARCHAR || '.'
                    || (c_custkey % 250 + 1)::VARCHAR
        ELSE '172.' || (32 + c_custkey % 100)::VARCHAR || '.'
             || (c_custkey % 200)::VARCHAR || '.'
             || (c_custkey % 250 + 1)::VARCHAR
      END AS host
      FROM customer
    )
    SELECT host,
           CASE
             WHEN host = 'localhost'
               OR host LIKE '%.localhost'
               OR host LIKE '%.local'
               OR host LIKE '%.internal' THEN TRUE
             WHEN regexp_matches(host, '^\\d+\\.\\d+\\.\\d+\\.\\d+$') THEN
                  (split_part(host, '.', 1)::INT IN (0, 10, 127))
               OR (split_part(host, '.', 1)::INT = 192
                   AND split_part(host, '.', 2)::INT = 168)
               OR (split_part(host, '.', 1)::INT = 172
                   AND split_part(host, '.', 2)::INT BETWEEN 16 AND 31)
               OR (split_part(host, '.', 1)::INT = 169
                   AND split_part(host, '.', 2)::INT = 254)
               OR (split_part(host, '.', 1)::INT = 100
                   AND split_part(host, '.', 2)::INT BETWEEN 64 AND 127)
               OR (split_part(host, '.', 1)::INT >= 224)
             ELSE FALSE
           END AS unsafe
    FROM hosts ORDER BY host
"""


def _ann_oracle_sql() -> str:
    """Full twin of q_ann_topk: recompute the sign-bit bucket of every
    embedding from the SAME hyperplane constants the Spark UDF uses
    (imported, not copied — they cannot drift), keep only the query's probed
    buckets (base + all 1-bit flips, computed here with the same helper),
    then exact-rerank by cosine. The top-k cut orders by the UNROUNDED
    cosine (the inner subquery) so tie-breaking matches the Spark side
    exactly; rounding happens only in the final projection. Sign flips from
    float summation-order differences would need |dot| ≲ 1e-13 — verified
    exact at sf0.001/0.01/0.1."""
    import numpy as np

    from webcrawl_spark.operators.similarity import (
        _hyperplanes, _query_buckets,
    )

    n_bits, seed, dim, k = 8, 7, 64, 10
    planes = _hyperplanes(dim, n_bits, seed)
    q = np.zeros(dim)
    q[0] = 1.0
    targets = sorted(set(_query_buckets(q, planes, n_bits, probe_flips=1)))
    bits = " + ".join(
        "(CASE WHEN ("
        + " + ".join(f"embedding[{i + 1}]*({planes[j, i]!r})"
                     for i in range(dim))
        + f") > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
        WITH b AS (
          SELECT vec_id,
                 embedding[1] / sqrt(list_aggregate(
                   list_transform(embedding, x -> x*x), 'sum')) AS cosine,
                 ({bits}) AS bucket
          FROM embeddings)
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT vec_id, cosine
          FROM b WHERE bucket IN ({', '.join(map(str, targets))})
          ORDER BY cosine DESC, vec_id ASC LIMIT {k}
        )
    """


_SIMHASH_ORACLE_SQL = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                x -> x != '')) AS tok
      FROM documents WHERE trim(text) != ''
    ), th AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
      FROM toks
    ), bits AS (
      SELECT doc_id, bb.b AS b,
             sum(((h >> bb.b) & 1)::INT) AS ones, count(*) AS n
      FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
      GROUP BY doc_id, bb.b
    ), sims AS (
      SELECT doc_id,
             bit_or(CASE WHEN 2*ones > n THEN (1::UBIGINT << b)
                         ELSE 0::UBIGINT END) AS sim
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sim, b.sim))::INT AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    ORDER BY doc_a, doc_b
"""


def _pii_oracle_sql() -> str:
    """Chained regexp_replace twin built from the SAME pattern table the
    Spark operator uses (textstats._PII_PATTERNS) — one source of truth;
    patterns are lookaround-free so Java and RE2 agree."""
    from webcrawl_spark.operators.textstats import _PII_PATTERNS

    expr = "seeded"
    for pat, token in _PII_PATTERNS:
        expr = ("regexp_replace({e}, '{p}', '{t}', 'g')"
                .format(e=expr, p=pat.replace("'", "''"), t=token))
    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 text || printf(
                   ' contact u%d@mail.example.com or 10.0.%d.7,'
                   ' card 4111111111%06d, tel +1 (555) %03d-0199',
                   doc_id, doc_id % 256, doc_id % 1000000, doc_id % 1000)
                 AS seeded
          FROM documents)
        SELECT doc_id, {expr} AS clean_text
        FROM seeded ORDER BY doc_id
    """


_REPETITION_ORACLE_SQL = f"""
    WITH w AS (
      SELECT doc_id,
             unnest({_WORDS_SQL.format(col="text")}) AS word,
             generate_subscripts({_WORDS_SQL.format(col="text")}, 1) AS pos
      FROM documents
    ), tw AS (
      SELECT doc_id, count(*) AS n_words FROM w GROUP BY doc_id
    ), tc AS (
      SELECT doc_id, max(cnt) AS top_cnt
      FROM (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word)
      GROUP BY doc_id
    ), g2 AS (
      SELECT doc_id, count(*)::DOUBLE AS n, count(DISTINCT gram)::DOUBLE AS d
      FROM (SELECT doc_id,
                   word || ' ' || lead(word) OVER
                     (PARTITION BY doc_id ORDER BY pos) AS gram
            FROM w)
      WHERE gram IS NOT NULL GROUP BY doc_id
    ), g3 AS (
      SELECT doc_id, count(*)::DOUBLE AS n, count(DISTINCT gram)::DOUBLE AS d
      FROM (SELECT doc_id,
                   word || ' ' || lead(word, 1) OVER
                     (PARTITION BY doc_id ORDER BY pos)
                        || ' ' || lead(word, 2) OVER
                     (PARTITION BY doc_id ORDER BY pos) AS gram
            FROM w)
      WHERE gram IS NOT NULL GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(tw.n_words, 0) AS n_words,
           round(coalesce((g2.n - g2.d) / g2.n, 0), 6) AS dup_2gram_frac,
           round(coalesce((g3.n - g3.d) / g3.n, 0), 6) AS dup_3gram_frac,
           round(coalesce(tc.top_cnt::DOUBLE / tw.n_words, 0), 6)
             AS top_word_frac
    FROM documents d
    LEFT JOIN tw USING (doc_id)
    LEFT JOIN tc USING (doc_id)
    LEFT JOIN g2 USING (doc_id)
    LEFT JOIN g3 USING (doc_id)
    ORDER BY d.doc_id
"""


_LINE_DEDUP_ORACLE_SQL = """
    WITH structured AS (
      SELECT doc_id, regexp_replace(text, ' the ', chr(10), 'g') AS t
      FROM documents
    ), lines AS (
      SELECT doc_id,
             unnest(string_split(t, chr(10))) AS line,
             generate_subscripts(string_split(t, chr(10)), 1) AS pos
      FROM structured
    ), keys AS (
      SELECT doc_id, pos, line, trim(lower(line)) AS k FROM lines
    ), bl AS (
      SELECT k FROM keys WHERE k <> ''
      GROUP BY k HAVING count(DISTINCT doc_id) >= 8
    ), kept AS (
      SELECT doc_id, pos, line FROM keys
      WHERE k NOT IN (SELECT k FROM bl)
    ), rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*) AS n_lines FROM keys GROUP BY doc_id
    )
    SELECT s.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           (t2.n_lines - coalesce(r.n_kept, 0)) AS n_lines_removed
    FROM structured s
    JOIN totals t2 USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY s.doc_id
"""


def _sample_mix_oracle_sql() -> str:
    """Thresholds derived exactly as the operator derives them
    (int(frac * 2^32)); the md5-prefix draw is recomputed in SQL."""
    buckets = 1 << 32
    t = {"en": int(0.8 * buckets), "de": int(0.5 * buckets),
         "_": int(0.25 * buckets)}
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || substr(md5('s0' || doc_id::VARCHAR), 1, 8))::UBIGINT
              < CASE WHEN lang = 'en' THEN {t['en']}
                     WHEN lang = 'de' THEN {t['de']}
                     ELSE {t['_']} END
        ORDER BY doc_id
    """


_CORPUS_MIXTURE_ORACLE_SQL = f"""
    WITH per AS (
      SELECT source, lang, count(*) AS n_docs,
             sum(len({_WORDS_SQL.format(col="text")}))::BIGINT AS n_words,
             sum(length(text))::BIGINT AS n_chars
      FROM documents GROUP BY source, lang)
    SELECT source, lang, n_docs, n_words, n_chars,
           round(n_words::DOUBLE / (SELECT sum(n_words) FROM per), 6)
             AS word_share
    FROM per ORDER BY source, lang
"""


_CHUNKING_ORACLE_SQL = f"""
    WITH w AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) > 32 THEN
               (len(ws) - 32) + ((24 - (len(ws) - 32) % 24) % 24)
             ELSE 0 END AS last_start
      FROM (SELECT doc_id, {_WORDS_SQL.format(col="text")} AS ws
            FROM documents)
    ), starts AS (
      SELECT doc_id, ws,
             unnest(range(0, last_start + 1, 24)) AS s,
             generate_subscripts(range(0, last_start + 1, 24), 1) AS cid
      FROM w WHERE len(ws) > 0
    )
    SELECT doc_id, cid - 1 AS chunk_id,
           array_to_string(list_slice(ws, s + 1, s + 32), ' ') AS chunk_text,
           len(list_slice(ws, s + 1, s + 32)) AS n_words_chunk
    FROM starts ORDER BY doc_id, chunk_id
"""


def _c4_oracle_sql() -> str:
    """Twin of q_c4_quality built from the SAME constants the operator
    uses (imported, not copied)."""
    from webcrawl_spark.operators import textstats as ts

    bad = "[" + ", ".join(f"'{w}'" for w in ts.C4_BAD_WORDS) + "]"
    words = _WORDS_SQL.format(col="text")
    line_ok = rf"""x -> regexp_matches(trim(x), '{ts.C4_TERMINAL_RE}')
                 AND len(list_filter(regexp_split_to_array(trim(x), '\s+'),
                                     w -> w != ''))
                     >= {ts.C4_MIN_WORDS_PER_LINE}
                 AND NOT contains(lower(trim(x)), 'javascript')"""
    flags = {
        "ok_sentences": (
            f"len(regexp_extract_all(c4_text, '[.!?]'))"
            f" >= {ts.C4_MIN_SENTENCES}"),
        "ok_lorem": "NOT contains(lower(text), 'lorem ipsum')",
        "ok_brace": "NOT contains(text, chr(123))",
        "ok_badwords": f"len(list_intersect({words}, {bad})) = 0",
    }
    cols = ",\n          ".join(f"({sql}) AS {name}"
                                for name, sql in flags.items())
    conj = " AND ".join(f"({sql})" for sql in flags.values())
    return rf"""
        WITH base AS (
          SELECT doc_id, text,
                 -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
                 coalesce(array_to_string(
                   list_filter(
                     list_transform(string_split(text, chr(10)),
                                    x -> trim(x)),
                     {line_ok}),
                   chr(10)), '') AS c4_text
          FROM documents
        )
        SELECT doc_id, c4_text,
          {cols},
          ({conj}) AS c4_pass
        FROM base ORDER BY doc_id
    """


_CCNET_NORMALIZE_ORACLE_SQL = r"""
    WITH n AS (
      SELECT doc_id,
        trim(regexp_replace(regexp_replace(regexp_replace(
          lower(text), '[0-9]', '0', 'g'),
          '[^a-z0-9\s]', ' ', 'g'),
          '\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id, length(norm) AS norm_len, md5(norm) AS norm_key,
           count(*) OVER (PARTITION BY md5(norm)) AS n_dups
    FROM n ORDER BY doc_id
"""


def _passage_removal_oracle_sql(n: int = 7) -> str:
    """Twin of q_passage_removal: duplicate windows found on the gram
    STRINGS (no xxhash64 in DuckDB), coverage cut via a nested list
    comprehension; positions are 1-based here vs 0-based in Spark, same
    span semantics."""
    words = _WORDS_SQL.format(col="text")
    return f"""
        WITH cw AS (
          SELECT doc_id, {words} AS ws FROM documents
        ), cg AS (
          SELECT doc_id, ws,
                 unnest(range(1, greatest(len(ws) - {n - 2}, 1)))::INT AS pos
          FROM cw
        ), cg2 AS (
          SELECT doc_id, pos,
                 array_to_string(list_slice(ws, pos, pos + {n - 1}), ' ')
                   AS gram
          FROM cg
        ), shared AS (
          SELECT gram FROM cg2 GROUP BY gram
          HAVING count(DISTINCT doc_id) >= 2
        ), fl AS (
          SELECT doc_id, list(pos ORDER BY pos) AS flagged
          FROM cg2 JOIN shared USING (gram) GROUP BY doc_id
        ), kept AS (
          SELECT c.doc_id, len(c.ws) AS nw,
                 [c.ws[j] FOR j IN range(1, len(c.ws) + 1)
                  IF len(list_filter(coalesce(f.flagged, []),
                                     p -> p <= j AND p >= j - {n - 1})) = 0]
                   AS kw
          FROM cw c LEFT JOIN fl f USING (doc_id)
        )
        SELECT doc_id,
               coalesce(array_to_string(kw, ' '), '') AS clean_text,
               nw AS n_words,
               nw - len(kw) AS n_removed
        FROM kept ORDER BY doc_id
    """


def _perplexity_oracle_sql() -> str:
    """Twin of q_perplexity: recompute the unigram LM, the add-1 scores
    and the quantile_cont percentile cutoffs (same literal probabilities
    as the operator's defaults) entirely in SQL."""
    words = _WORDS_SQL.format(col="text")
    p1, p2 = repr(1 / 3), repr(2 / 3)
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({words}) AS token FROM documents
        ), lm AS (
          SELECT token, count(*) AS cnt FROM toks GROUP BY token
        ), tot AS (
          SELECT sum(cnt)::DOUBLE AS n, count(*)::DOUBLE AS v FROM lm
        ), sc AS (
          SELECT t.doc_id, count(*) AS n_tokens,
                 sum(CASE WHEN l.cnt IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_oov,
                 avg(ln(coalesce(l.cnt, 0) + 1.0)
                     - ln((SELECT n FROM tot)
                          + 1.0 * ((SELECT v FROM tot) + 1))) AS avg_lp
          FROM toks t LEFT JOIN lm l USING (token) GROUP BY t.doc_id
        ), scored AS (
          SELECT d.doc_id,
                 coalesce(s.n_tokens, 0) AS n_tokens,
                 coalesce(s.n_oov, 0) AS n_oov,
                 CAST(round(s.avg_lp * 1e9, 0) AS BIGINT) AS avg_lp_nano,
                 CAST(round(exp(-s.avg_lp) * 1e9, 0) AS BIGINT) AS ppl_nano
          FROM documents d LEFT JOIN sc s USING (doc_id)
        ), cuts AS (
          SELECT quantile_cont(ppl_nano, {p1}) AS c1,
                 quantile_cont(ppl_nano, {p2}) AS c2
          FROM scored WHERE ppl_nano IS NOT NULL
        )
        SELECT doc_id, n_tokens, n_oov, avg_lp_nano, ppl_nano,
               CASE WHEN ppl_nano IS NULL THEN NULL
                    WHEN ppl_nano <= (SELECT c1 FROM cuts) THEN 'head'
                    WHEN ppl_nano <= (SELECT c2 FROM cuts) THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM scored ORDER BY doc_id
    """


def _bigram_ppl_oracle_sql() -> str:
    """Twin of q_bigram_ppl: the dsir bigram-stream comprehension, gram
    and context counts, the conditional add-1 score, nano grid,
    quantile_cont buckets."""
    words = _WORDS_SQL.format(col="text")
    p1, p2 = repr(1 / 3), repr(2 / 3)
    return f"""
        WITH cw AS (
          SELECT doc_id, {words} AS ws FROM documents
        ), grams AS (
          SELECT doc_id, unnest(
            [array_to_string(list_slice(ws, i, i + 1), ' ')
             FOR i IN range(1, greatest(len(ws) - 0, 1))]) AS gram
          FROM cw
        ), lm AS (
          SELECT gram, count(*) AS cnt FROM grams GROUP BY gram
        ), ctx AS (
          SELECT split_part(gram, ' ', 1) AS w1, sum(cnt) AS ctx_cnt
          FROM lm GROUP BY split_part(gram, ' ', 1)
        ), vc AS (
          SELECT count(DISTINCT split_part(gram, ' ', 2))::DOUBLE AS v
          FROM lm
        ), sc AS (
          SELECT g.doc_id, count(*) AS n_bigrams,
                 sum(CASE WHEN l.cnt IS NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_oov,
                 avg(ln(coalesce(l.cnt, 0) + 1.0)
                     - ln(coalesce(c.ctx_cnt, 0)
                          + 1.0 * ((SELECT v FROM vc) + 1))) AS avg_lp
          FROM grams g LEFT JOIN lm l USING (gram)
          LEFT JOIN ctx c ON c.w1 = split_part(g.gram, ' ', 1)
          GROUP BY g.doc_id
        ), scored AS (
          SELECT d.doc_id,
                 coalesce(s.n_bigrams, 0) AS n_bigrams,
                 coalesce(s.n_oov, 0) AS n_oov,
                 CAST(round(s.avg_lp * 1e9, 0) AS BIGINT) AS avg_lp_nano,
                 CAST(round(exp(-s.avg_lp) * 1e9, 0) AS BIGINT) AS ppl_nano
          FROM documents d LEFT JOIN sc s USING (doc_id)
        ), cuts AS (
          SELECT quantile_cont(ppl_nano, {p1}) AS c1,
                 quantile_cont(ppl_nano, {p2}) AS c2
          FROM scored WHERE ppl_nano IS NOT NULL
        )
        SELECT doc_id, n_bigrams, n_oov, avg_lp_nano, ppl_nano,
               CASE WHEN ppl_nano IS NULL THEN NULL
                    WHEN ppl_nano <= (SELECT c1 FROM cuts) THEN 'head'
                    WHEN ppl_nano <= (SELECT c2 FROM cuts) THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM scored ORDER BY doc_id
    """


def _dsir_oracle_sql() -> str:
    """Twin of q_dsir: same md5-salted bucket draw, same add-1 smoothed
    log-ratio table, recomputed over the parquet in SQL."""
    from webcrawl_spark.operators import lm as lmmod  # noqa: F401 (parity anchor)

    words = _WORDS_SQL.format(col="text")
    nb = 4096
    return f"""
        WITH cw AS (
          SELECT doc_id, lang, {words} AS ws FROM documents
        ), grams AS (
          SELECT doc_id, lang,
                 ('0x' || substr(md5('dsir' || unnest(
                    [array_to_string(list_slice(ws, i, i + 1), ' ')
                     FOR i IN range(1, greatest(len(ws) - 0, 1))])), 1, 8)
                 )::UBIGINT % {nb} AS bucket
          FROM cw
        ), tgt AS (
          SELECT bucket, count(*)::DOUBLE AS cnt_t FROM grams
          WHERE lang = 'en' GROUP BY bucket
        ), src AS (
          SELECT bucket, count(*)::DOUBLE AS cnt_s FROM grams
          GROUP BY bucket
        ), tots AS (
          SELECT (SELECT sum(cnt_t) FROM tgt) AS n_t,
                 (SELECT sum(cnt_s) FROM src) AS n_s
        ), ratios AS (
          SELECT s.bucket,
                 ln(coalesce(t.cnt_t, 0) + 1.0)
                   - ln((SELECT n_t FROM tots) + 1.0 * {nb})
                   - ln(coalesce(s.cnt_s, 0) + 1.0)
                   + ln((SELECT n_s FROM tots) + 1.0 * {nb}) AS logratio
          FROM src s LEFT JOIN tgt t USING (bucket)
        ), per_doc AS (
          SELECT g.doc_id, count(*) AS n_grams,
                 sum(r.logratio) AS w
          FROM grams g JOIN ratios r USING (bucket) GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_grams, 0) AS n_grams,
               CAST(round(p.w * 1e9, 0) AS BIGINT) AS dsir_weight_nano
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
    """


_SEQ_PACK_ORACLE_SQL = f"""
    WITH w AS (
      SELECT doc_id, len({_WORDS_SQL.format(col="text")})::BIGINT + 1 AS span
      FROM documents
    ), r AS (
      -- the windowed sum is HUGEINT in DuckDB (float64 via pandas): pin
      -- every derived column back to BIGINT to match Spark's longs
      SELECT doc_id, span,
             (sum(span) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS run
      FROM w
    )
    SELECT doc_id, span - 1 AS n_tokens,
           (run - span)::BIGINT AS token_offset,
           ((run - span) // 512)::BIGINT AS first_seq,
           ((run - 1) // 512)::BIGINT AS last_seq,
           ((run - 1) // 512 - (run - span) // 512 + 1)::BIGINT AS n_seqs
    FROM r ORDER BY doc_id
"""


def _gopher_oracle_sql() -> str:
    """Twin of q_gopher_quality built from the SAME threshold constants
    the operator uses (imported, not copied)."""
    from webcrawl_spark.operators import textstats as ts

    stop = "[" + ", ".join(f"'{w}'" for w in ts.GOPHER_STOPWORDS) + "]"
    words = _WORDS_SQL.format(col="text")
    return rf"""
        WITH base AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x != '') AS rw,
                 string_split(text, chr(10)) AS lns,
                 {words} AS lw
          FROM documents
        ), m AS (
          SELECT doc_id,
            len(rw) AS n,
            CASE WHEN len(rw) > 0 THEN
              list_aggregate(list_transform(rw, x -> length(x)),
                             'sum')::DOUBLE / len(rw)
            ELSE 0 END AS mean_len,
            (length(text) - length(regexp_replace(text, '#', '', 'g'))
             + len(list_filter(rw, x -> x LIKE '%...' OR x LIKE '%…')))
              AS n_sym,
            len(lns)::DOUBLE AS n_lines,
            len(list_filter(lns,
                x -> regexp_matches(ltrim(x), '^[-*•]'))) AS n_bullet,
            len(list_filter(lns,
                x -> x LIKE '%...' OR x LIKE '%…')) AS n_ell,
            CASE WHEN len(rw) > 0 THEN
              len(list_filter(rw,
                  x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(rw)
            ELSE 0 END AS alpha_frac,
            len(list_intersect(lw, {stop})) AS stop_hits
          FROM base
        )
        SELECT doc_id,
          (n >= {ts.GOPHER_MIN_WORDS} AND n <= {ts.GOPHER_MAX_WORDS})
            AS ok_word_count,
          (mean_len >= {ts.GOPHER_MIN_MEAN_WORD_LEN}
           AND mean_len <= {ts.GOPHER_MAX_MEAN_WORD_LEN})
            AS ok_mean_word_len,
          (CASE WHEN n > 0 THEN n_sym::DOUBLE / n ELSE 0 END
             <= {ts.GOPHER_MAX_SYMBOL_RATIO}) AS ok_symbol_ratio,
          (n_bullet / n_lines <= {ts.GOPHER_MAX_BULLET_LINE_FRAC})
            AS ok_bullet_lines,
          (n_ell / n_lines <= {ts.GOPHER_MAX_ELLIPSIS_LINE_FRAC})
            AS ok_ellipsis_lines,
          (CASE WHEN n > 0 THEN alpha_frac ELSE 0 END
             >= {ts.GOPHER_MIN_ALPHA_WORD_FRAC}) AS ok_alpha_words,
          (stop_hits >= {ts.GOPHER_MIN_STOPWORDS}) AS ok_stopwords,
          ((n >= {ts.GOPHER_MIN_WORDS} AND n <= {ts.GOPHER_MAX_WORDS})
           AND (mean_len >= {ts.GOPHER_MIN_MEAN_WORD_LEN}
                AND mean_len <= {ts.GOPHER_MAX_MEAN_WORD_LEN})
           AND (CASE WHEN n > 0 THEN n_sym::DOUBLE / n ELSE 0 END
                  <= {ts.GOPHER_MAX_SYMBOL_RATIO})
           AND (n_bullet / n_lines <= {ts.GOPHER_MAX_BULLET_LINE_FRAC})
           AND (n_ell / n_lines <= {ts.GOPHER_MAX_ELLIPSIS_LINE_FRAC})
           AND (CASE WHEN n > 0 THEN alpha_frac ELSE 0 END
                  >= {ts.GOPHER_MIN_ALPHA_WORD_FRAC})
           AND (stop_hits >= {ts.GOPHER_MIN_STOPWORDS})) AS gopher_pass
        FROM m ORDER BY doc_id
    """


_DECONTAMINATE_ORACLE_SQL = f"""
    WITH bsrc AS (
      SELECT substr(text, 1, 200) AS text FROM documents
      WHERE doc_id % 100 = 0
    ), bw AS (
      SELECT {_WORDS_SQL.format(col="text")} AS ws FROM bsrc
    ), bg AS (
      SELECT DISTINCT unnest(
        [array_to_string(list_slice(ws, i, i + 7), ' ')
         FOR i IN range(1, greatest(len(ws) - 6, 1))]) AS g
      FROM bw
    ), cw AS (
      SELECT doc_id, {_WORDS_SQL.format(col="text")} AS ws FROM documents
    ), cg AS (
      SELECT doc_id, unnest(
        [array_to_string(list_slice(ws, i, i + 7), ' ')
         FOR i IN range(1, greatest(len(ws) - 6, 1))]) AS g
      FROM cw
    ), hits AS (
      SELECT doc_id, count(*) AS n FROM cg JOIN bg USING (g)
      GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(h.n, 0) AS n_contaminated_ngrams
    FROM documents d LEFT JOIN hits h USING (doc_id)
    ORDER BY d.doc_id
"""


_INTERDUP_ORACLE_SQL = f"""
    WITH cw AS (
      SELECT doc_id, {_WORDS_SQL.format(col="text")} AS ws FROM documents
    ), cg AS (
      SELECT doc_id, unnest(
        [array_to_string(list_slice(ws, i, i + 7), ' ')
         FOR i IN range(1, greatest(len(ws) - 6, 1))]) AS gram
      FROM cw
    ), shared AS (
      SELECT gram FROM cg GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
    ), per AS (
      SELECT doc_id, count(*) AS n_windows,
             sum(CASE WHEN gram IN (SELECT gram FROM shared)
                 THEN 1 ELSE 0 END) AS n_dup
      FROM cg GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_windows, 0) AS n_windows,
           round(coalesce(p.n_dup::DOUBLE / p.n_windows, 0), 6) AS dup_frac
    FROM documents d LEFT JOIN per p USING (doc_id)
    ORDER BY d.doc_id
"""


def _ivf_oracle_sql() -> str:
    """Full twin of q_ivf_topk: recompute each embedding's IVF cell from
    the SAME seed-derived anchor constants the Spark UDF uses (imported,
    not copied), keep only the nprobe probed cells (computed here with the
    same stable argsort), then exact-rerank by the UNROUNDED cosine with
    the vec_id tie-break. Cell argmax ties break to the lowest index on
    both sides (np.argmax ≙ first-match CASE)."""
    import numpy as np

    from webcrawl_spark.operators.similarity import random_anchors

    n_cells, nprobe, dim, k = 16, 4, 64, 10
    anchors = random_anchors(dim, n_cells, seed=11)
    q = np.zeros(dim)
    q[0] = 1.0
    probes = [int(c) for c in
              np.argsort(-(anchors @ q), kind="stable")[:nprobe]]
    dots = ",\n                 ".join(
        "(" + " + ".join(f"embedding[{i + 1}]*({anchors[c, i]!r})"
                         for i in range(dim)) + f") AS d{c}"
        for c in range(n_cells))
    first_match = " ".join(f"WHEN d{c} = m THEN {c}"
                           for c in range(n_cells))
    return f"""
        WITH d AS (
          SELECT vec_id, embedding,
                 {dots}
          FROM embeddings
        ), a AS (
          SELECT vec_id, embedding, CASE {first_match} END AS cell
          FROM (SELECT *, greatest({', '.join(f'd{c}' for c in range(n_cells))}) AS m
                FROM d)
        )
        SELECT vec_id, round(cosine, 6) AS cosine FROM (
          SELECT vec_id,
                 embedding[1] / sqrt(list_aggregate(
                   list_transform(embedding, x -> x*x), 'sum')) AS cosine
          FROM a WHERE cell IN ({', '.join(map(str, probes))})
          ORDER BY cosine DESC, vec_id ASC LIMIT {k}
        )
    """


def _image_dhash_oracle_sql() -> str:
    """Twin of q_image_dhash in pure integer SQL: pixel grids from the
    shared _IMG_* formulas (+ the twin's last-two-columns +1), the same
    floor block map, cross-multiplied block-sum comparisons, band ints,
    the band-equality candidate join, and bit_count Hamming."""
    max_w, max_h = 8 + 4 * 3, 5 + 6 * 2     # formula maxima: 20, 17
    band_cols = ", ".join(
        f"sum(CASE WHEN r // 2 = {b} THEN bit * (1 << ((r % 2) * 8 + c)) "
        f"ELSE 0 END)::INT AS b{b}" for b in range(4))
    return f"""
        WITH imgs AS (
          SELECT i, tw,
                 'img' || lpad(i::VARCHAR, 2, '0')
                       || (CASE WHEN tw = 1 THEN 't' ELSE '' END) AS img_id,
                 8 + (i % 5) * 3 AS w, 5 + ((i * 3) % 7) * 2 AS h
          FROM range(25) t(i), (VALUES (0), (1)) s(tw)
        ), px AS (
          SELECT img_id, w, h, xx.range AS x, yy.range AS y,
                 (((xx.range * 5 + yy.range * 7 + i * 13) % 256)
                  + CASE WHEN tw = 1 AND xx.range >= w - 2
                         THEN 37 ELSE 0 END) % 256 AS lum
          FROM imgs, range({max_w}) xx, range({max_h}) yy
          WHERE xx.range < w AND yy.range < h
        ), bp AS (
          SELECT img_id, (y * 8) // h AS r, (x * 9) // w AS c,
                 sum(lum) AS s, count(*) AS n
          FROM px GROUP BY img_id, (y * 8) // h, (x * 9) // w
        ), blocks AS (
          SELECT g.img_id, g.r, g.c, coalesce(b.s, 0) AS s,
                 greatest(coalesce(b.n, 0), 1) AS n
          FROM (SELECT img_id, rr.range AS r, cc.range AS c
                FROM imgs, range(8) rr, range(9) cc) g
          LEFT JOIN bp b
            ON b.img_id = g.img_id AND b.r = g.r AND b.c = g.c
        ), bits AS (
          SELECT l.img_id, l.r, l.c,
                 CASE WHEN l.s * rt.n > rt.s * l.n THEN 1 ELSE 0 END AS bit
          FROM blocks l JOIN blocks rt
            ON rt.img_id = l.img_id AND rt.r = l.r AND rt.c = l.c + 1
          WHERE l.c < 8
        ), h AS (
          SELECT img_id, {band_cols}
          FROM bits GROUP BY img_id
        )
        SELECT l.img_id AS id_a, r2.img_id AS id_b,
               (bit_count(xor(l.b0, r2.b0)) + bit_count(xor(l.b1, r2.b1))
                + bit_count(xor(l.b2, r2.b2))
                + bit_count(xor(l.b3, r2.b3)))::INT AS hamming
        FROM h l JOIN h r2
          ON l.img_id < r2.img_id
          AND (l.b0 = r2.b0 OR l.b1 = r2.b1 OR l.b2 = r2.b2
               OR l.b3 = r2.b3)
        WHERE bit_count(xor(l.b0, r2.b0)) + bit_count(xor(l.b1, r2.b1))
              + bit_count(xor(l.b2, r2.b2))
              + bit_count(xor(l.b3, r2.b3)) <= {_DHASH_MAXHAM}
        ORDER BY id_a, id_b
    """


def _cdc_oracle_sql() -> str:
    """Twin of q_cdc: payload strings rebuilt char-by-char from the shared
    formulas, the same md5-window boundary rule (window 8, divisor 64,
    1-based substr), chunk index = running boundary count, chunk md5 over
    the reassembled span, then the identical dup-bytes aggregation."""
    max_n = 600 + (_CDC_N - 1) * 37
    lo, hi = _CDC_SHARED
    return f"""
        WITH docs AS (
          SELECT i AS doc_id, {_CDC_LEN.replace('i', 'i')} AS n
          FROM range({_CDC_N}) t(i)
        ), ch AS (
          SELECT doc_id, n, jj.range AS j,
                 chr((CASE WHEN jj.range >= {lo} AND jj.range < {hi}
                          THEN {_CDC_CHR_SHARED.replace('j', 'jj.range')}
                          ELSE {_CDC_CHR.replace('j', 'jj.range')
                                        .replace('i', 'doc_id')} END)::INT)
                   AS c
          FROM docs, range({max_n}) jj WHERE jj.range < n
        ), s AS (
          SELECT doc_id, n, string_agg(c, '' ORDER BY j) AS payload
          FROM ch GROUP BY doc_id, n
        ), pos AS (
          SELECT doc_id, pp.range AS q, substr(payload, pp.range, 1) AS c,
                 CASE WHEN pp.range >= 8 AND
                   ('0x' || substr(md5(substr(payload, pp.range - 7, 8)),
                                   1, 8))::UBIGINT % 64 = 0
                 THEN 1 ELSE 0 END AS bd
          FROM s, range(1, {max_n + 1}) pp WHERE pp.range <= n
        ), kpos AS (
          SELECT doc_id, q, c,
                 coalesce(sum(bd) OVER (PARTITION BY doc_id ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS chunk_idx
          FROM pos
        ), chunks AS (
          SELECT doc_id, chunk_idx, count(*) AS chunk_len,
                 md5(string_agg(c, '' ORDER BY q)) AS chunk_md5
          FROM kpos GROUP BY doc_id, chunk_idx
        ), owners AS (
          SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs
          FROM chunks GROUP BY chunk_md5
        )
        SELECT c.doc_id,
               count(*)::INT AS n_chunks,
               sum(c.chunk_len)::BIGINT AS n_bytes,
               sum(CASE WHEN o.n_docs > 1 THEN c.chunk_len ELSE 0 END)
                 ::BIGINT AS dup_bytes,
               CAST(round(sum(CASE WHEN o.n_docs > 1 THEN c.chunk_len
                              ELSE 0 END) * 1e9
                          / sum(c.chunk_len), 0) AS BIGINT)
                 AS dup_frac_nano
        FROM chunks c JOIN owners o USING (chunk_md5)
        GROUP BY c.doc_id
        ORDER BY c.doc_id
    """


def _audio_ahash_oracle_sql() -> str:
    """Twin of q_audio_ahash: sample streams from the shared _AUD_SAMP
    formula (+ the twin's clipped +977 offset), the floor block map over
    65 blocks, cross-multiplied |amplitude| sums, band ints, band-equality
    candidates, bit_count Hamming — all integers."""
    max_n = 401 + (_AUD_N - 1) * 38
    band_cols = ", ".join(
        f"sum(CASE WHEN j // 16 = {b} THEN bit * (1 << (j % 16)) "
        f"ELSE 0 END)::INT AS b{b}" for b in range(4))
    return f"""
        WITH auds AS (
          SELECT i, tw,
                 'aud' || lpad(i::VARCHAR, 2, '0')
                       || (CASE WHEN tw = 1 THEN 't' ELSE '' END) AS aud_id,
                 401 + i * 38 AS n
          FROM range({_AUD_N}) t(i), (VALUES (0), (1)) s(tw)
        ), smp AS (
          SELECT aud_id, n, tt.range AS t,
                 abs(least(((tt.range * 2657 + i * 911) % 65536) - 32768
                           + CASE WHEN tw = 1 THEN 977 ELSE 0 END,
                           32767)) AS mag
          FROM auds, range({max_n}) tt WHERE tt.range < n
        ), blk AS (
          SELECT aud_id, (t * 65) // n AS k, sum(mag) AS s, count(*) AS c
          FROM smp GROUP BY aud_id, (t * 65) // n
        ), bits AS (
          SELECT l.aud_id, l.k AS j,
                 CASE WHEN l.s * r.c > r.s * l.c THEN 1 ELSE 0 END AS bit
          FROM blk l JOIN blk r ON r.aud_id = l.aud_id AND r.k = l.k + 1
          WHERE l.k < 64
        ), h AS (
          SELECT aud_id, {band_cols}
          FROM bits GROUP BY aud_id
        )
        SELECT l.aud_id AS id_a, r2.aud_id AS id_b,
               (bit_count(xor(l.b0, r2.b0)) + bit_count(xor(l.b1, r2.b1))
                + bit_count(xor(l.b2, r2.b2))
                + bit_count(xor(l.b3, r2.b3)))::INT AS hamming
        FROM h l JOIN h r2
          ON l.aud_id < r2.aud_id
          AND (l.b0 = r2.b0 OR l.b1 = r2.b1 OR l.b2 = r2.b2
               OR l.b3 = r2.b3)
        WHERE bit_count(xor(l.b0, r2.b0)) + bit_count(xor(l.b1, r2.b1))
              + bit_count(xor(l.b2, r2.b2))
              + bit_count(xor(l.b3, r2.b3)) <= {_DHASH_MAXHAM}
        ORDER BY id_a, id_b
    """


def _qclf_oracle_sql() -> str:
    """Twin of q_quality_clf: same tokenization (the shared _WORDS_SQL
    idiom), same unigram+bigram stream (the dsir bigram comprehension),
    same md5-salted buckets, and the identical integer accumulation
    ``sum(cnt*w_nano)`` + cleared-division rule — int64 end-to-end, so
    the match is exact, not grid-rounded."""
    words = _WORDS_SQL.format(col="text")
    weights = _qclf_weights_nano()
    values = ", ".join(f"({i}, {w})" for i, w in enumerate(weights))
    return f"""
        WITH cw AS (
          SELECT doc_id, {words} AS ws FROM documents
        ), g AS (
          SELECT doc_id,
                 ('0x' || substr(md5('qclf' || unnest(list_concat(ws,
                    [array_to_string(list_slice(ws, i, i + 1), ' ')
                     FOR i IN range(1, greatest(len(ws) - 0, 1))]))), 1, 8)
                 )::UBIGINT % {_QCLF_BUCKETS} AS bucket
          FROM cw
        ), c AS (
          SELECT doc_id, bucket, count(*)::BIGINT AS cnt
          FROM g GROUP BY doc_id, bucket
        ), w(bucket, w_nano) AS (
          VALUES {values}
        ), per_doc AS (
          SELECT c.doc_id, sum(c.cnt)::BIGINT AS n_grams,
                 sum(c.cnt * w.w_nano)::BIGINT AS logit_nano
          FROM c JOIN w USING (bucket) GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_grams, 0)::BIGINT AS n_grams,
               coalesce(p.logit_nano, 0)::BIGINT AS logit_nano,
               (coalesce(p.logit_nano, 0)
                + {_QCLF_BIAS_NANO} * coalesce(p.n_grams, 1)) > 0
                 AS quality
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
    """


def _semdedup_oracle_sql() -> str:
    """Full twin of q_semdedup: cell = first-match argmax over the shared
    anchor dots (same d{c}/greatest/CASE shape _ivf_oracle_sql proved),
    csim = own-cell dot / vector norm, within-cell pair cosines via the
    sequential summation q_embed_neardup proved order-identical, and the
    removal rule on nano-rounded csims with the id tie-break — the exact
    comparison the Spark operator runs."""
    from webcrawl_spark.operators.similarity import random_anchors

    n_cells, dim = _SEMDEDUP_CELLS, _SEMDEDUP_DIM
    anchors = random_anchors(dim, n_cells, seed=_SEMDEDUP_SEED)
    # ::DOUBLE on the float element BEFORE the product: DuckDB otherwise
    # narrows FLOAT * double-literal to FLOAT, rounding every product to
    # float32 — the Spark side casts the vector to array<double> for the
    # same reason, so both engines run the identical double sequential sum
    dots = ",\n                 ".join(
        "(" + " + ".join(f"embedding[{i + 1}]::DOUBLE*({anchors[c, i]!r})"
                         for i in range(dim)) + f") AS d{c}"
        for c in range(n_cells))
    first_match = " ".join(f"WHEN d{c} = m THEN {c}"
                           for c in range(n_cells))
    return f"""
        WITH d AS (
          SELECT vec_id, embedding,
                 {dots}
          FROM embeddings
        ), s AS (
          SELECT vec_id, embedding, CASE {first_match} END AS cell,
                 m / nrm AS csim, nrm
          FROM (SELECT *,
                  greatest({', '.join(f'd{c}' for c in range(n_cells))}) AS m,
                  sqrt(list_aggregate(
                    list_transform(embedding, x -> x*x), 'sum')) AS nrm
                FROM d)
        ), p AS (
          SELECT x.vec_id AS a, y.vec_id AS b,
                 round(x.csim * 1e9)::BIGINT AS ca,
                 round(y.csim * 1e9)::BIGINT AS cb,
                 list_aggregate(list_transform(range(1, {dim + 1}),
                   i -> x.embedding[i::INT]::DOUBLE
                        * y.embedding[i::INT]::DOUBLE), 'sum')
                 / (x.nrm * y.nrm) AS cos
          FROM s x JOIN s y
            ON x.cell = y.cell AND x.vec_id < y.vec_id
        ), losers AS (
          SELECT DISTINCT
                 CASE WHEN ca > cb OR (ca = cb AND a > b) THEN a ELSE b END
                 AS vec_id
          FROM p WHERE cos >= {_SEMDEDUP_EPS}
        )
        SELECT s.vec_id, s.cell, round(s.csim, 6) AS csim,
               (losers.vec_id IS NOT NULL) AS removed
        FROM s LEFT JOIN losers USING (vec_id)
        ORDER BY s.vec_id
    """


def _crawl_round_oracle_sql() -> str:
    """SQL replay of the politeness-budgeted round loop for q_crawl_round.

    The per-page ADMITTED link lists are exported through the same kernels
    the python oracle uses (page_links + filter_links + the urlkit depth
    gate — each oracle-tested on reference vectors) into VALUES literals;
    everything the distributed engine is responsible for — round
    scheduling, per-host budget top-k, first-discovery-wins seen set,
    dense FIFO seq assignment, termination — is then re-derived purely in
    SQL as an unrolled WITH chain (MATERIALIZED stops exponential CTE
    inlining). Rounds beyond the sim's natural end run on an empty
    frontier and contribute no rows, so the fixed unroll is safe; if the
    Spark engine ever ran MORE rounds than the unroll, the row counts
    would mismatch and the driver would flag it."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.frontier.oracle import CrawlConfig
    from webcrawl_spark.kernels.classify import filter_links
    from webcrawl_spark.kernels.crawl import page_links
    from webcrawl_spark.kernels.urlkit import (
        get_url_depth, parse_url, url_path,
    )

    site = build_site(**_CRAWL_Q_SITE)
    cfg = CrawlConfig(seed_url=f"https://{site.hosts[0]}/", **_CRAWL_Q_CFG)
    known = set(site.urls())
    base_depth = cfg.base_depth()
    edges: list[tuple[str, int, str]] = []
    attrs: dict[str, tuple[str, int, int]] = {}
    for u in site.urls():
        html = render_page_html(site, u)
        attrs[u] = (parse_url(u).host, get_url_depth(url_path(u)), 200)
        if max(0, get_url_depth(url_path(u)) - base_depth) >= cfg.max_depth:
            continue
        opts = cfg.filter_options()
        opts.limit = None
        accepted, _ = filter_links(
            page_links(html, u, cfg.filter_options()), opts)
        for pos, dst in enumerate(accepted):
            edges.append((u, pos, dst))
    for dst in {d for _, _, d in edges} - known:   # dead links → 404 rows
        attrs[dst] = (parse_url(dst).host, get_url_depth(url_path(dst)), 404)

    def vals(rows):
        return ", ".join(
            "(" + ", ".join(f"'{c}'" if isinstance(c, str) else str(c)
                            for c in r) + ")"
            for r in rows)

    budget = cfg.host_budget
    parts = [
        f"WITH edges(src, pos, dst) AS (VALUES {vals(edges)}),\n"
        f"urlattrs(url, host, depth, status) AS "
        f"(VALUES {vals([(u, *a) for u, a in attrs.items()])}),\n"
        f"seen_0(url, seq) AS (SELECT '{cfg.seed_url}', 0),\n"
        f"frontier_0(url, seq) AS (SELECT '{cfg.seed_url}', 0)"]
    for k in range(_CRAWL_Q_UNROLL):
        parts.append(f"""sel_{k} AS MATERIALIZED (
  SELECT f.url, f.seq, a.host, a.depth, a.status, {k + 1} AS round
  FROM frontier_{k} f JOIN urlattrs a ON a.url = f.url
  QUALIFY row_number() OVER (PARTITION BY a.host ORDER BY f.seq)
          <= {budget}),
kept_{k}(url, seq) AS (
  SELECT url, seq FROM frontier_{k}
  WHERE url NOT IN (SELECT url FROM sel_{k})),
new_{k}(url, seq) AS MATERIALIZED (
  SELECT dst, (SELECT max(seq) FROM seen_{k})
              + row_number() OVER (ORDER BY src_seq, pos)
  FROM (
    SELECT e.dst, s.seq AS src_seq, e.pos
    FROM sel_{k} s JOIN edges e ON e.src = s.url AND s.status = 200
    WHERE e.dst NOT IN (SELECT url FROM seen_{k})
    QUALIFY row_number() OVER (PARTITION BY e.dst
                               ORDER BY s.seq, e.pos) = 1)),
seen_{k + 1}(url, seq) AS MATERIALIZED (
  SELECT * FROM seen_{k} UNION ALL SELECT * FROM new_{k}),
frontier_{k + 1}(url, seq) AS MATERIALIZED (
  SELECT * FROM kept_{k} UNION ALL SELECT * FROM new_{k})""")
    rounds_union = " UNION ALL ".join(
        f"SELECT * FROM sel_{k}" for k in range(_CRAWL_Q_UNROLL))
    return (",\n".join(parts)
            + f"\nSELECT url, host, depth, round, seq, status FROM "
              f"({rounds_union}) ORDER BY seq")


def _hostrank_oracle_sql() -> str:
    """SQL replay of weighted PageRank for q_hostrank.

    The raw host→host link pairs are exported through the SAME kernels the
    Spark operator uses (kernels/htmlkit.py extract_links via links_udf;
    kernels/urlkit.py url_host) into a VALUES literal; edge-weight
    aggregation, out-weight normalization, uniform dangling-mass
    redistribution and the 10 fixed power iterations are re-derived purely
    in SQL as an unrolled WITH chain (MATERIALIZED stops exponential CTE
    inlining, same hazard as _crawl_round_oracle_sql). The final
    projection rounds rank to integer nano-units on both sides: double
    summation-order differences between DuckDB and Spark are ~1e-15 while
    the grid is 1e-9, so the integer compare is stable."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.kernels.htmlkit import extract_links
    from webcrawl_spark.kernels import urlkit

    site = build_site(**_HR_Q_SITE)
    pairs: list[tuple[str, str]] = []
    for u in site.urls():
        src = urlkit.url_host(u)
        for link in extract_links(render_page_html(site, u), u):
            dst = urlkit.url_host(link)
            if src and dst and src != dst:
                pairs.append((src, dst))
    vals = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    d = 0.85
    parts = [
        f"WITH pairs(src, dst) AS (VALUES {vals}),",
        "edges AS MATERIALIZED (SELECT src, dst,"
        " CAST(count(*) AS DOUBLE) AS w FROM pairs GROUP BY src, dst),",
        "outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),",
        "enorm AS MATERIALIZED (SELECT e.src, e.dst, e.w / o.ow AS p"
        " FROM edges e JOIN outw o USING (src)),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM edges"
        "  UNION ALL SELECT dst FROM edges)),",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM hosts),",
        "r_0 AS MATERIALIZED (SELECT host,"
        " 1.0 / (SELECT n FROM nn) AS rank FROM hosts),",
    ]
    for k in range(_HR_Q_ITER):
        parts.append(f"""dang_{k} AS (
  SELECT COALESCE(sum(rank), 0.0) AS dm FROM r_{k}
  WHERE host NOT IN (SELECT DISTINCT src FROM enorm)),
c_{k} AS (
  SELECT e.dst AS host, sum(r.rank * e.p) AS m
  FROM r_{k} r JOIN enorm e ON e.src = r.host GROUP BY e.dst),
r_{k + 1} AS MATERIALIZED (
  SELECT h.host,
         (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * (COALESCE(c.m, 0.0)
                  + (SELECT dm FROM dang_{k}) / (SELECT n FROM nn))
         AS rank
  FROM hosts h LEFT JOIN c_{k} c USING (host)),""")
    return ("\n".join(parts).rstrip(",")
            + f"\nSELECT host, CAST(ROUND(rank * 1e9) AS BIGINT) AS rank_e9"
              f" FROM r_{_HR_Q_ITER} ORDER BY host")


def _hits_oracle_sql() -> str:
    """SQL replay of weighted HITS for q_hits: same kernel-exported link
    pairs as _hostrank_oracle_sql; edge weights, both per-iteration L2
    normalizations and the mutual-reinforcement updates re-derived as an
    unrolled MATERIALIZED WITH chain."""
    from webcrawl_spark.datagen import build_site, render_page_html
    from webcrawl_spark.kernels.htmlkit import extract_links
    from webcrawl_spark.kernels import urlkit

    site = build_site(**_HR_Q_SITE)
    pairs: list[tuple[str, str]] = []
    for u in site.urls():
        src = urlkit.url_host(u)
        for link in extract_links(render_page_html(site, u), u):
            dst = urlkit.url_host(link)
            if src and dst and src != dst:
                pairs.append((src, dst))
    vals = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    parts = [
        f"WITH pairs(src, dst) AS (VALUES {vals}),",
        "e AS MATERIALIZED (SELECT src, dst,"
        " CAST(count(*) AS DOUBLE) AS w FROM pairs GROUP BY src, dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "s_0 AS MATERIALIZED (SELECT host, 1.0 AS hub,"
        " 1.0 AS authority FROM hosts),",
    ]
    for k in range(1, _HR_Q_ITER + 1):
        parts.append(f"""ar_{k} AS (
  SELECT e.dst AS host, sum(s.hub * e.w) AS ar
  FROM s_{k - 1} s JOIN e ON e.src = s.host GROUP BY e.dst),
a_{k} AS MATERIALIZED (
  SELECT host, ar / (SELECT sqrt(sum(ar * ar)) FROM ar_{k}) AS a
  FROM ar_{k}),
hr_{k} AS (
  SELECT e.src AS host, sum(a.a * e.w) AS hr
  FROM a_{k} a JOIN e ON e.dst = a.host GROUP BY e.src),
h_{k} AS MATERIALIZED (
  SELECT host, hr / (SELECT sqrt(sum(hr * hr)) FROM hr_{k}) AS h
  FROM hr_{k}),
s_{k} AS MATERIALIZED (
  SELECT hs.host, COALESCE(h.h, 0.0) AS hub,
         COALESCE(a.a, 0.0) AS authority
  FROM hosts hs LEFT JOIN h_{k} h USING (host)
                LEFT JOIN a_{k} a USING (host)),""")
    return ("\n".join(parts).rstrip(",")
            + f"\nSELECT host, CAST(ROUND(hub * 1e9) AS BIGINT) AS hub_e9,"
              f" CAST(ROUND(authority * 1e9) AS BIGINT) AS auth_e9"
              f" FROM s_{_HR_Q_ITER} ORDER BY host")


def _image_family_sql(prefix: str, n: int, w_expr: str, h_expr: str,
                      pix_expr: str, fmt: str) -> str:
    """Histogram-count recompute for one synthetic-image family: per-image
    dimensions, n_pix, and 8-bin luminance counts (bin = gray // 32) from
    the family's pixel formula. Counts are integers — no float hazards."""
    cases = ", ".join(
        f"max(CASE WHEN bin = {b} THEN c END)::INT AS c{b}"
        for b in range(8))
    return f"""
        WITH imgs AS (SELECT unnest(range(0, {n})) AS i),
        dims AS (
          SELECT i, {w_expr} AS w, {h_expr} AS h FROM imgs),
        pix AS (
          SELECT d.i, d.w, d.h,
                 (({pix_expr}) // 32)::INT AS bin
          FROM dims d,
               LATERAL (SELECT unnest(range(0, d.w)) AS x) xs,
               LATERAL (SELECT unnest(range(0, d.h)) AS y) ys),
        hist AS (
          SELECT i, w, h, bin, count(*) AS c
          FROM pix GROUP BY i, w, h, bin),
        feat AS (
          SELECT d.i, d.w, d.h, b.bin, coalesce(h.c, 0) AS c
          FROM dims d
          CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) b
          LEFT JOIN hist h ON h.i = d.i AND h.bin = b.bin)
        SELECT printf('{prefix}%02d', i::INT) AS media_id,
               w::INT AS width, h::INT AS height, '{fmt}' AS format,
               (w * h)::INT AS n_pix, {cases}
        FROM feat GROUP BY i, w, h
    """


def _image_oracle_sql() -> str:
    """Recompute q_image_plumbing entirely in SQL: the PNG family from the
    _IMG_* pixel formulas, the JPEG family from the _IMG_J* block-constant
    formulas (exact roundtrip by arithmetic — see q_image_plumbing), plus
    the three refusal literals."""
    nulls = ", ".join("NULL" for _ in range(8))
    return f"""
        SELECT * FROM ({_image_family_sql(
            "img", _IMG_N, _IMG_W, _IMG_H, _IMG_PIX, "png")})
        UNION ALL
        SELECT * FROM ({_image_family_sql(
            "jpg", _IMG_JN, _IMG_JW, _IMG_JH, _IMG_JPIX, "jpeg")})
        UNION ALL
        SELECT 'img_arith', NULL, NULL, 'unsupported:jpeg', NULL, {nulls}
        UNION ALL
        SELECT 'img_webp', NULL, NULL, 'unsupported:webp', NULL, {nulls}
        UNION ALL
        SELECT 'img_bad', NULL, NULL, 'error', NULL, {nulls}
        ORDER BY media_id
    """


def _audio_oracle_sql() -> str:
    """Recompute q_audio_plumbing entirely in SQL from the _AUD_* sample
    formulas: rate, sample count, and 8-bin amplitude-histogram COUNTS
    (bin = ((t*2657 + i*911) % 65536) // 8192) per synthetic WAV, plus the
    two refusal literals. Counts are integers — no float hazards."""
    return f"""
        WITH auds AS (SELECT unnest(range(0, {_AUD_N})) AS i),
        dims AS (
          SELECT i, {_AUD_RATE} AS rate, {_AUD_LEN} AS n FROM auds),
        samp AS (
          SELECT d.i, d.rate, d.n,
                 (({_AUD_SAMP}) // 8192)::INT AS bin
          FROM dims d,
               LATERAL (SELECT unnest(range(0, d.n)) AS t) ts),
        hist AS (
          SELECT i, rate, n, bin, count(*) AS c
          FROM samp GROUP BY i, rate, n, bin),
        feat AS (
          SELECT d.i, d.rate, d.n, b.bin, coalesce(h.c, 0) AS c
          FROM dims d
          CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) b
          LEFT JOIN hist h ON h.i = d.i AND h.bin = b.bin),
        ok_rows AS (
          SELECT printf('aud%02d', i::INT) AS media_id,
                 rate::INT AS sample_rate, n::BIGINT AS n_samples,
                 'wav' AS format,
                 {', '.join(
                     f"max(CASE WHEN bin = {b} THEN c END)::INT AS c{b}"
                     for b in range(8))}
          FROM feat GROUP BY i, rate, n)
        SELECT * FROM ok_rows
        UNION ALL
        SELECT 'aud_mp3', NULL, NULL, 'unsupported:mp3',
               {', '.join('NULL' for _ in range(8))}
        UNION ALL
        SELECT 'aud_bad', NULL, NULL, 'error',
               {', '.join('NULL' for _ in range(8))}
        ORDER BY media_id
    """


def _video_oracle_sql() -> str:
    """Recompute q_video_plumbing from the _VID_* formulas: exact integer
    duration_ms/dims, codec cycling, and frame_sample_plan's
    greatest(floor(duration_s * 0.5), 1) frame count."""
    codec_case = "CASE i % 3 " + " ".join(
        f"WHEN {k} THEN '{c}'" for k, c in enumerate(_VID_CODECS)) + " END"
    wcodec_case = "CASE i % 3 " + " ".join(
        f"WHEN {k} THEN '{c}'" for k, c in enumerate(_VID_WCODECS)) + " END"
    return f"""
        WITH vids AS (SELECT unnest(range(0, {_VID_N})) AS i)
        SELECT printf('vid%02d', i::INT) AS media_id,
               ({_VID_MS})::INT AS duration_ms,
               ({_VID_W})::INT AS width,
               ({_VID_H})::INT AS height,
               {codec_case} AS codec,
               'mp4' AS format,
               greatest(({_VID_MS}) // 2000, 1)::INT AS n_frames
        FROM vids
        UNION ALL
        SELECT printf('vidw%02d', i::INT),
               ({_VID_WMS})::INT, ({_VID_WW})::INT, ({_VID_WH})::INT,
               {wcodec_case}, 'webm',
               greatest(({_VID_WMS}) // 2000, 1)::INT
        FROM (SELECT unnest(range(0, {_VID_WN})) AS i)
        UNION ALL
        SELECT 'vid_avi', NULL, NULL, NULL, NULL, 'unsupported:avi', NULL
        UNION ALL
        SELECT 'vid_bad', NULL, NULL, NULL, NULL, 'error', NULL
        ORDER BY media_id
    """


def oracle_sql() -> dict[str, str]:
    words = _WORDS_SQL.format(col="text")
    return {
        "q_admission_reasons": """
            SELECT CASE
                     WHEN l_quantity > 45 THEN 'DEPTH_LIMIT'
                     WHEN l_returnflag = 'R' THEN 'FILE_TYPE'
                     WHEN l_discount > 0.08 THEN 'EXCLUDE_PATTERN'
                     WHEN l_tax > 0.06 THEN 'ROBOTS_TXT'
                     ELSE 'ALLOWED'
                   END AS denial_reason,
                   count(*) AS n
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "q_frontier_antijoin": """
            SELECT count(*) AS n_unseen,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_acctbal > 5000 AND c.c_custkey = o.o_custkey)
        """,
        "q_perhost_topk": """
            WITH ranked AS (
              SELECT o_custkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
              FROM orders)
            SELECT o_custkey, count(*) AS n_top,
                   round(sum(o_totalprice), 2) AS top_price
            FROM ranked WHERE rk <= 3
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "q_fifo_head": """
            SELECT event_id, user_id, event_type
            FROM events ORDER BY ts, event_id LIMIT 100
        """,
        "q_round_metrics": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_brand_revenue": """
            SELECT p_brand,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "q_segment_top_orders": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "q_union_dedup": """
            SELECT DISTINCT nationkey FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL
              SELECT s_nationkey AS nationkey FROM supplier
            ) ORDER BY nationkey
        """,
        "q_norm_dedup": """
            SELECT event_type,
                   count(DISTINCT lower(trim(props))) AS n_distinct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q_hourly_events": """
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_token_stats": f"""
            SELECT doc_id,
                   len({words}) AS n_tokens,
                   len(regexp_extract_all(text,
                     '''(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))
                     AS n_bpe_tokens,
                   length(text) AS n_chars_actual
            FROM documents ORDER BY doc_id
        """,
        "q_quality_filter": f"""
            SELECT lang, count(*) AS n_pass
            FROM documents
            WHERE {_quality_sql('text')} >= 0.4
            GROUP BY lang ORDER BY lang
        """,
        "q_lang_id": f"""
            WITH scored AS (
              SELECT len(list_intersect({words}, {_EN_STOP})) AS s_en,
                     len(list_intersect({words}, {_DE_STOP})) AS s_de,
                     len(list_intersect({words}, {_FR_STOP})) AS s_fr,
                     len(list_intersect({words}, {_ES_STOP})) AS s_es
              FROM documents),
            best AS (
              SELECT CASE
                       WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                       ELSE 'es'
                     END AS lang_guess
              FROM scored)
            SELECT lang_guess, count(*) AS n FROM best
            GROUP BY lang_guess ORDER BY lang_guess
        """,
        "q_exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
            ORDER BY doc_id
        """,
        "q_cosine_topk": """
            WITH sims AS (
              SELECT vec_id,
                     round(embedding[1] /
                           sqrt(list_aggregate(list_transform(embedding, x -> x * x),
                                               'sum')), 6) AS cosine
              FROM embeddings)
            SELECT vec_id, cosine FROM sims
            ORDER BY cosine DESC, vec_id ASC LIMIT 20
        """,
        "q_engpicker": """
            WITH pairs AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     CASE WHEN doc_id % 17 = 0 THEN NULL ELSE text END AS cdp,
                     CASE WHEN doc_id % 13 = 0 THEN ''
                          WHEN doc_id % 3 = 0
                          THEN substring(text, 1, greatest(length(text) - 8, 1))
                          ELSE text END AS tls
              FROM documents),
            scored AS (
              SELECT url,
                     (cdp IS NULL OR length(cdp) = 0) AS cdp_failed,
                     (tls IS NULL OR length(tls) = 0) AS tls_failed,
                     CASE WHEN greatest(length(cdp), length(tls)) > 0
                          THEN 1.0 - levenshtein(cdp, tls)::DOUBLE
                                     / greatest(length(cdp), length(tls))
                          ELSE 1.0 END AS sim
              FROM pairs)
            SELECT url, cdp_failed,
                   CASE WHEN cdp_failed OR tls_failed THEN NULL
                        ELSE round(sim, 6) END AS similarity,
                   CASE WHEN cdp_failed OR tls_failed THEN FALSE
                        ELSE sim >= 0.9 END AS tls_client_sufficient
            FROM scored ORDER BY CAST(url AS BIGINT)
        """,
        "q_pdf_text": """
            WITH R AS (
              SELECT doc_id, repeat(text, 1 + (doc_id % 4)::INT) AS text
              FROM documents
            ), L AS (
              SELECT doc_id,
                     list_transform(
                       range(0, greatest(1, ceil(length(text)/100.0)::INT)),
                       i -> substring(text, (i*100 + 1)::INT, 100)) AS lines
              FROM R
            ), P AS (
              SELECT doc_id,
                     list_transform(
                       range(0, ceil(len(lines)/40.0)::INT),
                       p -> array_to_string(
                         lines[(p*40+1)::INT:(p*40+40)::INT], chr(10))) AS pages
              FROM L
            )
            SELECT doc_id, len(pages)::INT AS num_pages,
                   'doc-' || doc_id AS title,
                   replace(replace(replace(replace(replace(
                     array_to_string(pages, chr(10) || chr(10)),
                     '&', '&amp;'), '"', '&quot;'), chr(39), '&#39;'),
                     '<', '&lt;'), '>', '&gt;') AS pdf_markdown,
                   (len(pages) * 150 > 30000) AS insufficient_time
            FROM P ORDER BY doc_id
        """,
        "q_doc_convert": """
            SELECT n_nationkey,
                   '<!DOCTYPE html><html lang="en"><head><meta charset="UTF-8">'
                   || '<meta name="viewport" content="width=device-width, initial-scale=1.0">'
                   || '<title>Document</title></head><body><main>'
                   || '<h2>Nations</h2><table><tbody>'
                   || '<tr><td>key</td><td>name</td><td>region</td></tr>'
                   || '<tr><td>' || n_nationkey::VARCHAR || '</td><td>'
                   || replace(replace(replace(replace(n_name,
                        '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;')
                   || '</td><td>' || n_regionkey::VARCHAR
                   || '</td></tr></tbody></table></main></body></html>'
                   AS doc_html
            FROM nation ORDER BY n_nationkey
        """,
        "q_docx_notes": """
            WITH esc AS (
                SELECT n_nationkey,
                       replace(replace(replace(replace(n_name,
                         '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                         '"', '&quot;') AS nm
                FROM nation
            )
            SELECT n_nationkey,
                   '<!DOCTYPE html><html lang="en"><head><meta charset="UTF-8">'
                   || '<meta name="viewport" content="width=device-width, initial-scale=1.0">'
                   || '<title>Document</title></head><body><main>'
                   || '<h1>' || nm || '</h1>'
                   || '<p>' || nm || ' exports <strong>goods</strong>'
                   || '<sup><sup><a href="#footnote-1">1</a></sup></sup></p>'
                   || '</main><section id="footnotes"><h2>Footnotes</h2>'
                   || '<div id="footnote-1"><p>Note for ' || nm
                   || '</p></div></section></body></html>'
                   AS doc_html
            FROM esc ORDER BY n_nationkey
        """,
        "q_minhash_oracle": _minhash_oracle_sql(),
        "q_dup_groups": _dup_groups_oracle_sql(),
        "q_dup_degree_cap": _DUP_DEGREE_CAP_ORACLE_SQL,
        "q_ssrf_classify": _SSRF_ORACLE_SQL,
        "q_embed_neardup": _embed_neardup_oracle_sql(),
        "q_ngram_jaccard": _NGRAM_JACCARD_ORACLE_SQL,
        "q_simhash_pairs": _SIMHASH_ORACLE_SQL,
        "q_ann_topk": _ann_oracle_sql(),
        "q_repetition": _REPETITION_ORACLE_SQL,
        "q_pii_redact": _pii_oracle_sql(),
        "q_line_dedup": _LINE_DEDUP_ORACLE_SQL,
        "q_corpus_mixture": _CORPUS_MIXTURE_ORACLE_SQL,
        "q_sample_mix": _sample_mix_oracle_sql(),
        "q_chunking": _CHUNKING_ORACLE_SQL,
        "q_ivf_topk": _ivf_oracle_sql(),
        "q_semdedup": _semdedup_oracle_sql(),
        "q_quality_clf": _qclf_oracle_sql(),
        "q_image_dhash": _image_dhash_oracle_sql(),
        "q_audio_ahash": _audio_ahash_oracle_sql(),
        "q_cdc": _cdc_oracle_sql(),
        "q_bigram_ppl": _bigram_ppl_oracle_sql(),
        "q_decontaminate": _DECONTAMINATE_ORACLE_SQL,
        "q_gopher_quality": _gopher_oracle_sql(),
        "q_c4_quality": _c4_oracle_sql(),
        "q_ccnet_normalize": _CCNET_NORMALIZE_ORACLE_SQL,
        "q_perplexity": _perplexity_oracle_sql(),
        "q_dsir": _dsir_oracle_sql(),
        "q_seq_pack": _SEQ_PACK_ORACLE_SQL,
        "q_passage_removal": _passage_removal_oracle_sql(),
        "q_interdup": _INTERDUP_ORACLE_SQL,
        "q_crawl_round": _crawl_round_oracle_sql(),
        "q_hostrank": _hostrank_oracle_sql(),
        "q_hits": _hits_oracle_sql(),
        "q_anchor_text": _anchor_oracle_sql(),
        "q_trap_detect": _trap_oracle_sql(),
        "q_recrawl": _recrawl_oracle_sql(),
        "q_image_plumbing": _image_oracle_sql(),
        "q_audio_plumbing": _audio_oracle_sql(),
        "q_video_plumbing": _video_oracle_sql(),
        # scale-path MinHash: config-agreement invariant — the md5-config
        # SQL is the ground truth the FNV path must reproduce on this
        # corpus (see q_minhash_dedup docstring for the margin argument)
        "q_minhash_dedup": _minhash_oracle_sql(),
    }
