"""Corpus-preparation operators for training-data pipelines: deterministic
sampling, stratified mixing, composition reporting, and token-window
chunking.

Sampling is HASH-salted, not RNG-based: a row's fate depends only on
(salt, key), so a sample is reproducible across runs, cluster sizes and
partitionings — the property a 100-TB curation pipeline actually needs
(resumable, auditable, and exactly re-computable by the DuckDB oracle).
Everything here is pure Column expressions (whole-stage codegen, no
shuffle except the intended aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sample_bucket",
    "deterministic_sample",
    "stratified_sample",
    "corpus_mixture",
    "chunk_documents",
    "contamination_flags",
    "decontaminate",
    "duplicate_passage_fraction",
    "remove_duplicate_passages",
]

# 32-bit bucket space for the md5-prefix draw.
_BUCKETS = 1 << 32


def sample_bucket(key: Column, salt: str = "s0") -> Column:
    """Uniform 32-bit bucket from md5(salt || key) — the deterministic
    coin. md5 (not xxhash64) so the SQL oracle can recompute it
    bit-for-bit; only 8 hex chars are materialized per row."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def deterministic_sample(df: DataFrame, frac: float, key_col: str = "doc_id",
                         salt: str = "s0") -> DataFrame:
    """Keep ~frac of rows, decided per-row by the salted hash bucket.
    Changing the salt draws an independent sample; the same (salt, frac)
    always returns the identical row set."""
    return df.filter(
        sample_bucket(F.col(key_col), salt) < int(frac * _BUCKETS))


def stratified_sample(df: DataFrame, fracs: dict[str, float],
                      strata_col: str = "source", key_col: str = "doc_id",
                      default_frac: float = 0.0,
                      salt: str = "s0") -> DataFrame:
    """Per-stratum sampling rates — the corpus-mixing primitive (e.g.
    upweight books, downweight boilerplate-heavy crawl). Strata not in
    ``fracs`` get ``default_frac``."""
    threshold = F.lit(int(default_frac * _BUCKETS))
    for value, frac in fracs.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(sample_bucket(F.col(key_col), salt) < threshold)


def corpus_mixture(df: DataFrame, by: list[str] | None = None,
                   text_col: str = "text") -> DataFrame:
    """Composition report per stratum: docs, words, chars and each
    stratum's share of corpus words — what a data-mixing decision reads.
    One partial-aggregated shuffle on the (small) strata key; the share
    denominator comes from a single-row broadcast join, not a window over
    the full corpus."""
    from webcrawl_spark.operators.textstats import token_count

    by = by or ["source", "lang"]
    per = (
        df.groupBy(*by)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(token_count(F.col(text_col))).alias("n_words"),
             F.sum(F.length(text_col)).alias("n_chars"))
    )
    total = per.agg(F.sum("n_words").alias("_total"))
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("word_share",
                    F.round(F.col("n_words") / F.col("_total"), 6))
        .drop("_total")
    )


def contamination_flags(df: DataFrame, benchmark: DataFrame, n: int = 8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination probe: for each corpus document, count
    word ``n``-grams that also occur in the benchmark set (the eval-leak
    check every serious pretraining pipeline runs; 8-13-gram overlap is
    the published convention). Gram identity travels as xxhash64 over the
    sliced word array (_word_ngram_hashes — no gram strings built).

    Scale shape: both sides reduce to 64-bit n-gram hashes before any
    join — the corpus side ships (doc, hash) pairs, the benchmark side is
    a deduped hash set, tiny next to the corpus, so Catalyst/AQE
    broadcasts it; document text never shuffles. Returns
    (id, n_contaminated_ngrams) with zero-rows for clean docs."""
    hits = _contamination_hits(df, benchmark, n, text_col, id_col)
    return (
        df.select(id_col)
        .join(hits, df[id_col] == hits["_id"], "left")
        .select(id_col,
                F.coalesce("n_contaminated_ngrams", F.lit(0))
                .alias("n_contaminated_ngrams"))
    )


def _contamination_hits(df: DataFrame, benchmark: DataFrame, n: int,
                        text_col: str, id_col: str) -> DataFrame:
    """(_id, n_contaminated_ngrams) for documents with >= 1 hit only —
    the corpus-wide zero-filled view is contamination_flags' job."""
    from webcrawl_spark.operators.textstats import _word_ngram_hashes, _words

    def gram_hashes(frame: DataFrame, ident) -> DataFrame:
        return frame.select(
            ident.alias("_id"),
            F.explode(_word_ngram_hashes(_words(F.col(text_col)), n))
            .alias("_h"))

    bench = gram_hashes(benchmark, F.lit(0)).select("_h").distinct()
    return (
        gram_hashes(df, F.col(id_col))
        .join(F.broadcast(bench), "_h")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


def decontaminate(df: DataFrame, benchmark: DataFrame, n: int = 8,
                  max_hits: int = 0, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Drop documents whose benchmark n-gram overlap exceeds ``max_hits``
    (default: any overlap). Dirty ids come straight from the aggregated
    hit counts — no corpus-wide zero-fill join — and leave via an anti-join
    on ids only; text stays in place."""
    dirty = (
        _contamination_hits(df, benchmark, n, text_col, id_col)
        .filter(F.col("n_contaminated_ngrams") > max_hits)
        .select(F.col("_id").alias(id_col))
    )
    return df.join(dirty, id_col, "left_anti")


def duplicate_passage_fraction(df: DataFrame, n: int = 20,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Inter-document duplication signal (the RefinedWeb/Gopher
    'duplicated n-gram fraction' family, measured ACROSS documents where
    repetition_stats measures WITHIN): per document, the fraction of its
    sliding word n-gram windows that also occur in at least one OTHER
    document. High values mark mirrored/boilerplate pages that survive
    exact dedup.

    Scale shape: only (doc, 64-bit window hash) pairs enter the two
    aggregations (map-side partial); text never shuffles. Returns
    (id, n_windows, dup_frac) — zero-window docs report 0.0."""
    from webcrawl_spark.operators.textstats import _word_ngram_hashes, _words

    # pinned: both the shared-window aggregation and the per-doc join
    # consume the gram table; unpinned, the corpus would be re-tokenized
    # and re-hashed for each (measured with remove_duplicate_passages'
    # identical shape: pin + array-hash took the 10× probe 14.9 → 6.1 s)
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            _word_ngram_hashes(_words(F.col(text_col)), n)).alias("_h"),
    ).localCheckpoint(eager=False)
    shared = (grams.groupBy("_h")
              .agg(F.countDistinct("_id").alias("_docs"))
              .filter(F.col("_docs") >= 2).select("_h"))
    per_doc = (
        grams.join(shared.withColumn("_dup", F.lit(1)), "_h", "left")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_windows"),
             F.sum(F.coalesce("_dup", F.lit(0))).alias("_n_dup"))
        .select(F.col("_id").alias(id_col), "n_windows",
                F.round(F.col("_n_dup") / F.col("n_windows"), 6)
                .alias("dup_frac"))
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(id_col,
                F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                F.coalesce("dup_frac", F.lit(0.0)).alias("dup_frac"))
    )


def remove_duplicate_passages(df: DataFrame, n: int = 20, min_docs: int = 2,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Cut inter-document duplicated passages OUT of the text — the
    removal counterpart of duplicate_passage_fraction (the Lee et al.
    2022 / RefinedWeb exact-substring dedup, re-expressed at word
    granularity): every word covered by a sliding ``n``-word window that
    occurs in >= ``min_docs`` DISTINCT documents is dropped; the
    survivors re-join with single spaces. Within-doc repeats don't
    trigger removal (that's repetition_stats territory).

    Scale shape: the duplicate-window discovery is identical to
    duplicate_passage_fraction — only (doc, 64-bit window hash, position)
    rows enter the shuffles; full text joins back by id once, and the
    span-coverage cut is pure Column array logic (the flagged-positions
    array is bounded by the doc's own window count). The per-word
    coverage test is O(words × flagged windows) per doc; flagged windows
    are rare after the min_docs filter, and the inner probe is over a
    plain column reference (cheap per element — not the _word_ngrams
    re-evaluation pitfall, which only bites for expensive free
    EXPRESSIONS)."""
    from webcrawl_spark.operators.textstats import _word_ngram_hashes, _words

    # array-hashed grams, pinned for the two consumers — see
    # duplicate_passage_fraction (10× probe: 14.9 → 6.1 s combined)
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            _word_ngram_hashes(_words(F.col(text_col)), n))
        .alias("_pos", "_h"),
    ).localCheckpoint(eager=False)
    shared = (grams.groupBy("_h")
              .agg(F.countDistinct("_id").alias("_docs"))
              .filter(F.col("_docs") >= min_docs).select("_h"))
    flagged = (
        grams.join(shared, "_h")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_flagged"))
        .select(F.col("_id").alias(id_col), "_flagged")
    )

    # span-coverage cut in ONE vectorized Arrow stage: the r5 Catalyst
    # shape tested every word with an `exists` over the flagged starts —
    # O(words × flagged) interpreted HOF evaluations per doc, which IS the
    # operator on duplicate-heavy corpora (the 20× probe corpus flags
    # nearly every position). A difference array (+1 at p, −1 at p+n;
    # cumsum > 0 = covered) is O(words + flagged) in numpy. Words are
    # split JVM-side (the oracle's regex semantics) and only (words,
    # flagged starts) cross the Arrow boundary.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def rebuild(words, fl):
        texts, n_w, n_r = [], [], []
        for ws, starts in zip(words, fl):
            ws = [] if ws is None else list(ws)
            m = len(ws)
            if starts is None or len(starts) == 0 or m == 0:
                texts.append(" ".join(ws))
                n_w.append(m)
                n_r.append(0)
                continue
            p = np.asarray(starts, dtype=np.int64)
            delta = np.zeros(m + 1, dtype=np.int64)
            np.add.at(delta, np.minimum(p, m), 1)
            np.add.at(delta, np.minimum(p + n, m), -1)
            covered = np.cumsum(delta[:m]) > 0
            kept = [w for w, c in zip(ws, covered) if not c]
            texts.append(" ".join(kept))
            n_w.append(m)
            n_r.append(m - len(kept))
        return pd.DataFrame({"clean_text": texts, "n_words": n_w,
                             "n_removed": n_r})

    rebuild_udf = pandas_udf(rebuild, T.StructType([
        T.StructField("clean_text", T.StringType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_removed", T.IntegerType()),
    ]))
    joined = df.join(flagged, id_col, "left").withColumn(
        "_rb", rebuild_udf(_words(F.col(text_col)), F.col("_flagged")))
    return joined.select(
        id_col,
        F.col("_rb.clean_text").alias("clean_text"),
        F.col("_rb.n_words").alias("n_words"),
        F.col("_rb.n_removed").alias("n_removed"),
    )


def chunk_documents(df: DataFrame, max_words: int = 128, overlap: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token windows (embedding / context
    packing prep): chunk i covers words [i*(max_words-overlap),
    +max_words). Per-row array ops + one generator explode — no shuffle,
    no Python. Zero-word documents yield zero chunks."""
    if overlap >= max_words:
        raise ValueError("overlap must be < max_words")
    from webcrawl_spark.operators.textstats import _words

    step = max_words - overlap

    # bind the split-words array as a lambda VARIABLE (one-element outer
    # transform) — referencing the raw split() expression inside the
    # per-start lambda would re-split the whole document once per chunk
    # (the _word_ngrams per-element re-evaluation pitfall)
    def gen(w):
        n = F.size(w)
        # last start = smallest multiple of step whose window reaches the
        # end; later starts would emit chunks strictly contained in that
        # one (duplicate content shipped into the embedding/packing corpus)
        last_start = F.when(
            n > max_words,
            (n - max_words) + F.pmod(-(n - max_words), F.lit(step)),
        ).otherwise(F.lit(0))
        starts = F.when(
            n > 0, F.sequence(F.lit(0), last_start, F.lit(step))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(starts, lambda s: F.slice(w, s + 1, max_words))

    chunks = F.transform(F.array(_words(F.col(text_col))), gen)[0]
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_chunk"),
    ).select(
        id_col, "chunk_id",
        F.array_join("_chunk", " ").alias("chunk_text"),
        F.size("_chunk").alias("n_words_chunk"),
    )
