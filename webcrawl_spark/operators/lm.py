"""Language-model corpus scoring and training-window layout: unigram LM
training, CCNet-style document perplexity with head/middle/tail buckets,
DSIR hashed-n-gram importance weights, and deterministic sequence packing.

These are the filtering/weighting stages a webtext training pipeline runs
after cleaning (C4/Gopher rules) and before tokenization:

- CCNet (Wenzek et al. 2020) scores every document with an LM trained on
  a trusted corpus and keeps the low-perplexity "head" bucket.
- DSIR (Xie et al. 2023) reweights a raw corpus toward a target domain by
  the log-ratio of hashed-n-gram feature probabilities.
- Sequence packing is the GPT-style concat-and-slice layout: documents
  (plus a separator token) are laid end-to-end in a deterministic order
  and cut into fixed-length training windows.

Scale posture: LM training is one shuffle on token; scoring is one join
(broadcast when the vocab/bucket table is small) plus one per-doc
aggregation; packing uses a two-phase distributed prefix sum (per-range
window + a #partitions-row offset table) — no global single-partition
window anywhere. All float outputs are exposed on a 1e-9 integer grid so
the DuckDB oracles compare exactly (summation-order jitter ~1e-15 is far
below the grid; the hostrank/q_hits precedent).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from webcrawl_spark.operators.corpus import sample_bucket
from webcrawl_spark.operators.textstats import _word_ngrams, _words

__all__ = [
    "train_unigram_lm",
    "train_bigram_lm",
    "score_perplexity",
    "score_perplexity_bigram",
    "perplexity_buckets",
    "dsir_weights",
    "pack_sequences",
]


def _nano(col: Column) -> Column:
    """Project a double onto the 1e-9 integer grid (bigint) so Spark and
    the DuckDB oracle agree despite summation-order / libm last-bit
    jitter (~1e-15 relative, six orders below the grid)."""
    return F.round(col * 1e9, 0).cast("long")


def train_unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram counts over the word tokens of ``df[text_col]`` — the LM
    table ``(token, cnt)``. One explode + one shuffle on token; at
    corpus scale the vocabulary is orders of magnitude smaller than the
    token stream, so map-side partial aggregation does the heavy
    reduction."""
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count("*").alias("cnt"))
    )


def train_bigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-bigram counts ``(gram, cnt)`` where ``gram`` is the
    space-joined pair — the order-2 LM table (CCNet trains order-5; the
    conditional-probability scoring shape below is identical at any
    order, only the gram width changes). Same one-explode/one-shuffle
    shape as train_unigram_lm."""
    return (
        df.select(F.explode(
            _word_ngrams(_words(F.col(text_col)), 2)).alias("gram"))
        .groupBy("gram").agg(F.count("*").alias("cnt"))
    )


def score_perplexity_bigram(df: DataFrame, lm: DataFrame,
                            add_k: float = 1.0, text_col: str = "text",
                            id_col: str = "doc_id",
                            broadcast_lm: bool = True) -> DataFrame:
    """Per-document CONDITIONAL bigram log-probability and perplexity:

        p(w2 | w1) = (c(w1 w2) + k) / (c_ctx(w1) + k * (V_cont + 1))

    with ``c_ctx(w1)`` the bigram-start count and ``V_cont`` the number
    of distinct continuation types — both derived from the trained table
    itself, so the scorer needs only ``lm``. Documents with < 2 words
    have no transitions and keep NULL scores (the unigram scorer's
    empty-doc convention). Shapes: one explode, one gram join + one
    context join (both broadcast by default), one per-doc aggregation —
    the unigram scorer's plan with one extra small join."""
    # pin the LM: it is consumed three times (context aggregation, V_cont
    # count, gram join) and is usually an unmaterialized explode+groupBy
    # over the training corpus — without the pin the corpus is re-tokenized
    # and re-shuffled for each consumer (guide §5: cut lineage of reused
    # intermediates; the vocab table is orders smaller than the corpus)
    lm = lm.localCheckpoint(eager=False)
    ctx = lm.select(F.substring_index("gram", " ", 1).alias("w1"), "cnt") \
        .groupBy("w1").agg(F.sum("cnt").alias("ctx_cnt"))
    v_cont = lm.select(
        F.substring_index("gram", " ", -1).alias("w2")
    ).distinct().count()

    grams = df.select(
        id_col,
        F.explode(_word_ngrams(_words(F.col(text_col)), 2)).alias("gram"),
    ).withColumn("w1", F.substring_index("gram", " ", 1))
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    ctx_side = F.broadcast(ctx) if broadcast_lm else ctx
    scored = (
        grams.join(lm_side, "gram", "left").join(ctx_side, "w1", "left")
        .select(
            id_col,
            (F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(add_k))
             - F.log(F.coalesce(F.col("ctx_cnt"), F.lit(0))
                     + F.lit(add_k * (v_cont + 1)))).alias("lp"),
            F.col("cnt").isNull().cast("long").alias("oov"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"),
             F.sum("oov").alias("n_oov"),
             F.avg("lp").alias("avg_lp"))
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            _nano(F.col("avg_lp")).alias("avg_lp_nano"),
            _nano(F.exp(-F.col("avg_lp"))).alias("ppl_nano"),
        )
    )


def score_perplexity(df: DataFrame, lm: DataFrame, add_k: float = 1.0,
                     text_col: str = "text", id_col: str = "doc_id",
                     broadcast_lm: bool = True) -> DataFrame:
    """Per-document unigram log-probability and perplexity under ``lm``
    (add-k smoothed over V known types + one OOV type):

        p(token) = (cnt + k) / (N + k * (V + 1));  p(OOV) = k / (same)

    Returns every input document with ``n_tokens``, ``n_oov``,
    ``avg_lp_nano`` (mean token log-prob on the 1e-9 grid) and
    ``ppl_nano`` (exp(-mean), same grid); empty documents keep NULL
    scores. Shapes: one explode, one token join (broadcast by default —
    a real-corpus vocab is ~1e6-1e8 rows, so flip ``broadcast_lm=False``
    to shuffle-join instead), one per-doc aggregation."""
    # pin the LM: consumed twice (totals + the scoring join); unpinned, the
    # training corpus behind it would be tokenized and shuffled twice
    lm = lm.localCheckpoint(eager=False)
    totals = lm.agg(F.sum("cnt").alias("n"), F.count("*").alias("v")).first()
    n_total = int(totals["n"] or 0)
    vocab = int(totals["v"] or 0)
    ln_denom = math.log(n_total + add_k * (vocab + 1))

    toks = df.select(id_col, F.explode(_words(F.col(text_col))).alias("token"))
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    scored = (
        toks.join(lm_side, "token", "left")
        .select(
            id_col,
            (F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(add_k))
             - F.lit(ln_denom)).alias("lp"),
            F.col("cnt").isNull().cast("long").alias("oov"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"),
             F.sum("oov").alias("n_oov"),
             F.avg("lp").alias("avg_lp"))
    )
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            _nano(F.col("avg_lp")).alias("avg_lp_nano"),
            _nano(F.exp(-F.col("avg_lp"))).alias("ppl_nano"),
        )
    )


def perplexity_buckets(scored: DataFrame, probs: tuple[float, float] = (1 / 3, 2 / 3),
                       exact: bool = True) -> DataFrame:
    """CCNet's head/middle/tail split: documents at or below the
    ``probs[0]`` perplexity percentile are ``head`` (keep), below
    ``probs[1]`` ``middle``, the rest ``tail`` (drop). Cutoffs are
    percentiles of ``ppl_nano`` — integers, so Spark and the DuckDB
    oracle interpolate identical values. ``exact=True`` uses the exact
    percentile aggregate (oracle/test path — it buffers the group's
    values); at 100-TB scale use ``exact=False`` for
    ``approx_percentile`` (bounded-memory sketch, same plan shape)."""
    vals = scored.filter(F.col("ppl_nano").isNotNull())
    pcts = list(probs)
    if exact:
        cuts_row = vals.agg(
            F.percentile("ppl_nano", pcts).alias("c")).first()
    else:
        cuts_row = vals.agg(
            F.approx_percentile("ppl_nano", pcts, 10000).alias("c")).first()
    if cuts_row["c"] is None:
        # empty input / all-null ppl_nano: no percentiles exist — every row
        # keeps a NULL bucket (the scorer's empty-doc convention)
        return scored.withColumn("ppl_bucket",
                                 F.lit(None).cast("string"))
    c1, c2 = [float(c) for c in cuts_row["c"]]
    bucket = (
        F.when(F.col("ppl_nano").isNull(), F.lit(None).cast("string"))
        .when(F.col("ppl_nano") <= c1, F.lit("head"))
        .when(F.col("ppl_nano") <= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.withColumn("ppl_bucket", bucket)


def dsir_weights(df: DataFrame, target: DataFrame, n: int = 2,
                 n_buckets: int = 4096, add_k: float = 1.0,
                 text_col: str = "text", id_col: str = "doc_id",
                 salt: str = "dsir") -> DataFrame:
    """DSIR importance weights: hash each word ``n``-gram into one of
    ``n_buckets`` buckets (md5-salted so the DuckDB oracle recomputes the
    same buckets), estimate add-k-smoothed bucket distributions on the
    ``target`` corpus and on ``df`` itself (the raw/source corpus), and
    weight every document by the sum over its gram instances of
    ``log(p_target(bucket) / p_source(bucket))``. High weight = looks
    like the target domain; sample with
    ``deterministic_sample``-style salted draws against
    ``exp(weight)`` to realize the resampling.

    Shapes: two bucket-count aggregations (output ≤ n_buckets rows each),
    one broadcast join of the ≤ n_buckets log-ratio table onto the
    exploded gram stream, one per-doc sum. Nothing grows with corpus
    size except the gram stream itself."""
    def grams(frame: DataFrame, *cols: str) -> DataFrame:
        gram = F.explode(
            _word_ngrams(_words(F.col(text_col)), n)).alias("gram")
        return frame.select(*cols, gram).select(
            *cols, (sample_bucket(F.col("gram"), salt) % n_buckets)
            .alias("bucket"))

    # ONE gram pass over each corpus (was three over ``df`` and two over
    # ``target``: every .first() and every downstream consumer re-exploded
    # and re-md5'd the text). The source side reduces once to per-doc
    # bucket counts — the sufficient statistic for BOTH the source
    # distribution (sum over docs) and the per-doc weights (cnt·logratio);
    # the pinned tables are ≤ docs×buckets-per-doc and ≤ n_buckets rows.
    gcounts = (
        grams(df, id_col)
        .groupBy(id_col, "bucket").agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tgt = (grams(target).groupBy("bucket")
           .agg(F.count("*").alias("cnt_t"))
           .localCheckpoint(eager=False))
    src = (gcounts.groupBy("bucket").agg(F.sum("cnt").alias("cnt_s"))
           .localCheckpoint(eager=False))
    n_t = tgt.agg(F.sum("cnt_t")).first()[0] or 0
    n_s = src.agg(F.sum("cnt_s")).first()[0] or 0
    ratios = (
        src.join(tgt, "bucket", "outer")
        .select(
            "bucket",
            (F.log(F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(add_k))
             - F.lit(math.log(n_t + add_k * n_buckets))
             - F.log(F.coalesce(F.col("cnt_s"), F.lit(0)) + F.lit(add_k))
             + F.lit(math.log(n_s + add_k * n_buckets))).alias("logratio"),
        )
    )
    per_doc = (
        gcounts
        .join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum("cnt").alias("n_grams"),
             F.sum(F.col("logratio") * F.col("cnt")).alias("w"))
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            _nano(F.col("w")).alias("dsir_weight_nano"),
        )
    )


def pack_sequences(df: DataFrame, seq_len: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   tokens_col: str | None = None,
                   sep_tokens: int = 1) -> DataFrame:
    """GPT-style concat-and-slice layout: documents ordered by ``id_col``
    are laid end-to-end (each followed by ``sep_tokens`` separator
    tokens) and the stream is cut into fixed ``seq_len`` training
    windows. Returns per-document placement: ``token_offset`` (exclusive
    prefix sum), ``first_seq``/``last_seq`` (window ids the document
    spans) and ``n_seqs``.

    The prefix sum is the textbook two-phase distributed scan, NOT a
    global single-partition window: range-partition by id, per-partition
    running sum via a window keyed on the partition id, then add each
    partition's exclusive offset from a #partitions-row table computed
    in one tiny aggregation (RangePartitioner assigns ascending key
    ranges to ascending partition ids, so partition order IS key
    order). Survives any corpus size the range partitioner survives."""
    n_tok = (F.col(tokens_col) if tokens_col
             else F.size(_words(F.col(text_col)))).cast("long")
    base = (
        df.select(id_col, (n_tok + sep_tokens).alias("_span"))
        .repartitionByRange(id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (Window.partitionBy("_pid").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # Pin BEFORE the offsets collect: repartitionByRange resamples its range
    # bounds per execution (and AQE can change partition counts), so an
    # unpinned plan could assign different _pid/_run values in the offsets
    # pass vs the returned join — silently wrong placements, and rows whose
    # _pid is absent from off_df dropped by the inner join. The pin also
    # halves the work: the tokenize+shuffle runs once, not twice.
    local = base.withColumn("_run", F.sum("_span").over(w)) \
        .localCheckpoint(eager=True)
    part_totals = (
        local.groupBy("_pid").agg(F.max("_run").alias("_total"))
        .orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for row in part_totals:
        offsets[row["_pid"]] = acc
        acc += row["_total"]
    off_df = local.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        "_pid int, _off long")
    start = F.col("_off") + F.col("_run") - F.col("_span")
    end = F.col("_off") + F.col("_run") - 1          # inclusive last token
    return (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            id_col,
            (F.col("_span") - sep_tokens).alias("n_tokens"),
            start.alias("token_offset"),
            (start / seq_len).cast("long").alias("first_seq"),
            (end / seq_len).cast("long").alias("last_seq"),
            ((end / seq_len).cast("long")
             - (start / seq_len).cast("long") + 1).alias("n_seqs"),
        )
    )
