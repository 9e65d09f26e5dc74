"""fastText-style quality classifier: hashed word-n-gram features into a
logistic model — the "does this page look like the reference corpus" gate
(CCNet trains one vs Wikipedia; LLaMA filters CommonCrawl with one).

Two halves, split by where determinism matters:

- train_quality_classifier: DISTRIBUTED logistic regression. Per
  iteration: one broadcast join of the (≤ n_buckets)-row weight table
  onto the cached per-doc bucket counts, one per-doc logit aggregation,
  one per-bucket gradient aggregation (≤ n_buckets rows back to the
  driver). The feature matrix never leaves the cluster; only the dense
  weight vector moves. Float math — training tolerances are pytest-gated,
  not oracle-gated.
- score_quality: INFERENCE on integer nano-unit weights. The per-doc
  accumulation is pure int64 (count × weight_nano), so it is exactly
  associative — no summation-order or libm hazard anywhere, and the SQL
  oracle reproduces it bit-for-bit. The decision rule
  ``sum(cnt*w_nano) + bias_nano * n_grams > 0`` is the normalized
  fastText logit ``mean(w·x) + b > 0`` cleared of the division.

Features are md5-salted hashed buckets (sample_bucket) so an oracle can
recompute them; unigrams + bigrams by default, fastText's wordNgrams=2.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcrawl_spark.operators.corpus import sample_bucket
from webcrawl_spark.operators.textstats import _word_ngrams, _words

__all__ = [
    "hashed_gram_counts",
    "train_quality_classifier",
    "score_quality",
    "weights_to_nano",
]


def _gram_array(text: Column, n_max: int) -> Column:
    """words ++ 2-grams ++ ... ++ n_max-grams, space-joined strings."""
    ws = _words(text)
    arr = ws
    for n in range(2, n_max + 1):
        arr = F.concat(arr, _word_ngrams(ws, n))
    return arr


def hashed_gram_counts(df: DataFrame, n_buckets: int = 4096,
                       n_max: int = 2, salt: str = "qclf",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document hashed-gram counts ``(id, bucket, cnt)`` — the sparse
    feature matrix. One explode + one (id, bucket) aggregation; the text
    column never shuffles (only 8-byte keys and counts do)."""
    return (
        df.select(F.col(id_col),
                  F.explode(_gram_array(F.col(text_col), n_max))
                  .alias("gram"))
        .select(F.col(id_col),
                (sample_bucket(F.col("gram"), salt) % n_buckets)
                .alias("bucket"))
        .groupBy(id_col, "bucket").agg(F.count("*").alias("cnt"))
    )


def train_quality_classifier(df: DataFrame, n_buckets: int = 4096,
                             n_max: int = 2, salt: str = "qclf",
                             iters: int = 30, lr: float = 2.0,
                             l2: float = 1e-4,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             label_col: str = "label") -> tuple[np.ndarray, float]:
    """Distributed full-batch logistic regression on normalized hashed-gram
    counts (x_b = cnt_b / n_grams, fastText's mean pooling). Returns
    ``(weights[n_buckets], bias)`` as floats — feed through
    ``weights_to_nano`` for oracle-exact scoring.

    Each iteration is two narrow shuffles over the CACHED count table:
    logits (join broadcast weights → groupBy id) and gradients (join
    per-doc error → groupBy bucket). Only ≤ n_buckets + 1 numbers cross
    the driver boundary per iteration."""
    spark = df.sparkSession
    counts = hashed_gram_counts(
        df, n_buckets, n_max, salt, text_col, id_col)
    norm = counts.groupBy(id_col).agg(F.sum("cnt").alias("n_grams"))
    feats = (
        counts.join(norm, id_col)
        .select(id_col, "bucket",
                (F.col("cnt") / F.col("n_grams")).alias("x"))
        .localCheckpoint(eager=True)
    )
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("y"))
    # docs whose text yields zero grams are excluded from training entirely
    # (they have no feature rows, so they appear in neither the gradient nor
    # the bias term, and n_docs counts only the docs the error sum covers)
    labeled = labels.join(
        feats.select(id_col).distinct(), id_col, "left_semi")
    n_docs = labeled.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: no non-empty documents")

    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(int(i), float(w[i])) for i in range(n_buckets)],
            "bucket long, w double")
        err = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.coalesce("w", F.lit(0.0)))
                 .alias("dot"))
            .join(labels, id_col)
            .select(id_col,
                    (F.lit(1.0) / (F.lit(1.0)
                                   + F.exp(-(F.col("dot") + F.lit(b)))
                                   ) - F.col("y")).alias("e"))
            .localCheckpoint(eager=True)
        )
        grad_rows = (
            feats.join(err, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("e") * F.col("x")).alias("g"))
            .collect()
        )
        g = np.zeros(n_buckets)
        for r in grad_rows:
            g[r["bucket"]] = r["g"]
        gb = err.agg(F.sum("e")).first()[0] or 0.0
        w -= lr * (g / n_docs + l2 * w)
        b -= lr * gb / n_docs
    return w, b


def weights_to_nano(w: np.ndarray, b: float) -> tuple[list[int], int]:
    """Project trained float weights onto the 1e-9 integer grid for
    oracle-exact inference (the hostrank/q_hits integer-nano trick)."""
    return [int(round(float(x) * 1e9)) for x in w], int(round(b * 1e9))


def score_quality(df: DataFrame, weights_nano: Sequence[int],
                  bias_nano: int, n_max: int = 2, salt: str = "qclf",
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Inference: ``(id, n_grams, logit_nano, quality)`` where
    ``logit_nano = Σ cnt_b * w_nano_b`` (pure int64) and
    ``quality ⇔ logit_nano + bias_nano * n_grams > 0`` — the normalized
    logit cleared of its division so every engine computes the identical
    integers. Zero-gram docs get quality = (bias_nano > 0). The weight
    table (n_buckets rows) broadcast-joins onto the count stream; text
    never shuffles."""
    spark = df.sparkSession
    n_buckets = len(weights_nano)
    wdf = spark.createDataFrame(
        [(int(i), int(weights_nano[i])) for i in range(n_buckets)],
        "bucket long, w_nano long")
    # broadcast-join the weights straight onto the gram stream and reduce
    # per doc in ONE aggregation: Σ_instances w_nano ≡ Σ_b cnt_b·w_nano_b
    # (pure int64, exactly associative), so the r5 (id, bucket) count
    # shuffle bought nothing — map-side partial aggregation now compresses
    # each doc to one row per map task before the only shuffle
    grams = (
        df.select(F.col(id_col),
                  F.explode(_gram_array(F.col(text_col), n_max))
                  .alias("gram"))
        .select(F.col(id_col),
                (sample_bucket(F.col("gram"), salt) % n_buckets)
                .alias("bucket"))
    )
    per_doc = (
        grams.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"),
             F.sum(F.coalesce("w_nano", F.lit(0)))
             .alias("logit_nano"))
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("logit_nano", F.lit(0)).cast("long")
            .alias("logit_nano"),
            (F.coalesce("logit_nano", F.lit(0))
             + F.lit(int(bias_nano)) * F.coalesce("n_grams", F.lit(1))
             > 0).alias("quality"),
        )
    )
