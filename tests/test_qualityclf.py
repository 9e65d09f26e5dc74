"""fastText-style quality classifier: hashed features, distributed
training convergence, numpy parity, and oracle-exact integer inference."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawl_spark.operators.qualityclf import (
    hashed_gram_counts,
    score_quality,
    train_quality_classifier,
    weights_to_nano,
)


def _bucket(gram: str, salt: str = "qclf", n_buckets: int = 64) -> int:
    return int(hashlib.md5((salt + gram).encode()).hexdigest()[:8], 16) \
        % n_buckets


class TestHashedGramCounts:
    def test_unigrams_and_bigrams(self, spark):
        df = spark.createDataFrame(
            [(1, "Good clean page")], "doc_id long, text string")
        rows = hashed_gram_counts(df, n_buckets=64, n_max=2).collect()
        got = {(r["bucket"]): r["cnt"] for r in rows}
        grams = ["good", "clean", "page", "good clean", "clean page"]
        want: dict[int, int] = {}
        for g in grams:
            want[_bucket(g)] = want.get(_bucket(g), 0) + 1
        assert got == want

    def test_short_doc_has_no_bigrams(self, spark):
        df = spark.createDataFrame(
            [(1, "word")], "doc_id long, text string")
        rows = hashed_gram_counts(df, n_buckets=64, n_max=2).collect()
        assert len(rows) == 1 and rows[0]["cnt"] == 1

    def test_empty_doc_yields_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "  ")], "doc_id long, text string")
        assert hashed_gram_counts(df, n_buckets=64).count() == 0


def _corpus(spark, n_per_class=40, seed=5):
    """Separable two-class corpus: quality docs draw from an 'article'
    vocabulary, junk docs from a 'spam' one, with shared filler."""
    rng = np.random.RandomState(seed)
    good_v = ["research", "history", "chapter", "analysis", "evidence",
              "theory", "method", "results"]
    bad_v = ["winner", "click", "casino", "free", "bonus", "jackpot",
             "prize", "offer"]
    filler = ["the", "a", "of", "and", "page", "site"]
    rows = []
    for i in range(n_per_class):
        words = [good_v[rng.randint(8)] for _ in range(12)] \
            + [filler[rng.randint(6)] for _ in range(6)]
        rng.shuffle(words)
        rows.append((i, " ".join(words), 1))
    for i in range(n_per_class):
        words = [bad_v[rng.randint(8)] for _ in range(12)] \
            + [filler[rng.randint(6)] for _ in range(6)]
        rng.shuffle(words)
        rows.append((n_per_class + i, " ".join(words), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestTraining:
    def test_converges_on_separable_corpus(self, spark):
        df = _corpus(spark)
        w, b = train_quality_classifier(
            df, n_buckets=256, iters=25, lr=4.0, l2=0.0)
        wn, bn = weights_to_nano(w, b)
        scored = score_quality(df, wn, bn, salt="qclf") \
            .join(df.select("doc_id", "label"), "doc_id")
        acc = scored.filter(
            F.col("quality").cast("int") == F.col("label")).count() \
            / scored.count()
        assert acc >= 0.95, f"accuracy {acc}"

    def test_matches_numpy_reference(self, spark):
        # the distributed gradient loop must track a dense numpy
        # implementation of the same full-batch updates
        df = _corpus(spark, n_per_class=15, seed=9)
        n_buckets, iters, lr = 64, 5, 1.0
        w, b = train_quality_classifier(
            df, n_buckets=n_buckets, iters=iters, lr=lr, l2=0.0)

        rows = df.select("doc_id", "text", "label").collect()
        X = np.zeros((len(rows), n_buckets))
        y = np.zeros(len(rows))
        for k, r in enumerate(rows):
            ws = [t for t in r["text"].lower().split() if t]
            grams = ws + [" ".join(ws[i:i + 2])
                          for i in range(len(ws) - 1)]
            for g in grams:
                X[k, _bucket(g, n_buckets=n_buckets)] += 1
            X[k] /= len(grams)
            y[k] = r["label"]
        wr = np.zeros(n_buckets)
        br = 0.0
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(X @ wr + br)))
            wr -= lr * (X.T @ (p - y)) / len(rows)
            br -= lr * (p - y).mean()
        assert np.allclose(w, wr, atol=1e-9)
        assert abs(b - br) < 1e-9


class TestScoreQuality:
    def test_integer_scoring_is_partition_invariant(self, spark):
        df = _corpus(spark, n_per_class=20)
        rng = np.random.RandomState(13)
        wn = [int(x) for x in
              np.round(rng.standard_normal(128) * 2e8).astype("int64")]
        a = score_quality(df, wn, -5, salt="s").orderBy("doc_id").collect()
        b = score_quality(df.repartition(7), wn, -5, salt="s") \
            .orderBy("doc_id").collect()
        assert a == b

    def test_zero_gram_doc_falls_back_to_bias(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "some words here")], "doc_id long, text string")
        pos = score_quality(df, [10] * 16, 5).orderBy("doc_id").collect()
        assert pos[0]["n_grams"] == 0 and pos[0]["logit_nano"] == 0
        assert pos[0]["quality"] is True
        neg = score_quality(df, [10] * 16, -5).orderBy("doc_id").collect()
        assert neg[0]["quality"] is False

    def test_weight_join_broadcasts(self, spark):
        df = _corpus(spark, n_per_class=5)
        plan = score_quality(df, [1] * 32, 0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
