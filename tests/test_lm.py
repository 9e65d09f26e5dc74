"""LM-based corpus scoring: unigram perplexity (CCNet), DSIR importance
weights, sequence packing. Hand-computed expectations + a naive-window
parity check for the distributed prefix sum."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from webcrawl_spark.operators.lm import (
    dsir_weights,
    pack_sequences,
    perplexity_buckets,
    score_perplexity,
    train_unigram_lm,
)


class TestUnigramPerplexity:
    def test_hand_computed_logprob(self, spark):
        # corpus: "a a b" -> counts a=2, b=1; N=3, V=2, k=1
        df = spark.createDataFrame([(1, "a a b")], "doc_id int, text string")
        lm = train_unigram_lm(df)
        got = score_perplexity(df, lm).first()
        denom = math.log(3 + 1 * (2 + 1))
        avg_lp = (2 * (math.log(2 + 1) - denom)
                  + 1 * (math.log(1 + 1) - denom)) / 3
        assert got["n_tokens"] == 3 and got["n_oov"] == 0
        assert got["avg_lp_nano"] == round(avg_lp * 1e9)
        assert got["ppl_nano"] == round(math.exp(-avg_lp) * 1e9)

    def test_oov_against_held_out_lm(self, spark):
        train = spark.createDataFrame(
            [(1, "a a b")], "doc_id int, text string")
        test = spark.createDataFrame(
            [(9, "a zzz")], "doc_id int, text string")
        lm = train_unigram_lm(train)
        got = score_perplexity(test, lm).first()
        denom = math.log(3 + 1 * (2 + 1))
        avg_lp = ((math.log(3) - denom) + (math.log(1) - denom)) / 2
        assert got["n_oov"] == 1
        assert got["avg_lp_nano"] == round(avg_lp * 1e9)

    def test_empty_doc_keeps_null_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "")], "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               score_perplexity(df, train_unigram_lm(df)).collect()}
        assert got[2]["n_tokens"] == 0
        assert got[2]["avg_lp_nano"] is None and got[2]["ppl_nano"] is None

    def test_buckets_split_head_middle_tail(self, spark):
        # 6 docs with strictly increasing perplexity: common tokens ->
        # rare tokens. Percentile cutoffs at 1/3 and 2/3.
        rows = [(i, " ".join(["common"] * (6 - i) + [f"rare{i}"] * i))
                for i in range(1, 7)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        scored = score_perplexity(df, train_unigram_lm(df))
        got = {r["doc_id"]: r["ppl_bucket"]
               for r in perplexity_buckets(scored).collect()}
        assert [got[i] for i in range(1, 7)] == [
            "head", "head", "middle", "middle", "tail", "tail"]


class TestDsirWeights:
    def test_target_lookalikes_weighted_up(self, spark):
        rows = [
            (1, "the cat sat on the mat with the hat", "en"),
            (2, "the dog sat on the log with the fog", "en"),
            (3, "der hund sitzt auf dem baumstamm im nebel", "de"),
            (4, "", "en"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        target = df.filter(F.col("lang") == "en")
        got = {r["doc_id"]: r for r in
               dsir_weights(df, target, n=2, n_buckets=256).collect()}
        assert got[1]["dsir_weight_nano"] > got[3]["dsir_weight_nano"]
        assert got[2]["dsir_weight_nano"] > got[3]["dsir_weight_nano"]
        assert got[4]["n_grams"] == 0 and got[4]["dsir_weight_nano"] is None

    def test_gram_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d")], "doc_id int, text string")
        got = dsir_weights(df, df, n=2).first()
        assert got["n_grams"] == 3   # 3 bigrams from 4 words

    def test_self_target_weight_zero(self, spark):
        """target == source -> p_t == p_s for every bucket -> weight 0."""
        df = spark.createDataFrame(
            [(1, "x y z w"), (2, "p q r s")], "doc_id int, text string")
        for r in dsir_weights(df, df, n=2).collect():
            assert r["dsir_weight_nano"] == 0


class TestPackSequences:
    def test_hand_layout(self, spark):
        rows = [(1, "a b c d e f"), (2, "g h i j k"),
                (3, "l m n o p q"), (4, ""), (5, "r s t u v w")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               pack_sequences(df, seq_len=8).collect()}
        # spans (tokens+1 sep): 7,6,7,1,7 -> offsets 0,7,13,20,21
        assert [got[i]["token_offset"] for i in range(1, 6)] == [0, 7, 13, 20, 21]
        assert (got[2]["first_seq"], got[2]["last_seq"]) == (0, 1)
        assert (got[5]["first_seq"], got[5]["last_seq"]) == (2, 3)
        assert got[4]["n_seqs"] == 1     # empty doc still emits its separator

    def test_parity_with_naive_global_window(self, spark):
        rows = [(i, "tok " * ((i * 37) % 19 + 1)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id int, text string") \
                  .repartition(7)        # scramble input partitioning
        got = {r["doc_id"]: (r["token_offset"], r["first_seq"],
                             r["last_seq"], r["n_seqs"])
               for r in pack_sequences(df, seq_len=64).collect()}

        naive = (
            df.select("doc_id",
                      (F.size(F.split(F.trim(F.col("text")), r"\s+")) + 1)
                      .alias("span"))
            .withColumn("run", F.sum("span").over(
                Window.orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        )
        for r in naive.collect():
            start = r["run"] - r["span"]
            end = r["run"] - 1
            exp = (start, start // 64, end // 64, end // 64 - start // 64 + 1)
            assert got[r["doc_id"]] == exp, r["doc_id"]

    def test_no_single_partition_exchange(self, spark):
        """The distributed prefix sum must never funnel the corpus through
        a single partition (the naive global-window shape)."""
        rows = [(i, "w " * 10) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        plan = pack_sequences(df, seq_len=16)._jdf.queryExecution() \
                                               .executedPlan().toString()
        assert "SinglePartition" not in plan

    def test_every_token_covered_no_overlap(self, spark):
        """Adjacent docs tile the token stream: next offset = prev end+1."""
        rows = [(i, "x " * (i % 5 + 1)) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = sorted(
            (r["token_offset"], r["n_tokens"])
            for r in pack_sequences(df, seq_len=32).collect())
        pos = 0
        for off, n in out:
            assert off == pos
            pos = off + n + 1


class TestBigramPerplexity:
    def test_hand_computed_conditional_logprob(self, spark):
        # corpus "a a b a": bigrams (a a)=1, (a b)=1, (b a)=1;
        # ctx counts a=2, b=1; continuations {a, b} -> V_cont=2, k=1
        from webcrawl_spark.operators.lm import (
            score_perplexity_bigram, train_bigram_lm,
        )

        df = spark.createDataFrame([(1, "a a b a")],
                                   "doc_id int, text string")
        lm = train_bigram_lm(df)
        got = score_perplexity_bigram(df, lm).first()
        lp_aa = math.log(1 + 1) - math.log(2 + 1 * 3)
        lp_ab = math.log(1 + 1) - math.log(2 + 1 * 3)
        lp_ba = math.log(1 + 1) - math.log(1 + 1 * 3)
        avg_lp = (lp_aa + lp_ab + lp_ba) / 3
        assert got["n_bigrams"] == 3 and got["n_oov"] == 0
        assert got["avg_lp_nano"] == round(avg_lp * 1e9)
        assert got["ppl_nano"] == round(math.exp(-avg_lp) * 1e9)

    def test_oov_bigram_with_known_context(self, spark):
        from webcrawl_spark.operators.lm import (
            score_perplexity_bigram, train_bigram_lm,
        )

        train = spark.createDataFrame([(1, "a a b a")],
                                      "doc_id int, text string")
        test = spark.createDataFrame([(9, "a zzz")],
                                     "doc_id int, text string")
        lm = train_bigram_lm(train)
        got = score_perplexity_bigram(test, lm).first()
        # gram "a zzz" unseen, context a has ctx=2, V_cont=2, k=1
        lp = math.log(0 + 1) - math.log(2 + 1 * 3)
        assert got["n_oov"] == 1 and got["n_bigrams"] == 1
        assert got["avg_lp_nano"] == round(lp * 1e9)

    def test_short_doc_keeps_null_scores(self, spark):
        from webcrawl_spark.operators.lm import (
            score_perplexity_bigram, train_bigram_lm,
        )

        df = spark.createDataFrame(
            [(1, "a a b a"), (2, "word"), (3, "")],
            "doc_id int, text string")
        got = {r["doc_id"]: r for r in
               score_perplexity_bigram(df, train_bigram_lm(df)).collect()}
        for i in (2, 3):
            assert got[i]["n_bigrams"] == 0
            assert got[i]["avg_lp_nano"] is None

    def test_bigram_orders_fluency(self, spark):
        # the bigram LM separates in-order from shuffled text even when
        # the unigram distributions are IDENTICAL — the reason CCNet uses
        # an n-gram LM, demonstrated: same words, scrambled order
        from webcrawl_spark.operators.lm import (
            score_perplexity_bigram, train_bigram_lm,
        )

        train = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(20)],
            "doc_id int, text string")
        lm = train_bigram_lm(train)
        test = spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "mat the on sat cat the")],
            "doc_id int, text string")
        got = {r["doc_id"]: r["ppl_nano"]
               for r in score_perplexity_bigram(test, lm).collect()}
        assert got[1] < got[2]
