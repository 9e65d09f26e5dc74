"""BPE tokenizer: hand-checked merges on the literature's toy corpus,
pure-python reference parity for the distributed encoder, and
partitioning invariance of training."""

import re

import pytest
from pyspark.sql import functions as F

from webcrawl_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_text,
    train_bpe,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


class TestTrainBpe:
    def test_toy_corpus_merges(self, spark):
        """The Sennrich-paper-style toy corpus: hug x10, pug x5, pun x12,
        bun x4, hugs x5. Verified by hand below; ties break
        lexicographically."""
        texts = (["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12
                 + ["bun"] * 4 + ["hugs"] * 5)
        merges = train_bpe(_docs(spark, texts), n_merges=3)
        # pair counts round 1: ('u','g')=20, ('u','n')=16, ('h','u')=15 ...
        assert merges[0] == ("u", "g")
        # round 2: ('u','n') and ('n',EOW) tie at 16 — lexicographic
        # tie-break picks ('n','</w>') ('<' sorts below letters)
        assert merges[1] == ("n", EOW)
        # round 3: ('u','n</w>')=16 beats ('h','ug')=15 and ('ug',EOW)=15
        assert merges[2] == ("u", "n" + EOW)

    def test_deterministic_tiebreak(self, spark):
        """'ab' and 'cd' both appear once: ('a','b') vs ('c','d') tie at
        1... along with ('b',EOW) and ('d',EOW). Lexicographic order picks
        ('a','b') first."""
        merges = train_bpe(_docs(spark, ["ab cd"]), n_merges=1)
        assert merges[0] == ("a", "b")

    def test_partitioning_invariance(self, spark):
        texts = ["the cat sat on the mat"] * 7 + ["a dog ate a bone"] * 3
        df = _docs(spark, texts)
        m1 = train_bpe(df.repartition(1), n_merges=8)
        m2 = train_bpe(df.repartition(13), n_merges=8)
        assert m1 == m2

    def test_max_words_slice_is_deterministic(self, spark):
        df = _docs(spark, ["aa bb cc dd ee ff gg hh"] * 2)
        m1 = train_bpe(df, n_merges=4, max_words=3)
        m2 = train_bpe(df, n_merges=4, max_words=3)
        assert m1 == m2

    def test_word_counts(self, spark):
        got = {r["word"]: r["cnt"] for r in
               word_counts(_docs(spark, ["a b a", "b a"])).collect()}
        assert got == {"a": 3, "b": 2}


class TestBpeEncode:
    def test_udf_matches_reference_encoder(self, spark):
        texts = (["the hug of the pug"] * 6 + ["pun bun hugs fun"] * 4
                 + ["unseen vocabulary words appear here"] * 2)
        df = _docs(spark, texts)
        merges = train_bpe(df, n_merges=20)
        got = {r["doc_id"]: r["bpe_tokens"]
               for r in bpe_encode(df, merges).collect()}

        ranks = {p: i for i, p in enumerate(merges)}
        word_re = re.compile(r"[^\w]+", re.ASCII)
        for i, t in enumerate(texts):
            assert got[i] == bpe_encode_text(t, ranks, {}, word_re), i

    def test_roundtrip_concatenation(self, spark):
        """Stripping EOW markers and concatenating tokens reconstructs
        the lowercased words exactly — BPE is a segmentation, lossless."""
        df = _docs(spark, ["Hello World", "the quick brown fox"])
        merges = train_bpe(df, n_merges=10)
        for r in bpe_encode(df, merges).collect():
            joined = "".join(r["bpe_tokens"]).replace(EOW, " ").strip()
            words = " ".join(
                w for w in re.split(r"[^\w]+", r["text"].lower()) if w)
            assert joined == words

    def test_empty_and_null_text(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id int, text string")
        got = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
        assert got[1]["bpe_tokens"] == [] and got[1]["n_bpe_tokens"] == 0
        assert got[2]["bpe_tokens"] == [] and got[2]["n_bpe_tokens"] == 0

    def test_merge_order_is_rank_not_greedy_length(self, spark):
        """Encoding replays merges by RANK: with merges [(a,b),(b,c)] the
        word 'abc' becomes [ab, c</w>] — rank 0 wins even though (b,c)
        also matches."""
        df = _docs(spark, ["abc"])
        got = bpe_encode(df, [("a", "b"), ("b", "c")]).first()["bpe_tokens"]
        assert got == ["ab", "c", EOW]

    def test_zipf_cache_correctness_across_batches(self, spark):
        """Repeated words across many rows hit the per-worker cache —
        results must equal the uncached reference."""
        texts = ["hug hug hug pun"] * 50
        df = _docs(spark, texts).repartition(4)
        merges = train_bpe(df, n_merges=5)
        ranks = {p: i for i, p in enumerate(merges)}
        word_re = re.compile(r"[^\w]+", re.ASCII)
        exp = bpe_encode_text(texts[0], ranks, {}, word_re)
        for r in bpe_encode(df, merges).collect():
            assert r["bpe_tokens"] == exp
