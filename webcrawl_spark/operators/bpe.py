"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed
encode — the tokenization stage between corpus curation and sequence
packing.

Algorithm: classic word-level BPE (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"): words
become character sequences with an end-of-word marker; training
repeatedly merges the most frequent adjacent symbol pair (ties broken
lexicographically so training is deterministic); encoding replays the
merge list in order.

Scale split: the STATISTICS are distributed, the merge LOOP is not —
and shouldn't be. Training input is the word-frequency dictionary (one
explode + one shuffle, output is vocabulary-sized, millions of rows at
100 TB, not corpus-sized); the top-``max_words`` slice of it is
collected and the merge loop runs driver-side over that dict (the
classic formulation — each merge is a global argmax over pair counts,
inherently sequential). Encoding broadcasts the merge ranks and applies
them in an Arrow-batched pandas UDF — no per-row Python, no shuffle.

No SQL oracle: the merge loop is an iterative global argmax — not
SQL-expressible. Correctness is pytest-gated instead: hand-checked
merges on the literature's toy corpora, a pure-python reference encoder
parity check, and partitioning-invariance of training counts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from webcrawl_spark.operators.textstats import _words

__all__ = [
    "word_counts",
    "train_bpe",
    "bpe_encode",
    "bpe_encode_text",
]

EOW = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — BPE training's only distributed
    input. Map-side combine does the heavy reduction; output is
    vocabulary-sized."""
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + cnt
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(df: DataFrame, n_merges: int = 1000,
              max_words: int = 65536,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Distributed word
    counting; the merge loop runs driver-side over the ``max_words``
    most frequent words (ordered by count desc, then word — a
    deterministic slice; the tail it drops carries negligible pair
    mass). Ties in pair frequency break lexicographically, so the merge
    list is a pure function of the word-count table — independent of
    partitioning, cluster size, and row order."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"]) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(r["cnt"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(syms, best): cnt for syms, cnt in vocab.items()}
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int],
                 cache: dict[str, tuple[str, ...]]) -> tuple[str, ...]:
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = tuple(word) + (EOW,)
    while len(syms) > 1:
        ranked = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
        if not ranked:
            break
        syms = _merge_word(syms, min(ranked)[1])
    cache[word] = syms
    return syms


def bpe_encode_text(text: str, ranks: dict[tuple[str, str], int],
                    cache: dict[str, tuple[str, ...]],
                    word_re) -> list[str]:
    """Pure-python encoder (shared by the UDF and the test reference):
    pre-tokenize exactly like _words (lowercase, split on non-word runs),
    then replay merges lowest-rank-first per word."""
    out: list[str] = []
    for w in word_re.split(text.lower()):
        if w:
            out.extend(_encode_word(w, ranks, cache))
    return out


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``df[text_col]`` with a trained merge list. The merge
    ranks broadcast inside the closure; encoding is an Arrow-batched
    mapInPandas-free pandas UDF with a per-worker word cache (webtext is
    Zipfian — the cache turns per-word cost into a dict hit for the
    bulk of the stream). Adds ``out_col: array<string>`` and
    ``n_bpe_tokens``."""
    import re

    from webcrawl_spark.operators.textstats import _TOKEN_SPLIT_RE

    ranks = {pair: i for i, pair in enumerate(merges)}
    # re.ASCII pins \w to [A-Za-z0-9_] — Java-regex semantics, so the
    # python pre-tokenizer splits exactly like the Spark-side _words()
    word_re = re.compile(_TOKEN_SPLIT_RE, re.ASCII)

    @F.pandas_udf(ArrayType(StringType()))
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, tuple[str, ...]] = {}
        for s in batches:
            yield s.map(lambda t: list(
                bpe_encode_text(t or "", ranks, cache, word_re)))

    out = df.withColumn(out_col, encode(F.col(text_col)))
    return out.withColumn("n_bpe_tokens", F.size(F.col(out_col)))
