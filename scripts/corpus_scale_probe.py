import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Corpus-operator scale probe: every corpus/LM operator at 1x and Kx the
sf0.1 documents table (replicated with distinct ids + perturbed text so
replicas are near-dups, not exact dups), best-of-2 each, one JSON line
per (op, scale). The growth RATIO is the evidence the hash-only /
column-pipeline shapes hold as the corpus grows — the sandbox stand-in
for the 100-TB question.

Usage: python scripts/corpus_scale_probe.py [K]     # default 20

NOTE: left-join-shaped operators get join-eliminated by a bare .count()
(measures nothing) — every workload below aggregates a COMPUTED column.
Never run concurrently with other Spark loads.
"""
import json
import time

from pyspark.sql import functions as F

from webcrawl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def replicate(docs, k: int):
    """k near-dup replicas: distinct doc_ids, text perturbed per replica
    (prefix token) so exact dedup doesn't collapse them."""
    n = docs.count()
    reps = docs.crossJoin(F.broadcast(
        docs.sparkSession.range(k).select(F.col("id").alias("_rep"))))
    return reps.select(
        (F.col("doc_id") + F.col("_rep") * n).alias("doc_id"),
        F.concat(F.lit("rep"), F.col("_rep").cast("string"), F.lit(" "),
                 F.col("text")).alias("text"),
        "lang", "source",
    )


def workloads(docs):
    from webcrawl_spark.operators.corpus import (
        chunk_documents, duplicate_passage_fraction,
        remove_duplicate_passages,
    )
    from webcrawl_spark.operators.dedup import remove_boilerplate_lines
    from webcrawl_spark.operators.lm import (
        dsir_weights, pack_sequences, score_perplexity, train_unigram_lm,
    )
    from webcrawl_spark.operators.textstats import (
        with_c4_flags, with_gopher_flags,
    )

    structured = docs.select(
        "doc_id", F.regexp_replace("text", " the ", "\n").alias("text"))
    return {
        "line_dedup": lambda: remove_boilerplate_lines(
            structured, min_docs=8).agg(F.sum(F.length("text"))).collect(),
        "gopher_flags": lambda: with_gopher_flags(docs).agg(
            F.sum(F.col("gopher_pass").cast("long"))).collect(),
        "c4_rules": lambda: with_c4_flags(docs).agg(
            F.sum(F.length("c4_text"))).collect(),
        "interdup_fraction": lambda: duplicate_passage_fraction(
            docs, n=8).agg(F.sum("dup_frac")).collect(),
        "passage_removal": lambda: remove_duplicate_passages(
            docs, n=8).agg(F.sum("n_removed")).collect(),
        "perplexity": lambda: score_perplexity(
            docs, train_unigram_lm(docs)).agg(F.sum("ppl_nano")).collect(),
        "dsir": lambda: dsir_weights(
            docs, docs.filter(F.col("lang") == "en"), n=2
        ).agg(F.sum("dsir_weight_nano")).collect(),
        "seq_pack": lambda: pack_sequences(docs, seq_len=2048).agg(
            F.max("last_seq")).collect(),
        "chunking": lambda: chunk_documents(
            docs, max_words=128, overlap=16).agg(
            F.sum("n_words_chunk")).collect(),
        "bigram_ppl": lambda: _bigram_ppl(docs),
        "quality_clf": lambda: _quality_clf(docs),
        "cdc_dedup": lambda: _cdc_dedup(docs),
        "cdc_dedup_gear": lambda: _cdc_dedup(docs, "gear"),
    }


def _bigram_ppl(docs):
    from webcrawl_spark.operators.lm import (
        score_perplexity_bigram, train_bigram_lm,
    )

    score_perplexity_bigram(docs, train_bigram_lm(docs)).agg(
        F.sum("ppl_nano")).collect()


def _quality_clf(docs):
    import numpy as np

    from webcrawl_spark.operators.qualityclf import score_quality

    rng = np.random.RandomState(13)
    wn = [int(x) for x in
          np.round(rng.standard_normal(512) * 2e8).astype("int64")]
    score_quality(docs, wn, 38_000_000).agg(
        F.sum("logit_nano")).collect()


def _cdc_dedup(docs, hash_kind: str = "md5"):
    from webcrawl_spark.operators.cdc import (
        cdc_chunks, duplicate_bytes_fraction,
    )

    payloads = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"))
    duplicate_bytes_fraction(
        cdc_chunks(payloads, hash_kind=hash_kind)).agg(
        F.sum("dup_bytes")).collect()


def best_of_2(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main():
    spark = get_spark("corpus-scale-probe",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    big = replicate(base, K).persist()
    n_big = big.count()          # materialize once, outside the timers

    out = {"sf_dir": SF_DIR, "k": K, "n_docs_1x": base.count(),
           "n_docs_kx": n_big, "ops": {}}
    small_w, big_w = workloads(base), workloads(big)
    for name in small_w:
        t1 = best_of_2(small_w[name])
        tk = best_of_2(big_w[name])
        out["ops"][name] = {
            "t_1x_sec": t1, "t_kx_sec": tk,
            "growth": round(tk / t1, 2) if t1 > 0 else None,
        }
        print(f"{name}: 1x {t1}s  {K}x {tk}s  growth {out['ops'][name]['growth']}x",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
