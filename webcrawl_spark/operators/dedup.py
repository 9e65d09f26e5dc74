"""Deduplication operators for web-text corpora at 100 TB scale.

- exact_dedup:        hash-groupBy on a normalized fingerprint (one shuffle,
                      map-side partial aggregation).
- minhash_lsh:        shingle → minhash signature (vectorized numpy inside an
                      Arrow UDF) → banded LSH buckets → candidate pairs from
                      bucket self-joins → Jaccard-verified pairs → greedy
                      keep-min-id dedup. Bucket join keys are (band, hash) so
                      the self-join shuffles only bucket-local rows.
- simhash:            64-bit simhash, near-dup via banded bit-block buckets +
                      Hamming verification (XOR popcount, JVM-side).
- ngram_jaccard_pairs: exact n-gram Jaccard for verification workloads.
- embedding near-dup:  see operators/similarity.py (cosine LSH).

All map-side-heavy; the only shuffles are the LSH bucket groupings, keyed to
distribute uniformly (band index ⊕ hash). Skewed mega-buckets (boilerplate
shingles) are capped via a per-bucket size limit before the self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "dup_components",
    "minhash_lsh_dedup",
    "simhash_column",
    "simhash_column_fnv",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "remove_boilerplate_lines",
]

_MERSENNE = (1 << 61) - 1


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """Small-input parallelism guard for the Arrow-UDF signature stages: a
    small parquet file arrives as ONE partition, serializing the whole
    signature computation on one core regardless of cluster size. Spread
    to the scheduler's parallelism when the input has fewer partitions —
    at corpus scale inputs carry far more partitions than cores and this
    is a no-op (no shuffle added)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per exact normalized-text duplicate group.

    Scale shape: only (id, fingerprint) rows enter the window shuffle —
    the r5 form ran the window over the FULL rows, shipping every
    document's text through the exchange just to compare 8-byte hashes
    (the guide-§8 antipattern). Losers (row_number > 1 within a
    fingerprint group) leave via an id-only anti-join, which AQE
    broadcasts whenever duplicates are rare — the common corpus case —
    so the text column never moves at all. The trade: the input is
    SCANNED twice (fingerprint pass + join side) — strictly cheaper than
    shuffling the payload at cluster scale, but pin ``df`` first if it
    is an expensive unmaterialized lineage."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fp = df.select(F.col(id_col).alias("_ed_id"),
                   F.xxhash64(normalized).alias("_ed_h"))
    w = Window.partitionBy("_ed_h").orderBy("_ed_id")
    losers = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(F.col("_ed_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def remove_boilerplate_lines(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             min_docs: int = 2) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a normalized line
    (lowercased, trimmed, non-blank) that occurs in >= ``min_docs`` DISTINCT
    documents is dropped from every document. Returns the input columns with
    ``text_col`` cleaned plus ``n_lines_removed``.

    Scale shape: the corpus-wide aggregation moves only 64-bit line hashes
    (map-side partial countDistinct), and the drop-position join moves only
    (doc, pos) pairs for boilerplate hits — never document text. The final
    join back to ``df`` is on ``id_col``; AQE broadcasts the drop side when
    few documents are affected, and with the corpus bucketed by id it is a
    storage-partitioned join. Rebuild is a per-row indexed array filter, so
    text itself is never exploded into the shuffle.

    The line view is deliberately recomputed for the count pass and the
    drop pass (two linear text scans, zero extra shuffle) rather than
    pinned: materializing the corpus-wide (doc, pos, hash) triples to
    executor disk at 10^12-line scale costs more than the second
    column-pruned scan it would save."""
    lines = F.split(F.col(text_col), "\n")
    exploded = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(lines).alias("_pos", "_line"),
    ).select(
        "_doc", "_pos",
        F.trim(F.lower(F.col("_line"))).alias("_norm"),
    ).withColumn("_key", F.xxhash64(F.col("_norm")))
    bl_keys = (
        exploded.filter(F.col("_norm") != "")
        .groupBy("_key")
        .agg(F.countDistinct("_doc").alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_key")
    )
    drops = (
        exploded.join(bl_keys, "_key")
        .groupBy("_doc")
        .agg(F.collect_set("_pos").alias("_drop_pos"))
    )
    joined = df.join(drops, df[id_col] == drops["_doc"], "left")
    drop_pos = F.coalesce(F.col("_drop_pos"),
                          F.array().cast("array<int>"))
    kept = F.filter(lines, lambda x, i: ~F.array_contains(drop_pos, i))
    return (
        joined.withColumn("n_lines_removed", F.size(drop_pos))
        .withColumn(text_col, F.array_join(kept, "\n"))
        .drop("_doc", "_drop_pos")
    )


_FNV_PRIME = np.uint64(1099511628211)


def _shingles(text: str, k: int) -> np.ndarray:
    """Character k-shingle hashes: vectorized polynomial hash over utf-8
    bytes (deterministic across processes — Python's hash() is salted and
    must never reach an executor)."""
    s = " ".join(text.lower().split()).encode("utf-8")
    if len(s) < k:
        s = s.ljust(k)
    arr = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        powers = _FNV_PRIME ** np.arange(k, dtype=np.uint64)
        idx = np.arange(len(arr) - k + 1)[:, None] + np.arange(k)[None, :]
        h = (arr[idx] * powers[::-1][None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h & np.uint64(0x7FFFFFFFFFFFFFFF))


def minhash_signatures(num_perm: int = 64, shingle_k: int = 5, seed: int = 1):
    """(text) → array<long> minhash signature. Permutations are universal
    hashes a*x+b mod p, vectorized over all shingles per doc."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def batch(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            sh = _shingles(text or "", shingle_k)
            with np.errstate(over="ignore"):
                # (num_perm, n_shingles) — min over shingles per permutation
                vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.ArrayType(T.LongType()))


def minhash_md5_params(num_perm: int = 32, seed: int = 1) -> list[tuple[int, int]]:
    """The (a, b) constants of the oracle-checkable minhash variant —
    shared verbatim between the Spark UDF and generated oracle SQL.
    a, b < 2^62 so a*h + b fits a 128-bit HUGEINT before the mod-2^64."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=num_perm, dtype=np.int64)
    b = rng.randint(0, 1 << 62, size=num_perm, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signatures_md5(num_perm: int = 32, shingle_k: int = 5,
                           seed: int = 1):
    """(text) → array<long> minhash signature, oracle-checkable variant:
    distinct character k-shingles of the whitespace-normalized text, shingle
    hash = first 8 bytes of md5, permutation i = (a_i*h + b_i) mod 2^64
    (uint64 wrap ≡ HUGEINT arithmetic in SQL). Slower than the vectorized
    FNV/Mersenne scale path (one md5 per shingle) — use for verification
    configurations; both produce valid minhash estimates."""
    import hashlib

    params = minhash_md5_params(num_perm, seed)
    a = np.array([p[0] for p in params], dtype=np.uint64)
    b = np.array([p[1] for p in params], dtype=np.uint64)

    def batch(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            norm = " ".join((text or "").lower().split())
            if len(norm) < shingle_k:
                norm = norm.ljust(shingle_k)
            shingles = {norm[i:i + shingle_k]
                        for i in range(len(norm) - shingle_k + 1)}
            h = np.array(
                [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
                 for s in shingles],
                dtype=np.uint64,
            )
            with np.errstate(over="ignore"):
                vals = a[:, None] * h[None, :] + b[:, None]  # mod 2^64 wrap
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return pandas_udf(batch, T.ArrayType(T.LongType()))


def _band_buckets(df: DataFrame, sig_col: str, num_perm: int, bands: int,
                  id_col: str) -> DataFrame:
    """(doc, band, bucket) — ONE generator pass: the r5 shape unioned one
    projection per band, scanning the signature table ``bands`` times;
    posexplode over the per-band hash array emits the same rows (band =
    position, identical xxhash64 bucket values) in a single scan."""
    rows_per_band = num_perm // bands
    band_hashes = F.array(*[
        F.xxhash64(
            F.slice(F.col(sig_col), band * rows_per_band + 1, rows_per_band)
            .cast("array<string>").cast("string"))
        for band in range(bands)])
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(band_hashes).alias("band", "bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 200,
    signatures=None,
) -> DataFrame:
    """Candidate near-duplicate pairs (doc_a < doc_b) with estimated Jaccard
    ≥ threshold (signature agreement ratio).

    Completeness note: when (1 - threshold) * num_perm < bands, the banding
    is an exact pigeonhole — every pair with est_jaccard ≥ threshold shares
    at least one clean band, so (absent max_bucket truncation) the output
    equals the brute-force signature comparison. The oracle query runs in
    such a configuration."""
    # pin only (id, sig): at 100 TB the text column would dominate the
    # stored footprint and nothing downstream of the signature needs it.
    # localCheckpoint instead of cache(): the blocks are released by the
    # ContextCleaner when the DataFrame is garbage-collected, so repeated
    # operator calls in one session don't accumulate storage (a plain
    # .cache() lives in the CacheManager until explicitly unpersisted).
    sigs = _ensure_parallel(df).select(
        F.col(id_col),
        (signatures or minhash_signatures(num_perm))(F.col(text_col))
        .alias("sig"),
    ).localCheckpoint(eager=False)
    buckets = _band_buckets(sigs, "sig", num_perm, bands, id_col)
    # cap pathological buckets (boilerplate shingles) before the self-join
    w = Window.partitionBy("band", "bucket").orderBy("doc")
    buckets = buckets.withColumn("_rn", F.row_number().over(w)) \
                     .filter(F.col("_rn") <= max_bucket).drop("_rn")
    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(right, (F.col("l.band") == F.col("r.band"))
                  & (F.col("l.bucket") == F.col("r.bucket"))
                  & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )
    sig_a = sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sig_a, "doc_a").join(sig_b, "doc_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda m: m)) / F.lit(num_perm),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", **kw) -> DataFrame:
    """Drop near-duplicates: keep a doc unless a lower-id near-dup exists
    (greedy min-id representative — standard large-scale practice)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kw)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash_column(shingle_k: int = 3):
    """(text) → bigint 64-bit simhash (token-hash bit voting).

    Token hash = first 8 bytes (big-endian) of md5(token) — chosen so an
    independent SQL engine can recompute the identical simhash
    (DuckDB: ('0x' || substr(md5(tok), 1, 16))::UBIGINT), making the
    near-dup pair query exactly oracle-checkable."""

    import hashlib

    def _tok_hash(t: str) -> int:
        return int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)

    def batch(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            tokens = (text or "").lower().split()
            if not tokens:
                continue
            hs = np.array([_tok_hash(t) for t in tokens], dtype=np.uint64)
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(hs)
            sim = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sim |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sim)
        return pd.Series(out)

    return pandas_udf(batch, T.LongType())


def _fnv1a_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit FNV-1a over utf-8 bytes for a batch of tokens, fully
    vectorized: tokens are padded into a (n, maxlen) byte matrix and the
    hash loop runs over byte POSITIONS (≤ longest token), not tokens."""
    encoded = [t.encode("utf-8") for t in tokens]
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(encoded), maxlen), dtype=np.uint8)
    if maxlen:
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        mask = np.arange(maxlen)[None, :] < lens[:, None]
        mat[mask] = flat
    h = np.full(len(encoded), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            live = j < lens
            h = np.where(live, (h ^ mat[:, j].astype(np.uint64)) * prime, h)
    return h


def simhash_column_fnv():
    """(text) → bigint 64-bit simhash — the SCALE-PATH variant: vectorized
    FNV-1a token hashing (no per-token Python md5 loop; the hot loop runs
    over byte positions and documents are reduced with np.add.reduceat).
    Same bit-voting scheme as simhash_column; the token hash differs, so the
    two variants produce different (equally valid) simhashes — keep the md5
    variant for oracle-checkable configurations, exactly as minhash has
    minhash_signatures (FNV scale) vs minhash_signatures_md5 (oracle)."""

    def batch(texts: pd.Series) -> pd.Series:
        token_lists = [(t or "").lower().split() for t in texts]
        counts = np.array([len(t) for t in token_lists], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.int64)
        all_tokens = [tok for toks in token_lists for tok in toks]
        if not all_tokens:
            return pd.Series(out)
        hs = _fnv1a_hashes(all_tokens)
        bits = (
            (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        nonempty = counts > 0
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ones = np.add.reduceat(bits, starts[nonempty], axis=0)
        majority = (2 * ones > counts[nonempty, None]).astype(np.uint64)
        sims = (majority << np.arange(64, dtype=np.uint64)[None, :]) \
            .sum(axis=1, dtype=np.uint64)
        out[nonempty] = sims.view(np.int64)
        return pd.Series(out)

    return pandas_udf(batch, T.LongType())


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           max_hamming: int = 3,
                           simhash=None) -> DataFrame:
    """Near-dup pairs by simhash: band the 64 bits into 4 blocks (pigeonhole:
    any pair within Hamming distance 3 agrees on ≥1 block), bucket-join, then
    verify with JVM-side XOR popcount. ``simhash`` selects the hash variant:
    default is the vectorized FNV scale path; pass ``simhash_column()`` for
    the md5 oracle-recomputable configuration."""
    sims = _ensure_parallel(df).select(
        F.col(id_col).alias("doc"),
        (simhash or simhash_column_fnv())(F.col(text_col)).alias("sim"),
    ).localCheckpoint(eager=False)  # self-cleaning pin, see minhash_lsh_pairs
    # one generator pass over the 4 bit-blocks (see _band_buckets)
    block_keys = F.array(*[
        F.shiftright(F.col("sim"), block * 16).bitwiseAND(F.lit(0xFFFF))
        for block in range(4)])
    banded = sims.select(
        "doc", "sim", F.posexplode(block_keys).alias("block", "key"))
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(right, (F.col("l.block") == F.col("r.block"))
                  & (F.col("l.key") == F.col("r.key"))
                  & (F.col("l.doc") < F.col("r.doc")))
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"),
                F.col("l.sim").alias("sim_a"), F.col("r.sim").alias("sim_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming",
                        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact word-n-gram Jaccard over all pairs (verification-scale only —
    quadratic; the LSH operators are the scale path)."""
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(F.split(F.lower(F.col(text_col)), r"\s+")) - n,
                               F.lit(0)),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split(F.lower(F.col(text_col)), r"\s+"),
                                 i + 1, n)
                ),
            )
        ).alias("grams"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            (F.size(F.array_intersect("a.grams", "b.grams"))
             / F.size(F.array_union("a.grams", "b.grams"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dup_components(pairs: DataFrame, left: str = "doc_a",
                   right: str = "doc_b", max_iter: int = 25,
                   max_degree: int | None = None) -> DataFrame:
    """Near-dup pairs → connected components: (doc, component) where
    component = min doc id in the doc's cluster. This is the step that
    turns pairwise near-dup output into dedup GROUPS (keep one canonical
    doc per component) — at corpus scale a duplicate often matches
    different members of its cluster, so pair-level keep/drop is not
    enough.

    Distributed iterative min-label propagation with pointer doubling
    (the alternating-star idea of Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14, re-expressed as DataFrame joins):
    each round every node takes the min label over itself + neighbors,
    then shortcuts to its label's label (doubling ⇒ O(log n) rounds on
    chains, not O(diameter)). Each round pins via localCheckpoint (plan
    depth stays constant; blocks release on GC) and converges via a
    bounded changed-row probe.

    ``max_degree`` is the giant-component skew guard for corpus scale: a
    boilerplate mega-cluster (one near-empty template shared by millions of
    docs) otherwise funnels its whole adjacency through single hot-key join
    tasks every round. When set, each node keeps only its ``max_degree``
    LOWEST-id neighbors before symmetrization. Components can only split,
    never merge (edges are removed, not added), so dedup stays safe —
    and because the kept neighbors are the lowest ids, star/clique shapes
    (the boilerplate case) still converge to one component."""
    edges = pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
    edges = edges.unionByName(edges.select(F.col("b").alias("a"),
                                           F.col("a").alias("b")))
    if max_degree is not None:
        # cap AFTER symmetrization and do not re-symmetrize (that would
        # re-add every hot-node edge from the cold side): each node pulls
        # labels from at most max_degree neighbors, so no join key fans
        # out beyond the cap. Pull edges may end up one-directional —
        # label flow can only be lost, never invented, preserving the
        # split-only guarantee.
        w_deg = Window.partitionBy("a").orderBy("b")
        edges = (
            edges.withColumn("_dn", F.row_number().over(w_deg))
            .filter(F.col("_dn") <= max_degree).drop("_dn")
        )
    edges = edges.distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    for it in range(max_iter):
        neigh = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = (
            labels.join(neigh, "node", "left")
            .select("node", F.col("label").alias("_old"),
                    F.least("label",
                            F.coalesce("nlabel", "label")).alias("label"))
        )
        # pointer doubling: label ← label(label) (always ≤ current label)
        lab2 = stepped.select(F.col("node").alias("label"),
                              F.col("label").alias("_ll"))
        # convergence probe observed ON the checkpoint materialization
        # (was a separate join+count job per round): the previous label
        # travels as _old through the step, so changed-row counting is a
        # free aggregate of the same pass
        obs = Observation(f"cc_changed_{it}")
        doubled = (
            stepped.join(lab2, "label", "left")
            .select("node", "_old",
                    F.coalesce("_ll", F.col("label")).alias("label"))
            .observe(obs, F.coalesce(
                F.sum((F.col("label") != F.col("_old")).cast("long")),
                F.lit(0)).alias("changed"))
            .localCheckpoint(eager=True)
        )
        labels = doubled.select("node", "label")
        if int(obs.get["changed"]) == 0:
            break
    return labels.select(F.col("node").alias("doc"),
                         F.col("label").alias("component"))
