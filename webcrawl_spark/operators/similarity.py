"""Similarity search over an embedding column (array<float>).

- cosine_topk:      brute-force exact top-k, entirely JVM-side
                    (F.zip_with/F.aggregate dot product → TakeOrdered k).
                    The correctness baseline and small-query path.
- rp_lsh_buckets /
  ann_topk:         random-hyperplane LSH (signed random projections):
                    each vector → n_bits sign bits → bucket id. Queries probe
                    their own bucket (plus optional 1-bit-flip neighbors);
                    candidates re-ranked by exact cosine. At 100 TB this
                    turns a full scan into a partition-pruned bucket lookup —
                    write the bucketed table partitioned by ``bucket``.
- embedding_near_dup_pairs: near-duplicate pairs via the same buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "cosine_sim_col",
    "cosine_topk",
    "rp_lsh_buckets",
    "ann_topk",
    "embedding_near_dup_pairs",
    "random_anchors",
    "train_ivf_centroids",
    "ivf_cell_udf",
    "ivf_assign",
    "ivf_topk",
    "semdedup",
]


def cosine_sim_col(vec_col: str, query: list[float]):
    """Exact cosine similarity against a literal query vector, JVM-side."""
    q = np.asarray(query, dtype="float64")
    qnorm = float(np.linalg.norm(q)) or 1.0
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda a: a * a),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    return dot / (norm * F.lit(qnorm))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force exact top-k by cosine — orderBy+limit compiles to
    TakeOrderedAndProject (no global sort materialization)."""
    return (
        df.select(F.col(id_col), cosine_sim_col(vec_col, query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim)).astype("float64")


def rp_lsh_bucket_udf(dim: int, n_bits: int = 12, seed: int = 7):
    planes = _hyperplanes(dim, n_bits, seed)

    def batch(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        return pd.Series(signs @ weights)

    return pandas_udf(batch, T.LongType())


def rp_lsh_buckets(df: DataFrame, dim: int, n_bits: int = 12, seed: int = 7,
                   vec_col: str = "embedding") -> DataFrame:
    """Attach the LSH ``bucket`` column. At scale, persist partitioned by
    bucket so queries prune partitions."""
    return df.withColumn(
        "bucket", rp_lsh_bucket_udf(dim, n_bits, seed)(F.col(vec_col))
    )


def _query_buckets(query: np.ndarray, planes: np.ndarray,
                   n_bits: int, probe_flips: int) -> list[int]:
    """Multi-probe bucket set: the query's own bucket plus all buckets
    within Hamming distance ``probe_flips`` (0-2). Deeper probing trades
    scan fraction for recall without rebucketing — the standard multi-probe
    LSH knob."""
    signs = (planes @ query) > 0
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    base = int(signs @ weights)
    buckets = [base]
    if probe_flips >= 1:
        buckets += [base ^ (1 << b) for b in range(n_bits)]
    if probe_flips >= 2:
        buckets += [base ^ (1 << a) ^ (1 << b)
                    for a in range(n_bits) for b in range(a + 1, n_bits)]
    return buckets


def ann_topk(df: DataFrame, query: list[float], k: int = 10, dim: int | None = None,
             n_bits: int = 12, seed: int = 7, probe_flips: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (+ Hamming-1 buckets),
    exact-rerank candidates. ``df`` may be pre-bucketed (has ``bucket``) or raw."""
    q = np.asarray(query, dtype="float64")
    dim = dim if dim is not None else len(q)
    if "bucket" not in df.columns:
        df = rp_lsh_buckets(df, dim, n_bits, seed, vec_col)
    planes = _hyperplanes(dim, n_bits, seed)
    targets = _query_buckets(q, planes, n_bits, probe_flips)
    cand = df.filter(F.col("bucket").isin(targets))
    return cosine_topk(cand, query, k, vec_col, id_col)


def random_anchors(dim: int, n_cells: int, seed: int = 7) -> np.ndarray:
    """Data-independent coarse quantizer: seeded Gaussian anchors whose
    Voronoi cells (by cosine) partition the sphere. Same role as trained
    k-means centroids but derivable from the seed alone — the
    oracle-recomputable IVF configuration (mirrors the _hyperplanes
    pattern in q_ann_topk)."""
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((n_cells, dim)).astype("float64")
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_centroids(df: DataFrame, dim: int, n_cells: int = 256,
                        seed: int = 7, iters: int = 10,
                        sample_frac: float = 1.0, sample_cap: int = 100_000,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> np.ndarray:
    """Seeded Lloyd k-means on a bounded, DETERMINISTIC sample (md5-salted
    hash-order prefix — a uniform draw, independent of partitioning and of
    any id/segment correlation). Sample-based
    training is how production IVF indexes are built at corpus scale
    (faiss trains on ~256 vectors/cell); only the bounded sample ever
    reaches the driver. Centroids are unit-normalized so assignment is an
    argmax of dot products."""
    from webcrawl_spark.operators.corpus import sample_bucket

    cand = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if sample_frac < 1.0:
        cand = cand.filter(
            sample_bucket(F.col("_id"), f"ivf{seed}")
            < int(sample_frac * (1 << 32)))
    # cap by taking the hash-order prefix, not the id-order prefix: ids
    # typically correlate with source/crawl segment, so an id prefix would
    # train the quantizer on one segment only; the salted-hash order is a
    # uniform draw and still deterministic across partitionings
    rows = cand.orderBy(sample_bucket(F.col("_id"), f"ivf{seed}"), "_id") \
        .limit(sample_cap).collect()
    if not rows:
        raise ValueError(
            "train_ivf_centroids: no vectors to train on (empty input or "
            "sample_frac filtered every row)")
    mat = np.stack([np.asarray(r["_v"], dtype="float64") for r in rows])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)),
                           replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:  # empty cell: reseed from a random sample vector
                cents[c] = mat[rng.randint(len(mat))]
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def ivf_cell_udf(centroids: np.ndarray):
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def batch(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        return pd.Series(np.argmax(mat @ norm_c.T, axis=1).astype("int32"))

    return pandas_udf(batch, T.IntegerType())


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Attach the IVF ``cell`` (nearest centroid by cosine; ties go to the
    lowest cell, matching np.argmax). At scale, persist partitioned by
    cell so ivf_topk prunes partitions instead of filtering a full scan."""
    return df.withColumn("cell", ivf_cell_udf(centroids)(F.col(vec_col)))


def ivf_topk(df: DataFrame, query: list[float], centroids: np.ndarray,
             k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF search: visit the ``nprobe`` cells whose centroids are nearest
    the query, exact-rerank the union. ``df`` may be pre-assigned (has
    ``cell``) or raw. The scan fraction is ~nprobe/n_cells — with a
    cell-partitioned table this is partition pruning, never all-pairs."""
    if "cell" not in df.columns:
        df = ivf_assign(df, centroids, vec_col)
    q = np.asarray(query, dtype="float64")
    norm_c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    scores = norm_c @ q
    probes = [int(c) for c in
              np.argsort(-scores, kind="stable")[:nprobe]]
    cand = df.filter(F.col("cell").isin(probes))
    return cosine_topk(cand, query, k, vec_col, id_col)


def semdedup(df: DataFrame, centroids: np.ndarray, eps: float = 0.2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding clusters. Every vector is assigned to its
    nearest centroid's cell; within each cell, pairs with exact cosine
    >= ``eps`` are semantic duplicates, and from each duplicate pair the
    member with the HIGHER cosine to its own centroid is removed (the
    paper keeps the least-typical example per duplicate set, preserving
    diversity near the cluster edge). Ties break to the higher id so the
    rule is total and engine-independent; the comparison runs on
    nano-rounded cosines (round(csim*1e9) as int64 — the jitter between a
    BLAS and a sequential fold is ~1e-15, five orders below the grid).

    Scale shape: the only join is the within-cell self-join, so the pair
    count is sum(|cell|^2)/2 — bounded by the SemDeDup knob itself
    (n_cells grows with the corpus so cells stay ~constant-size; the
    paper uses k ~ sqrt(N)). Cell assignment is one Arrow-batched UDF
    pass; at 100 TB, persist the assignment partitioned by ``cell`` and
    the self-join becomes a partition-local co-located join. Everything
    after assignment is JVM-side Column algebra (no Python in the pair
    loop).

    Returns (id_col, cell, csim, removed) — one row per input vector;
    ``removed`` marks the vectors SemDeDup would drop.
    """
    norm_c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    base = ivf_assign(df, centroids, vec_col)
    cent_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in norm_c])
    own = F.element_at(cent_lit, F.col("cell") + 1)
    # cast the (float) vector up to double BEFORE the product: zip_with
    # type-coercion otherwise narrows the double centroid to float and
    # rounds every product to float32 — a 1e-7 drift an engine promoting
    # to double (e.g. the SQL oracle) never shows
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), own,
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda a: a * a),
        F.lit(0.0), lambda acc, x: acc + x))
    base = base.select(
        F.col(id_col), F.col(vec_col).alias("_v"), F.col("cell"),
        (dot / nrm).alias("csim"), nrm.alias("_nrm"))

    base = base.withColumn("_v", F.col("_v").cast("array<double>"))
    l, r = base.alias("l"), base.alias("r")
    pair_dot = F.aggregate(
        F.zip_with(F.col("l._v"), F.col("r._v"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        l.join(r, (F.col("l.cell") == F.col("r.cell"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"),
            (pair_dot / (F.col("l._nrm") * F.col("r._nrm"))).alias("cos"),
            F.round(F.col("l.csim") * F.lit(1e9), 0).cast("long").alias("ca"),
            F.round(F.col("r.csim") * F.lit(1e9), 0).cast("long").alias("cb"),
        )
        .filter(F.col("cos") >= F.lit(eps))
    )
    losers = pairs.select(
        F.when((F.col("ca") > F.col("cb"))
               | ((F.col("ca") == F.col("cb")) & (F.col("a") > F.col("b"))),
               F.col("a")).otherwise(F.col("b")).alias(id_col)
    ).distinct().withColumn("_rm", F.lit(True))
    return (
        base.join(losers, id_col, "left")
        .select(F.col(id_col), F.col("cell"), F.col("csim"),
                F.coalesce(F.col("_rm"), F.lit(False)).alias("removed"))
    )


def embedding_near_dup_pairs(df: DataFrame, dim: int, threshold: float = 0.95,
                             n_bits: int = 10, seed: int = 7,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucket self-join + exact
    cosine verification."""
    b = rp_lsh_buckets(df, dim, n_bits, seed, vec_col).select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"), "bucket"
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l.doc") < F.col("r.doc")))
    dot = F.aggregate(F.zip_with("l.vec", "r.vec", lambda a, x: a * x),
                      F.lit(0.0), lambda acc, x: acc + x)

    def norm(side: str):
        return F.sqrt(F.aggregate(
            F.transform(F.col(f"{side}.vec"), lambda a: a * a),
            F.lit(0.0), lambda acc, x: acc + x,
        ))

    return (
        pairs.select(
            F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"),
            (dot / (norm("l") * norm("r"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
