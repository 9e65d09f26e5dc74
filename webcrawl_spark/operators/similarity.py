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


def _cell_csim_udf(centroids: np.ndarray):
    """(vector) → struct(cell int, csim double): nearest-centroid cell AND
    own-centroid cosine in one Arrow pass. The centroid matrix lives in
    the UDF closure (shipped once per task), never in the Catalyst plan —
    this replaces the r5 literal centroid array, whose O(n_cells × dim)
    plan doubles exploded at SemDeDup's own n_cells ~ √N scaling.

    Arithmetic pinned to the oracle contract: cell dots are double
    products (vector cast up before the multiply); the vector norm uses
    float32 products accumulated in double — exactly what the un-cast
    Spark ``transform(v, a*a)`` fold and the DuckDB
    ``list_transform(embedding, x->x*x)`` both compute."""
    norm_c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def batch(vecs: pd.Series) -> pd.DataFrame:
        v32 = np.stack([np.asarray(v, dtype="float32") for v in vecs])
        dots = v32.astype("float64") @ norm_c.T
        cell = np.argmax(dots, axis=1)
        nrm = np.sqrt((v32 * v32).astype("float64").sum(axis=1))
        csim = dots[np.arange(len(cell)), cell] / nrm
        return pd.DataFrame({"cell": cell.astype("int32"), "csim": csim})

    return pandas_udf(batch, T.StructType([
        T.StructField("cell", T.IntegerType()),
        T.StructField("csim", T.DoubleType()),
    ]))


def _nano_half_up(x: np.ndarray) -> np.ndarray:
    """round(x*1e9) with HALF_UP (away from zero) — Spark's F.round."""
    y = x * 1e9
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) \
        .astype(np.int64)


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

    Scale shape (r6): ONE Arrow pass assigns (cell, csim) — no centroid
    literals in the plan — then ONE shuffle groups each cell into a task
    where a blocked float64 GEMM decides removal directly: a member is
    removed iff some same-cell partner has pair cosine >= eps and a
    (nano-csim, id)-lexicographically smaller key. Nothing pairwise is
    ever materialized or shuffled (the r5 shape shuffled the self-join's
    O(sum |cell|²) pair rows and evaluated one interpreted Catalyst
    HOF fold per pair — 65× slower at the sf1 bench size). Per-task
    memory is O(|cell| × dim) for the vectors plus an O(block × |cell|)
    score tile; |cell| stays ~constant under the paper's n_cells ~ √N
    knob, the same bound the r5 self-join relied on for its pair count.

    Returns (id_col, cell, csim, removed) — one row per input vector;
    ``removed`` marks the vectors SemDeDup would drop.
    """
    assigned = df.select(
        F.col(id_col), F.col(vec_col).alias("_v"),
        _cell_csim_udf(centroids)(F.col(vec_col)).alias("_cs"),
    ).select(id_col, "_v", F.col("_cs.cell").alias("cell"),
             F.col("_cs.csim").alias("csim"))

    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("cell", T.IntegerType()),
        T.StructField("csim", T.DoubleType()),
        T.StructField("removed", T.BooleanType()),
    ])

    def flag(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[[id_col, "cell", "csim"]].copy()
        n = len(pdf)
        if n < 2:
            out["removed"] = [False] * n
            return out
        ids = pdf[id_col].to_numpy()
        v32 = np.stack([np.asarray(v, dtype="float32") for v in pdf["_v"]])
        v64 = v32.astype("float64")
        # same arithmetic as the r5 pair expression: double products for
        # the pair dot, float32-product norms (see _cell_csim_udf)
        nrm = np.sqrt((v32 * v32).astype("float64").sum(axis=1))
        ca = _nano_half_up(pdf["csim"].to_numpy())
        removed = np.zeros(n, dtype=bool)
        blk = max(1, min(n, 8_000_000 // n))   # ≤ ~64 MB score tile
        for s in range(0, n, blk):
            e = min(n, s + blk)
            cos = (v64[s:e] @ v64.T) / (nrm[s:e, None] * nrm[None, :])
            dup = cos >= eps
            dup[np.arange(e - s), np.arange(s, e)] = False   # no self-pair
            worse = (ca[s:e, None] > ca[None, :]) | (
                (ca[s:e, None] == ca[None, :])
                & (ids[s:e, None] > ids[None, :]))
            removed[s:e] = (dup & worse).any(axis=1)
        out["removed"] = removed
        return out

    return assigned.groupBy("cell").applyInPandas(flag, out_schema)


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
