"""SemDeDup (semantic dedup over embedding clusters) — semantics,
numpy-reference parity, and the plan shape of the within-cell self-join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawl_spark.operators.similarity import (
    random_anchors,
    semdedup,
    train_ivf_centroids,
)


def _df_from_vecs(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSemdedupSemantics:
    def test_keeps_lowest_centroid_sim_per_dup_group(self, spark):
        # one centroid at e0: three near-identical vectors at decreasing
        # alignment with the centroid, plus an unrelated singleton near e1
        c = np.zeros((2, 4))
        c[0, 0] = 1.0
        c[1, 1] = 1.0
        group = [
            [1.0, 0.02, 0.0, 0.0],   # highest csim → removed
            [1.0, 0.06, 0.0, 0.0],   # middle → removed
            [1.0, 0.10, 0.0, 0.0],   # lowest csim of the dup set → kept
        ]
        single = [[0.0, 1.0, 0.0, 0.0]]
        out = semdedup(_df_from_vecs(spark, group + single), c, eps=0.99) \
            .orderBy("vec_id").collect()
        assert [r["removed"] for r in out] == [True, True, False, False]
        assert [r["cell"] for r in out] == [0, 0, 0, 1]

    def test_eps_gates_the_pair_set(self, spark):
        c = np.zeros((1, 4))
        c[0, 0] = 1.0
        vecs = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]  # orthogonal
        out = semdedup(_df_from_vecs(spark, vecs), c, eps=0.5).collect()
        assert all(not r["removed"] for r in out)

    def test_id_tiebreak_on_equal_csim(self, spark):
        # identical vectors: equal csim, equal pair cosine — the higher id
        # must be the removed one (deterministic total order)
        c = np.zeros((1, 3))
        c[0, 0] = 1.0
        vecs = [[1.0, 0.5, 0.0], [1.0, 0.5, 0.0]]
        out = semdedup(_df_from_vecs(spark, vecs), c, eps=0.9) \
            .orderBy("vec_id").collect()
        assert [r["removed"] for r in out] == [False, True]

    def test_cross_cell_pairs_never_compared(self, spark):
        # two identical vectors would be duplicates, but a tiny component
        # pushes them into different cells — SemDeDup only dedups within
        # a cluster (the paper's explicit scope)
        c = np.zeros((2, 4))
        c[0, 0] = 1.0
        c[1, 1] = 1.0
        vecs = [[0.7, 0.71, 0.0, 0.0], [0.71, 0.7, 0.0, 0.0]]
        out = semdedup(_df_from_vecs(spark, vecs), c, eps=0.5) \
            .orderBy("vec_id").collect()
        assert {r["cell"] for r in out} == {0, 1}
        assert all(not r["removed"] for r in out)


class TestSemdedupNumpyParity:
    def test_random_corpus_matches_reference(self, spark):
        rng = np.random.RandomState(3)
        n, dim, n_cells, eps = 300, 16, 8, 0.35
        vecs = rng.standard_normal((n, dim)).astype("float32")
        anchors = random_anchors(dim, n_cells, seed=5)

        m = vecs.astype("float64")
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cell = np.argmax(mn @ anchors.T, axis=1)
        csim = (mn @ anchors.T).max(axis=1)
        removed = np.zeros(n, bool)
        for c in range(n_cells):
            idx = np.where(cell == c)[0]
            sims = mn[idx] @ mn[idx].T
            for a in range(len(idx)):
                for b in range(a + 1, len(idx)):
                    if sims[a, b] >= eps:
                        x, y = idx[a], idx[b]
                        loser = x if (csim[x], x) > (csim[y], y) else y
                        removed[loser] = True

        out = semdedup(_df_from_vecs(spark, vecs), anchors, eps=eps) \
            .orderBy("vec_id").collect()
        assert [r["cell"] for r in out] == cell.tolist()
        assert [r["removed"] for r in out] == removed.tolist()
        got = np.array([r["csim"] for r in out])
        assert np.allclose(got, csim, atol=1e-9)

    def test_trained_centroids_compose(self, spark):
        # planted dup groups dedup to exactly one survivor per occupied
        # cell (k-means on 12 points may split a group across cells —
        # within each cell the group must still collapse to one)
        rng = np.random.RandomState(11)
        dim = 8
        bases = rng.standard_normal((4, dim))
        vecs, expect_groups = [], []
        for g, base in enumerate(bases):
            for j in range(3):
                vecs.append(base + rng.standard_normal(dim) * 0.01)
            expect_groups.append({3 * g, 3 * g + 1, 3 * g + 2})
        df = _df_from_vecs(spark, np.array(vecs, dtype="float32"))
        cents = train_ivf_centroids(df, dim, n_cells=4, seed=2, iters=8)
        out = semdedup(df, cents, eps=0.99).orderBy("vec_id").collect()
        for grp in expect_groups:
            cells = {out[i]["cell"] for i in grp}
            kept = [i for i in grp if not out[i]["removed"]]
            assert len(kept) == len(cells), f"group {grp}: kept {kept}"


class TestSemdedupPlan:
    def test_pair_join_is_keyed_not_cartesian(self, spark):
        # the per-cell grouping must key on cell — a
        # BroadcastNestedLoopJoin here is the all-pairs plan that dies at
        # corpus scale
        vecs = np.random.RandomState(0).standard_normal((50, 8)) \
            .astype("float32")
        anchors = random_anchors(8, 4, seed=5)
        plan = semdedup(_df_from_vecs(spark, vecs), anchors, eps=0.5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan
        assert "CartesianProduct" not in plan

    def test_no_centroid_literals_in_plan(self, spark):
        """The centroid matrix must live in the UDF closure, never as an
        O(n_cells × dim) literal array in the Catalyst plan (the r5
        scale-shape flag: SemDeDup's own n_cells ~ √N scaling would blow
        the plan up long before the data). Gate: no element_at indexing
        and plan size independent of n_cells."""
        vecs = np.random.RandomState(1).standard_normal((30, 16)) \
            .astype("float32")
        df = _df_from_vecs(spark, vecs)

        def plan_of(n_cells):
            return semdedup(df, random_anchors(16, n_cells, seed=5),
                            eps=0.5) \
                ._jdf.queryExecution().optimizedPlan().toString()

        small, big = plan_of(4), plan_of(256)
        assert "element_at" not in big
        # 64× the centroids must not inflate the plan (literals would
        # add ~n_cells × dim float literals)
        assert len(big) < len(small) + 1000
