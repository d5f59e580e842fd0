"""Distributed k-means tests (operators/clustering.py)."""

from __future__ import annotations

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.clustering import (
    _round_half_up,
    kmeans_assign,
    kmeans_fit_predict,
    kmeans_update,
)


def _ref_kmeans(X, k, n_iter, dp=6):
    """Pure-numpy transcription of the operator contract."""

    def assign(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(_round_half_up(d, dp), axis=1)

    C = _round_half_up(X[:k].astype(np.float64), dp)
    for _ in range(n_iter):
        C = _round_half_up(C, dp)
        lab = assign(C)
        nxt = C.copy()
        for c in range(k):
            if (lab == c).any():
                nxt[c] = X[lab == c].mean(axis=0)
        C = _round_half_up(nxt, dp)
    return assign(_round_half_up(C, dp)), C


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 8) * 3
    X = np.concatenate(
        [centers[i % 4] + rng.randn(8) * 0.4 for i in range(120)]
    ).reshape(120, 8)
    rows = [(i, [float(x) for x in X[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # floats go through float32 in the table, like the parquet column
    return df, np.asarray(
        [np.asarray(r, dtype=np.float32) for r in X], dtype=np.float64
    )


def test_kmeans_matches_reference(vecs, spark):
    df, X = vecs
    out, cents = kmeans_fit_predict(df, k=4, n_iter=2, round_dp=6)
    got = {r.vec_id: r.cluster for r in out.collect()}
    ref_lab, ref_cents = _ref_kmeans(X, 4, 2)
    assert got == {i: int(ref_lab[i]) for i in range(120)}
    assert np.array_equal(np.asarray(cents), ref_cents)


def test_kmeans_clusters_are_sane(vecs):
    df, X = vecs
    out, _ = kmeans_fit_predict(df, k=4, n_iter=2)
    rows = out.collect()
    # generated from 4 well-separated blobs: docs from the same blob
    # should dominate each cluster
    assert len({r.cluster for r in rows}) == 4


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # one far outlier seeds cluster 1; every point is closer to seed 0
    # after the update, so cluster 1 empties and keeps its centroid
    rows = [(0, [0.0, 0.0]), (1, [100.0, 100.0]), (2, [0.1, 0.0]),
            (3, [0.0, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = kmeans_assign(df, [[0.0, 0.0], [100.0, 100.0]])
    cents = kmeans_update(assigned, [[0.0, 0.0], [100.0, 100.0]])
    assert cents[1] == [100.0, 100.0]


def test_kmeans_validation(spark):
    df = spark.createDataFrame(
        [(0, [0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="k must be positive"):
        kmeans_fit_predict(df, k=0)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_fit_predict(df, k=5)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_fit_predict(df, k=1, n_iter=-1)
