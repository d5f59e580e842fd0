"""Similarity-search tests: brute-force correctness + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    knn_all_pairs_bruteforce,
)


def _clustered(n_clusters=8, per_cluster=25, dim=16, seed=7):
    """Synthetic clustered vectors: LSH has real near neighbors to find."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.15 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_bruteforce_topk_matches_numpy(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    got = [r.vec_id for r in cosine_topk_bruteforce(df, q, k=10).collect()]

    V = np.array([r[1] for r in rows])
    qv = np.array(q)
    sims = (V @ qv) / (np.linalg.norm(V, axis=1) * np.linalg.norm(qv))
    # numpy ground truth with the same (-cosine, id) tiebreak
    expect = [int(i) for i in sorted(range(len(rows)), key=lambda i: (-sims[i], i))[:10]]
    assert got == expect


def test_lsh_recall_against_bruteforce(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    exact = {r.vec_id for r in cosine_topk_bruteforce(df, q, k=10).collect()}
    approx = {
        r.vec_id
        for r in cosine_topk_lsh(df, q, k=10, bits=6, probe_hamming=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} below 0.9"


def test_knn_allpairs_shape_and_selfpair_exclusion(spark):
    rows = _clustered(n_clusters=3, per_cluster=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_all_pairs_bruteforce(df, k=3).collect()
    assert len(out) == len(rows) * 3
    for r in out:
        assert r.src_id != r.nbr_id
        assert 1 <= r.rank <= 3


def test_knn_neighbors_share_cluster(spark):
    rows = _clustered(n_clusters=4, per_cluster=15)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_all_pairs_bruteforce(df, k=3).collect()
    same_cluster = sum(1 for r in out if r.src_id // 15 == r.nbr_id // 15)
    assert same_cluster / len(out) > 0.95
