"""Product-quantization tests: encode determinism, tie rule, ADC
algebra vs an independent numpy recompute, and recall vs exact L2."""

from __future__ import annotations

import numpy as np

from world_vaccination_coverage_etl_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode_batched,
    pq_subspaces,
    sampled_centroids,
)


def _clustered(n_clusters=8, per_cluster=25, dim=16, seed=7):
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


def test_pq_subspaces_rejects_ragged_split():
    import pytest

    assert pq_subspaces(64, 8) == 8
    with pytest.raises(ValueError):
        pq_subspaces(64, 7)


def test_encode_shape_range_and_determinism(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = sampled_centroids(df, nlist=16)
    enc1 = {
        r.vec_id: list(r.codes)
        for r in pq_encode_batched(df, cb, m=4).collect()
    }
    enc2 = {
        r.vec_id: list(r.codes)
        for r in pq_encode_batched(df, cb, m=4).collect()
    }
    assert enc1 == enc2
    assert all(len(c) == 4 for c in enc1.values())
    assert all(0 <= x < 16 for c in enc1.values() for x in c)


def test_encode_tie_breaks_to_lowest_code(spark):
    rows = _clustered(n_clusters=2, per_cluster=5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c = [0.0] * 16
    dup = [(0, c), (1, c)]
    codes = pq_encode_batched(df, dup, m=4).select("codes").distinct().collect()
    assert [list(r.codes) for r in codes] == [[0, 0, 0, 0]]


def test_adc_matches_independent_numpy_recompute(spark):
    rows = _clustered(n_clusters=4, per_cluster=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = sampled_centroids(df, nlist=8)
    q = rows[0][1]
    m, dim = 4, 16
    d = dim // m
    got = {
        r.vec_id: r.adc_dist
        for r in pq_adc_topk(df, q, cb, k=len(rows), m=m).collect()
    }
    # independent recompute: encode by rounded argmin, ADC via integer
    # micros — the operator contract, written the slow obvious way
    C = np.array([v for _, v in cb])
    qv = np.array(q)
    for vid, vec in rows:
        x = np.array(vec)
        micros = 0
        for j in range(m):
            sl = slice(j * d, (j + 1) * d)
            dists = ((x[sl] - C[:, sl]) ** 2).sum(axis=1)
            dists = np.floor(dists * 1e6 + 0.5) / 1e6
            code = int(np.argmin(dists))  # first min = lowest code
            qd = float(((qv[sl] - C[code, sl]) ** 2).sum())
            micros += int(np.floor(qd * 1e6 + 0.5))
        assert abs(got[vid] - round(micros / 1e6, 6)) < 1e-9, vid


def test_codebook_member_is_its_own_code_and_adc_zero(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = sampled_centroids(df, nlist=16)
    # query = codebook row 5's full vector: the corpus row it was
    # sampled FROM encodes to code 5 in every subspace and scores
    # ADC exactly 0, ranking first
    code5_vec = cb[5][1]
    top = pq_adc_topk(df, code5_vec, cb, k=1, m=4).collect()[0]
    assert top.adc_dist == 0.0


def test_pq_recall_against_exact_l2(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = np.array(rows[0][1])
    V = np.array([v for _, v in rows])
    exact = set(
        np.argsort(((V - q) ** 2).sum(axis=1), kind="stable")[:10].tolist()
    )
    cb = sampled_centroids(df, nlist=16)
    approx = {
        r.vec_id for r in pq_adc_topk(df, list(q), cb, k=10, m=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"PQ recall {recall} below 0.5"


def test_ivfpq_composition_restricts_to_probed_cells(spark):
    # the composed index never ADC-scores a vector outside the probed
    # cells: every returned id must sit in the 2 cells the query's
    # cosine ranks best
    from pyspark.sql import functions as F

    from world_vaccination_coverage_etl_spark.operators.similarity import (
        _py_fold_cosine,
        _round_half_away,
        ivf_assign,
    )

    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sample = sampled_centroids(df, nlist=16)
    q = rows[0][1]
    probe = sorted(
        (-_round_half_away(_py_fold_cosine(q, c), 6), cid)
        for cid, c in sample
    )[:2]
    probe_cids = {cid for _, cid in probe}
    cand = ivf_assign(df, sample).filter(
        F.col("list_id").isin(list(probe_cids))
    )
    cand_ids = {r.vec_id for r in cand.select("vec_id").collect()}
    got = pq_adc_topk(cand, q, sample, k=10, m=4).collect()
    assert got and all(r.vec_id in cand_ids for r in got)
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)


# ---------------------------------------------------------------- #
# property pins (hypothesis): the contracts the JVM/batched parity
# and the oracle ranking lean on, over randomized vectors including
# zeros, negatives, and near-ties

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vec = st.lists(
    st.floats(
        min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False
    ),
    min_size=8,
    max_size=8,
)


@given(st.lists(_vec, min_size=4, max_size=24), st.integers(2, 4))
@_FAST
def test_ivf_jvm_batched_parity_on_random_vectors(spark, vecs, nlist):
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_batched,
        sampled_centroids,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=min(nlist, len(rows)))
    jvm = {
        r.vec_id: r.list_id
        for r in ivf_assign(df, cents).select("vec_id", "list_id").collect()
    }
    bat = {
        r.vec_id: r.list_id
        for r in ivf_assign_batched(df, cents)
        .select("vec_id", "list_id")
        .collect()
    }
    assert jvm == bat


@given(st.lists(_vec, min_size=4, max_size=24))
@_FAST
def test_pq_codes_always_valid_and_adc_nonnegative(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = sampled_centroids(df, nlist=min(4, len(rows)))
    k = len(cb)
    enc = pq_encode_batched(df, cb, m=2).collect()
    assert all(len(r.codes) == 2 and all(0 <= c < k for c in r.codes)
               for r in enc)
    got = pq_adc_topk(df, rows[0][1], cb, k=len(rows), m=2).collect()
    assert len(got) == len(rows)
    assert all(r.adc_dist >= 0.0 for r in got)
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)
