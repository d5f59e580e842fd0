"""PCA building blocks: distributed covariance + driver eigensolve."""

from __future__ import annotations

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.pca import (
    embedding_covariance,
    embedding_covariance_fixedpoint,
    pca_top_components,
)


def _vec_df(spark, m):
    rows = [(i, [float(x) for x in m[i]]) for i in range(m.shape[0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(7)
    m = rng.normal(size=(200, 8)).astype(np.float32)
    df = _vec_df(spark, m)
    got = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df, dim=8, round_dp=9).collect()
    }
    exp = np.cov(m.astype(np.float64).T, bias=True)  # population
    assert len(got) == 64
    for (i, j), v in got.items():
        assert v == pytest.approx(exp[i, j], abs=1e-6)


def test_covariance_symmetric(spark):
    rng = np.random.default_rng(11)
    m = rng.normal(size=(100, 4)).astype(np.float32)
    got = dict(
        ((r.i, r.j), r.cov)
        for r in embedding_covariance(_vec_df(spark, m), dim=4).collect()
    )
    for i in range(4):
        for j in range(4):
            assert got[(i, j)] == got[(j, i)]


def test_fixedpoint_matches_exact_python(spark):
    """cov_micro equals brute-force arbitrary-precision integer math."""
    rng = np.random.default_rng(7)
    m = rng.normal(size=(150, 4)).astype(np.float32)
    got = {
        (r.i, r.j): (r.s_x_i, r.s_x_j, r.s_xx, r.n, r.cov_micro)
        for r in embedding_covariance_fixedpoint(
            _vec_df(spark, m), dim=4, scale=1000
        ).collect()
    }
    q = np.floor(m.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    n = q.shape[0]
    for i in range(4):
        for j in range(4):
            s_x_i = int(q[:, i].sum())
            s_x_j = int(q[:, j].sum())
            s_xx = int((q[:, i].astype(object) * q[:, j].astype(object)).sum())
            num = 10**6 * (n * s_xx - s_x_i * s_x_j)
            den = n * n * 1000 * 1000
            cm = (
                (2 * num + den) // (2 * den)
                if num >= 0
                else -((-2 * num + den) // (2 * den))
            )
            assert got[(i, j)] == (s_x_i, s_x_j, s_xx, n, cm)


def test_fixedpoint_partition_invariant_adversarial(spark):
    """Bit-identical across partitionings ON BOUNDARY-ADVERSARIAL data.

    The r7 flake was an order-dependent float sum flipping a 6-dp
    rounding boundary between the driver run and the local sweep.  This
    fixture plants values whose float covariance sits ON half-ulp
    rounding boundaries (x.5e-6 offsets) plus heavy cancellation (large
    mean, tiny variance) — the exact regime where float partial sums
    disagree by summation order — and asserts the integer contract is
    identical across 1/7/32 partitions AND a shuffled row order.
    """
    rng = np.random.default_rng(5)
    # large common mean (cancellation) + tiny jitter snapped to
    # quantization half-steps (boundary pressure at scale=1000)
    base = np.full((211, 4), 0.4375, dtype=np.float64)
    jitter = rng.integers(-3, 4, size=(211, 4)) * 0.0005  # half-step grid
    m = (base + jitter).astype(np.float32)
    variants = [
        _vec_df(spark, m).repartition(1),
        _vec_df(spark, m).repartition(7),
        _vec_df(spark, m).repartition(32),
        _vec_df(spark, m[rng.permutation(211)]).repartition(13),
    ]
    results = [
        sorted(
            tuple(r)
            for r in embedding_covariance_fixedpoint(v, dim=4).collect()
        )
        for v in variants
    ]
    assert results[0] == results[1] == results[2] == results[3]


def test_pca_recovers_planted_direction(spark):
    # data = strong variance along a known axis + small isotropic noise
    rng = np.random.default_rng(3)
    direction = np.zeros(8)
    direction[2] = 1.0
    t = rng.normal(scale=10.0, size=(500, 1))
    noise = rng.normal(scale=0.1, size=(500, 8))
    m = (t @ direction[None, :] + noise).astype(np.float32)
    vals, comps, ratio = pca_top_components(_vec_df(spark, m), k=2, dim=8)
    assert vals[0] > 50 * vals[1]          # planted axis dominates
    assert abs(comps[0][2]) > 0.99         # aligns with e_2
    assert comps[0][np.argmax(np.abs(comps[0]))] > 0  # sign convention
    assert 0.99 < ratio[0] <= 1.0
