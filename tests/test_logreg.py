"""Distributed logistic regression: convergence, determinism, accuracy."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.operators.logreg import (
    logistic_predict,
    logistic_regression_fit,
)


def _separable(spark, n=400, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(size=dim)
    x = rng.normal(size=(n, dim))
    y = (x @ w_true + 0.1 * rng.normal(size=n) > 0).astype(int)
    rows = [([float(v) for v in x[i]], int(y[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, "embedding array<float>, y int"),
        w_true,
    )


def test_loss_decreases_and_classifies(spark):
    df, _ = _separable(spark)
    df = df.cache()
    w, b, losses = logistic_regression_fit(df, dim=8, lr=0.5, n_iter=25)
    assert losses[-1] < losses[0] * 0.5          # real convergence
    assert all(
        l2 <= l1 + 1e-9 for l1, l2 in zip(losses, losses[1:])
    )  # monotone under fixed small lr on this problem
    scored = logistic_predict(df, w, b)
    acc = (
        scored.select(
            ((F.col("p") > 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc > 0.9


def test_partition_count_does_not_change_model(spark):
    df, _ = _separable(spark, n=200)
    w1, b1, _ = logistic_regression_fit(
        df.repartition(1).cache(), dim=8, n_iter=5
    )
    w7, b7, _ = logistic_regression_fit(
        df.repartition(7).cache(), dim=8, n_iter=5
    )
    np.testing.assert_allclose(w1, w7, rtol=0, atol=1e-9)
    assert abs(b1 - b7) < 1e-9
