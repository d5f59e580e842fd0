"""Distributed logistic regression by batch gradient descent.

The third member of the iterative-trainer family (with k-means —
operators/clustering.py — and BPE — operators/bpe.py), and the same
scale decomposition: per iteration the FULL data pass is one
Arrow-kernel partial aggregation (each partition folds its batch into
a gradient/loss contribution with one numpy matmul), and only the
(dim+1)-sized gradient crosses the network.  The weight update is
driver math on the model, never on data.

    grad = Σ_rows (σ(w·x + b) − y) · [x, 1]        (log-loss gradient)

- zero shuffles per iteration: ``mapInPandas`` partials + a single
  global sum (the same moment topology as operators/pca.py);
- deterministic: fixed iteration count + float64 accumulation; the
  per-batch fold order is partition-stable, and the driver update is
  pure;
- the model returns (weights, bias, loss history) — collecting it is
  the point, it IS the model (k-means contract).

This is the from-scratch Spark-first shape of what `spark.ml`'s
LogisticRegression does internally (treeAggregate of gradient
partials); no MLlib import required.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL = T.StructType(
    [
        T.StructField("g", T.ArrayType(T.DoubleType())),  # dim+1 gradient
        T.StructField("loss", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _grad_partials(w, b, vec_col: str, label_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ww = np.asarray(w, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = pdf[label_col].to_numpy().astype(np.float64)
            z = x @ ww + b
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = np.concatenate([x.T @ err, [err.sum()]])
            eps = 1e-12
            loss = float(
                -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            )
            yield pd.DataFrame(
                {"g": [list(g)], "loss": [loss], "n": [len(pdf)]}
            )

    return fn


def logistic_regression_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "y",
    dim: int = 64,
    lr: float = 0.5,
    n_iter: int = 30,
) -> tuple[list[float], float, list[float]]:
    """Fit w, b on (vector, 0/1 label) rows; returns (w, b, loss_curve).

    ``df`` is re-read every iteration — cache() it (or stage it) when
    the input is not already a cheap scan, exactly as with k-means.
    """
    import numpy as np

    w = np.zeros(dim)
    b = 0.0
    losses: list[float] = []
    data = df.select(vec_col, label_col)
    for _ in range(n_iter):
        part = data.mapInPandas(
            _grad_partials(w, b, vec_col, label_col), _PARTIAL
        )
        tot = part.groupBy().agg(
            F.aggregate(
                F.collect_list("g"),
                F.array(*[F.lit(0.0)] * (dim + 1)),
                lambda acc, g: F.zip_with(acc, g, lambda a, x: a + x),
            ).alias("g"),
            F.sum("loss").alias("loss"),
            F.sum("n").alias("n"),
        ).collect()[0]
        g = np.asarray(tot.g) / tot.n
        losses.append(float(tot.loss) / tot.n)
        w -= lr * g[:-1]
        b -= lr * float(g[-1])
    return [float(x) for x in w], float(b), losses


def logistic_predict(
    df: DataFrame, w: list[float], b: float, vec_col: str = "embedding"
) -> DataFrame:
    """Score rows with the fitted model — broadcast-free (the model is
    a literal in the plan), one Arrow pass."""

    @F.pandas_udf(T.DoubleType())
    def _score(col: pd.Series) -> pd.Series:
        import numpy as np

        ww = np.asarray(w, dtype=np.float64)
        m = np.vstack(col.to_numpy()).astype(np.float64)
        return pd.Series(1.0 / (1.0 + np.exp(-(m @ ww + b))))

    return df.withColumn("p", _score(F.col(vec_col)))
