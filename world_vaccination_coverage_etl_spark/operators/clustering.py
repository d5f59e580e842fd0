"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative-algorithm representative of the engine — and the
missing piece of the ANN story: `knn_blocked_lsh`
(operators/similarity.py) partitions the corpus with *random*
sign-LSH buckets; a production IVF index partitions it with *learned*
coarse-quantizer centroids.  This module trains exactly those
centroids, with the canonical Spark decomposition:

- **assignment** is embarrassingly parallel: centroids (k x dim — a
  few KB) broadcast into an Arrow-batched kernel that computes all
  squared distances as one numpy broadcast per batch and argmins.
  Zero shuffle, no state.
- **update** is one narrow aggregation: ``posexplode`` the vectors to
  (cluster, pos, val) and average per (cluster, pos) — map-side
  partial aggregation does almost all the work, and the shuffle
  carries at most k x dim x partitions tiny partial rows.  The k x dim
  result is collected to the driver (it IS the model — a few KB at
  any corpus scale), closing the loop for the next broadcast.

That loop shape — broadcast small model out, aggregate small model
back — is how every iterative fitted operator scales on Spark; the
data never moves, only the model does.

Cross-engine determinism (the oracle contract): centroids are rounded
to ``round_dp`` decimals before every assignment, squared distances
are rounded to ``round_dp`` before the argmin (HALF_UP, matching
Spark's ``F.round`` and DuckDB's ``round``), and distance ties break
toward the lowest cluster id — so an unrolled SQL transcription of
the same iterations reproduces the assignment exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_half_up(a: np.ndarray, dp: int) -> np.ndarray:
    scale = 10.0**dp
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    round_dp: int = 6,
) -> DataFrame:
    """Nearest-centroid assignment (squared euclidean), Arrow-batched.

    Row-local: one numpy broadcast + argmin per Arrow batch against
    the (rounded) centroid matrix; no shuffle at any scale.
    """
    C = _round_half_up(np.asarray(centroids, dtype=np.float64), round_dp)

    @F.pandas_udf("int")
    def _assign(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype="int32")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in s])
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        d = _round_half_up(d, round_dp)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.withColumn(cluster_col, _assign(F.col(vec_col)))


def kmeans_update(
    df_assigned: DataFrame,
    prev_centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    round_dp: int = 6,
) -> list[list[float]]:
    """Recompute centroids as per-cluster means (one narrow agg).

    An empty cluster keeps its previous (rounded) centroid.  The
    collected result is k x dim — the model, not data; collecting it
    is the scale-correct move.
    """
    prev = _round_half_up(
        np.asarray(prev_centroids, dtype=np.float64), round_dp
    )
    rows = (
        df_assigned.select(
            F.col(cluster_col),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        .groupBy(cluster_col, "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("v"))
        .collect()
    )
    C = prev.copy()
    for r in rows:
        C[r[cluster_col], r["pos"]] = r["v"]
    return _round_half_up(C, round_dp).tolist()


def kmeans_fit_predict(
    df: DataFrame,
    k: int,
    n_iter: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    round_dp: int = 6,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic k-means: init from the k lowest-``id_col``
    vectors, then ``n_iter`` x (assign -> update), then a final
    assignment.  Returns (assigned DataFrame, centroids).

    Deterministic init (not k-means++) is deliberate: the operator
    contract is engine-portable reproducibility; seed-quality init
    strategies plug in by passing better start centroids to
    `kmeans_assign`/`kmeans_update` directly.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    seed_rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(seed_rows)}")
    cents = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(n_iter):
        assigned = kmeans_assign(df, cents, vec_col, cluster_col, round_dp)
        cents = kmeans_update(assigned, cents, vec_col, cluster_col, round_dp)
    return kmeans_assign(df, cents, vec_col, cluster_col, round_dp), cents
