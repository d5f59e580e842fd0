"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring the brute-force/ANN split any vector workload needs:

- ``cosine_topk_bruteforce``: exact top-k for one query vector — the
  score is a row-local ``zip_with``/``aggregate`` expression (JVM-side,
  whole-stage codegen), then a global ``orderBy(desc).limit(k)`` which
  Spark executes as per-partition top-k + driver merge (TakeOrdered) —
  no full sort shuffle.
- ``cosine_topk_lsh``: sign-LSH (random hyperplanes, fixed seed)
  bucketing; at scale the query probes only its bucket so the scan is
  1/2^bits of the corpus per probe.  Recall grows with multi-probe
  (hamming-1 neighbors of the query bucket).

``knn_all_pairs_bruteforce`` gives exact k-NN for every row (blocked
self-join + window top-k) — the verification baseline for ANN recall.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_score(vec: F.Column, query: Sequence[float]) -> F.Column:
    """Cosine similarity of a vector column against a literal query."""
    q = np.asarray(list(query), dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qcol = F.array(*[F.lit(float(x)) for x in q])
    v = vec.cast("array<double>")
    denom = _norm(v) * F.lit(qn)
    return F.when(denom > 0, _dot(v, qcol) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector (id tiebreak)."""
    scored = df.select(
        F.col(id_col), cosine_score(F.col(vec_col), query).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def lsh_bucket(
    vec: F.Column, dim: int, bits: int = 8, seed: int = 42
) -> F.Column:
    """Sign-LSH bucket id: ``bits`` random-hyperplane sign bits.

    Hyperplanes are a deterministic numpy RNG draw embedded as literal
    arrays — every executor evaluates the same JVM expression; no
    Python at run time.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("int")
    for b in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(_dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit, b)
    return bucket


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only rows within ``probe_hamming`` bit flips of
    the query's LSH bucket.  Recall/cost dial: probes grow as
    ``sum(C(bits, i) for i <= probe_hamming)`` while the scanned corpus
    fraction is probes/2^bits."""
    from itertools import combinations

    q = np.asarray(list(query), dtype=np.float64)
    dim = len(q)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    q_bucket = 0
    for b in range(bits):
        if float(planes[b] @ q) >= 0:
            q_bucket |= 1 << b
    probes = [q_bucket]
    for h in range(1, max(0, probe_hamming) + 1):
        for flips in combinations(range(bits), h):
            m = 0
            for b in flips:
                m |= 1 << b
            probes.append(q_bucket ^ m)

    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, bits, seed))
    candidates = bucketed.filter(F.col("__bucket").isin(probes))
    scored = candidates.select(
        F.col(id_col), cosine_score(F.col(vec_col), query).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_all_pairs_bruteforce(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """Exact k nearest neighbors for every row (self-join + window top-k).

    O(n²) within a block — the recall oracle for the LSH path, and the
    real operator for small/medium corpora.  At 100 TB, block first
    (IVF coarse quantizer or LSH bucket as ``block_col``).
    """
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        *([F.col(block_col)] if block_col else []),
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    cond = F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    na, nb = _norm(F.col("a.v")), _norm(F.col("b.v"))
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("src_id"),
        F.col(f"b.{id_col}").alias("nbr_id"),
        F.when((na > 0) & (nb > 0), _dot(F.col("a.v"), F.col("b.v")) / (na * nb))
        .otherwise(F.lit(0.0))
        .alias("cosine"),
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "nbr_id", "cosine", "rank")
    )
