"""Approximate aggregates — the sketch operators that replace exact
ones at 100 TB.

- ``approx_count_distinct`` (HyperLogLog++): constant memory per group
  vs the exact distinct's shuffle of every key.  At a default rsd of
  5% a 10⁹-key column aggregates in ~a few KB of sketch per partition.
- ``percentile_approx`` (Greenwald-Khanna style quantile sketch):
  bounded-error quantiles in one pass, mergeable across partitions —
  the exact percentile needs a full sort.

Sketch outputs are engine-specific (not oracle-hashable), so the
registered queries pair each approximation with its exact counterpart
computed in the same plan and emit the exact value + a boolean
accuracy gate (|approx − exact| within the configured bound).  The
oracle computes the exact side and asserts the gate is true — the
driver hash-check then fails if the sketch ever drifts out of bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_with_hll_gate(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rsd: float = 0.05,
    tol_mult: float = 4.0,
) -> DataFrame:
    """Per-group exact distinct + HLL estimate + accuracy gate.

    The gate allows ``tol_mult`` × rsd relative error (HLL's rsd is a
    standard deviation, not a hard bound; 4σ makes the gate
    deterministic in practice while still catching implementation
    drift).
    """
    out = df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("exact_distinct"),
        F.approx_count_distinct(key_col, rsd=rsd).alias("approx_distinct"),
    )
    rel_err = F.abs(
        F.col("approx_distinct").cast("double") - F.col("exact_distinct")
    ) / F.col("exact_distinct")
    # all-NULL key group: exact_distinct = 0 makes rel_err 0/0 = NULL,
    # which would mismatch the oracle's literal `true` — the gate there
    # is simply "the sketch also saw nothing"
    ok = F.when(
        F.col("exact_distinct") > 0, rel_err <= tol_mult * rsd
    ).otherwise(F.col("approx_distinct") == 0)
    return out.select(
        group_col,
        "exact_distinct",
        ok.alias("approx_ok"),
    )


def quantiles_with_sketch_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10000,
    tol: float = 0.01,
) -> DataFrame:
    """Per-group exact percentiles + sketch percentiles + gate.

    ``percentile_approx`` at ``accuracy`` a guarantees rank error
    ≤ 1/accuracy; the gate checks the sketch value lies within the
    exact values at probabilities p ± tol (rank-space bound — the
    correct check for a rank-error sketch; value-space tolerance would
    depend on the data distribution).
    """
    p_lo = [max(0.0, p - tol) for p in probabilities]
    p_hi = [min(1.0, p + tol) for p in probabilities]
    agg = df.groupBy(group_col).agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(map(str, probabilities))}))"
        ).alias("exact_q"),
        F.percentile_approx(
            value_col, list(probabilities), accuracy
        ).alias("approx_q"),
        F.expr(
            f"percentile({value_col}, array({', '.join(map(str, p_lo))}))"
        ).alias("q_lo"),
        F.expr(
            f"percentile({value_col}, array({', '.join(map(str, p_hi))}))"
        ).alias("q_hi"),
    )
    ok = F.lit(True)
    for i in range(len(probabilities)):
        ok = ok & (
            (F.col("approx_q")[i] >= F.col("q_lo")[i])
            & (F.col("approx_q")[i] <= F.col("q_hi")[i])
        )
    # scalar output columns (exact_p50, exact_p95, ...): array-typed
    # result columns break order-insensitive row sorting in comparison
    # harnesses, and scalars are what a dashboard consumes anyway
    exact_cols = [
        F.round(F.col("exact_q")[i], 6).alias(f"exact_p{round(p * 100)}")
        for i, p in enumerate(probabilities)
    ]
    return agg.select(group_col, *exact_cols, ok.alias("approx_ok"))
