"""Approximate-aggregate gate tests (operators/approx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.operators.approx import (
    distinct_with_hll_gate,
    quantiles_with_sketch_gate,
)


def test_hll_gate_on_skewed_groups(spark):
    rows = [(i, "big" if i % 4 else "small") for i in range(20000)]
    df = spark.createDataFrame(rows, "user_id long, grp string")
    out = {r.grp: r for r in distinct_with_hll_gate(df, "grp", "user_id").collect()}
    assert out["big"].exact_distinct == 15000
    assert out["small"].exact_distinct == 5000
    assert all(r.approx_ok for r in out.values())


def test_quantile_gate_uniform(spark):
    df = spark.range(0, 10001).select(
        F.lit("g").alias("grp"), F.col("id").cast("double").alias("v")
    )
    row = quantiles_with_sketch_gate(df, "grp", "v").collect()[0]
    assert row.exact_p50 == 5000.0
    assert abs(row.exact_p95 - 9500.0) < 1e-6
    assert row.approx_ok
