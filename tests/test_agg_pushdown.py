"""Parquet aggregate pushdown: MIN/MAX/COUNT answered from footers.

At 100 TB, `SELECT min(x), max(x), count(*)` over a raw table is a
full scan under the default v1 parquet source — but the DSv2 source
(`spark.sql.sources.useV1SourceList=""`) pushes the aggregate into the
scan and answers it from row-group STATISTICS, touching no data pages.
The session factory already sets `spark.sql.parquet.aggregatePushdown`;
this pins the v2 half of the contract so the metadata-only path stays
available for layout-maintenance jobs (compaction sizing, watermark
probes) that only need table extents.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F


@contextlib.contextmanager
def _v2_parquet(spark):
    prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev)


def test_min_max_count_pushed_to_parquet_scan(spark, sf_small):
    with _v2_parquet(spark):
        df = spark.read.parquet(f"{sf_small}/orders.parquet")
        agg = df.agg(
            F.min("o_orderdate").alias("lo"),
            F.max("o_orderdate").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan, plan
        row = agg.collect()[0]
    # values must match the v1 full-scan answer exactly
    ref = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .agg(
            F.min("o_orderdate").alias("lo"),
            F.max("o_orderdate").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert (row.lo, row.hi, row.n) == (ref.lo, ref.hi, ref.n)


def test_pushdown_declines_when_filters_present(spark, sf_small):
    # a data filter disables stats-only answering — correctness first
    with _v2_parquet(spark):
        df = spark.read.parquet(f"{sf_small}/orders.parquet").filter(
            "o_totalprice > 1000"
        )
        agg = df.agg(F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: []" in plan or "PushedAggregation" not in plan
        n = agg.collect()[0].n
    ref = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .filter("o_totalprice > 1000")
        .count()
    )
    assert n == ref
