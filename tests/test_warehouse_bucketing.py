"""Bucketed-table join-plan tests: the co-located join must not shuffle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.sources.warehouse import (
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("order_id"), (F.col("id") % 7).alias("customer_id")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("order_id"), F.col("id").alias("item_id")
    )
    write_bucketed_table(orders, "b_orders", ["order_id"], 8, sort_cols=["order_id"])
    write_bucketed_table(items, "b_items", ["order_id"], 8, sort_cols=["order_id"])
    yield spark.table("b_orders"), spark.table("b_items")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    orders, items = bucketed_pair
    # force the SMJ path (broadcast would hide the bucketing property)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(items, "order_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correctness_matches_unbucketed(spark, bucketed_pair):
    orders, items = bucketed_pair
    got = (
        orders.join(items, "order_id")
        .groupBy("customer_id")
        .agg(F.count("*").alias("n"))
        .orderBy("customer_id")
        .collect()
    )
    plain_orders = spark.range(0, 2000).select(
        F.col("id").alias("order_id"), (F.col("id") % 7).alias("customer_id")
    )
    plain_items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("order_id"), F.col("id").alias("item_id")
    )
    want = (
        plain_orders.join(plain_items, "order_id")
        .groupBy("customer_id")
        .agg(F.count("*").alias("n"))
        .orderBy("customer_id")
        .collect()
    )
    assert got == want
