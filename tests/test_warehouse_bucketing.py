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


def test_write_sorted_table_disjoint_file_ranges(spark, tmp_path):
    """Range-partitioned sorted layout: per-file min/max on the sort
    column must be non-overlapping (the property file skipping needs),
    and content must round-trip exactly."""
    import os

    import pyarrow.parquet as pq

    from world_vaccination_coverage_etl_spark.sources.warehouse import (
        write_sorted_table,
    )

    df = spark.range(0, 10000).select(
        (F.col("id") * 2654435761 % 10007).alias("key"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "sorted")
    write_sorted_table(df, out, ["key"], n_files=8)

    ranges = []
    for root, _dirs, files in os.walk(out):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "key"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            if mins:
                ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (_lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {ranges}"

    back = spark.read.parquet(out)
    assert back.count() == 10000
    assert back.agg(F.sum("payload")).first()[0] == sum(range(10000))
