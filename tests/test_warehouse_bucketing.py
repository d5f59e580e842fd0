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


def test_bucketed_minhash_index_screen_join_shuffles_batch_only(spark):
    """The incremental-ingest screen against a BUCKETED signature
    index: the index side (the 100 TB side) must read its buckets
    with NO Exchange — only the incoming batch's bands shuffle to
    match.  This is the layout a production deployment stages the
    index in, substantiating the batch-sized-cost claim of
    `minhash_screen_new_batch`."""
    from world_vaccination_coverage_etl_spark.operators.dedup import (
        minhash_band_signatures,
    )

    base = spark.createDataFrame(
        [(i, f"base document number {i} about topic {i % 5} with steady text")
         for i in range(60)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1000 + i, f"base document number {i} about topic {i % 5} with steady text")
         for i in range(6)],
        "doc_id long, text string",
    )
    write_bucketed_table(
        minhash_band_signatures(base),
        "b_minhash_idx",
        ["band_idx", "band_hash"],
        8,
        sort_cols=["band_idx", "band_hash"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = spark.table("b_minhash_idx")
        batch_bands = minhash_band_signatures(new).select(
            F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
        )
        cand = batch_bands.join(idx, ["band_idx", "band_hash"]).select(
            "new_id", F.col("doc_id").alias("base_id")
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, (
            f"only the batch side may shuffle:\n{plan}"
        )
        # every new doc is an exact copy of a base doc: all 6 match
        got = {(r.new_id, r.base_id) for r in cand.distinct().collect()}
        assert {(1000 + i, i) for i in range(6)} <= got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_minhash_idx")
