"""AQE runtime re-planning evidence — the 100 TB skew story, pinned.

The engine leans on AQE for two runtime behaviors the plans can't show
statically: skewed-partition splitting in shuffle joins and
post-shuffle partition coalescing. Both confs are on in session.py;
these tests prove they ENGAGE on the shapes that need them, so a
regression in the session config (or a Spark upgrade changing
defaults) fails CI rather than a 100 TB run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_aqe_skew_join_splits_hot_key(spark):
    # ~1M-row fact where one key owns ~90% of rows, joined to a fact-
    # sized-but-unbroadcastable right side on the same key space.
    # Disable broadcast so the join MUST shuffle, then let AQE detect
    # the hot partition and split it.
    n = 400_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_skew_factor = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    old_skew_bytes = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    old_advisory = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # local fixtures are small; lower the byte floor so the skew
        # detector uses the relative factor, as it would at real scale
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        # the split target: a skewed partition is only split into
        # advisory-size chunks, so the advisory must sit below the hot
        # partition's bytes for the optimization to fire at test scale
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        # no operator AFTER the join may require its partitioning, or
        # AQE must preserve the distribution and cannot split the hot
        # partition (that is the point of the split: it breaks the
        # hash-partition guarantee and is only legal at the plan tail)
        joined = fact.join(dim, "k").select("payload")
        rows = joined.collect()  # execute THIS plan (count() derives a new one)
        assert len(rows) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "skew=true" in plan, (
            "AQE did not mark the skewed join; plan:\n" + plan[:2000]
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", old_skew_factor
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            old_skew_bytes,
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", old_advisory
        )


def test_aqe_coalesces_small_shuffle_partitions(spark):
    # a tiny aggregate shuffled across the session's 32 partitions
    # should be coalesced by AQE to far fewer post-shuffle partitions
    df = spark.range(10_000).groupBy((F.col("id") % 50).alias("g")).agg(
        F.count(F.lit(1)).alias("n")
    )
    assert len(df.collect()) == 50  # execute THIS plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_oracle):
    # The third runtime behavior the 100 TB posture depends on: when a
    # selective dimension filter feeds a shuffle join, Spark's
    # InjectRuntimeFilter builds a bloom filter from the dimension keys
    # and pushes might_contain() into the FACT side's scan — fact rows
    # that cannot match drop before the shuffle.  The size thresholds
    # are cluster-scale; lower the application-side floor so the
    # rewrite fires on the local fixture exactly as it would at scale.
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        big = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        small = spark.read.parquet(f"{sf_oracle}/orders.parquet").filter(
            F.col("o_orderstatus") == "P"
        )
        j = (
            big.join(small, big.l_orderkey == small.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, (
            "runtime bloom filter not injected; plan:\n" + plan[:2000]
        )
        assert "bloom_filter_agg" in plan
        # the might_contain sits in a Filter ABOVE the lineitem scan —
        # i.e. on the application (fact) side, not the creation side
        fact_region = plan[: plan.index("bloom_filter_agg")]
        assert "might_contain" in fact_region
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
