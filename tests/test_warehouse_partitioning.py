"""Partitioned-warehouse writes + partition-pruning reads.

The driver testdata ships single parquet files, so the plan audit
can't show partition pruning there; this test writes a
``partitionBy`` warehouse layout and pins the pruning behavior a
100 TB deployment depends on: a filter on the partition column must
become a PartitionFilter (directory-level skip, zero data IO for
pruned partitions), not a post-scan predicate.
"""

from __future__ import annotations

from world_vaccination_coverage_etl_spark.sources.registry import load_table


def test_partition_pruning_reaches_scan(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_small, "events")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter("event_type = 'click'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, and the
    # click partition only is read
    assert "event_type" in plan.split("PartitionFilters")[1][:200]

    clicks = df.count()
    total = spark.read.parquet(out).count()
    assert 0 < clicks < total

    # pruned read returns exactly the rows of that partition
    expected = events.filter("event_type = 'click'").count()
    assert clicks == expected


def test_partitioned_roundtrip_preserves_rows(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_rt")
    events = load_table(spark, sf_small, "events")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # partition column round-trips as a real column
    assert set(r["event_type"] for r in back.select("event_type").distinct().collect()) \
        == set(r["event_type"] for r in events.select("event_type").distinct().collect())
