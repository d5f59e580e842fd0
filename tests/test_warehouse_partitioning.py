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


def _file_stats(path, cols):
    """Per-file (min, max) footer stats for each column."""
    import glob
    import os

    import pyarrow.parquet as pq

    stats = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        stats.append((lo, hi))
    return stats


def _candidate_files(stats, col, q_lo, q_hi):
    """Files whose [min, max] on col intersects [q_lo, q_hi]."""
    return sum(
        1 for lo, hi in stats if not (hi[col] < q_lo or lo[col] > q_hi)
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    from world_vaccination_coverage_etl_spark.sources.warehouse import (
        write_sorted_table,
        write_zorder_table,
    )

    n = 100_000
    df = spark.range(n).selectExpr(
        "cast(pmod(hash(id), 1000) as long) as x",
        "cast(pmod(hash(id * 7 + 3), 1000) as long) as y",
        "id as payload",
    )
    p_sorted = str(tmp_path / "sorted_by_x")
    p_z = str(tmp_path / "zorder_xy")
    # 64 files: range-boundary sampling (seeded from rdd ids, which
    # drift with session history) wobbles per-file ranges by a file
    # or two; at 16 files the 2-D-box margin was 1 file wide and a
    # wobble could erase it (r10: failed once under a saturated
    # host).  At 64 files the measured margins are 10-12/64 (y-only)
    # and 5-6 vs 16 (box) across seed drift — assertions below keep
    # a 2x slack on top of that.
    write_sorted_table(df, p_sorted, ["x"], n_files=64)
    write_zorder_table(df, p_z, "x", "y", bits=10, n_files=64)

    # layouts are lossless
    assert spark.read.parquet(p_z).count() == n
    assert sorted(
        r.payload for r in spark.read.parquet(p_z).limit(0).collect()
    ) == []

    s_sorted = _file_stats(p_sorted, ["x", "y"])
    s_z = _file_stats(p_z, ["x", "y"])
    assert len(s_sorted) >= 32 and len(s_z) >= 32

    # a filter on y alone: the x-sorted layout cannot skip anything,
    # the z-ordered layout must skip a real fraction of files
    y_only_sorted = _candidate_files(s_sorted, "y", 0, 99)
    y_only_z = _candidate_files(s_z, "y", 0, 99)
    assert y_only_sorted == len(s_sorted)
    assert y_only_z <= len(s_z) // 2

    # a small 2-D box: z-order candidates must be well under the
    # 1-D layout's candidates for the same box
    def box_candidates(stats):
        return sum(
            1
            for lo, hi in stats
            if not (hi["x"] < 0 or lo["x"] > 249)
            and not (hi["y"] < 0 or lo["y"] > 249)
        )

    assert box_candidates(s_z) <= box_candidates(s_sorted) // 2


def test_zorder_roundtrip_exact(spark, tmp_path):
    from world_vaccination_coverage_etl_spark.sources.warehouse import (
        write_zorder_table,
    )

    df = spark.range(5_000).selectExpr(
        "cast(id % 77 as long) as x",
        "cast(id % 131 as long) as y",
        "id as payload",
    )
    p = str(tmp_path / "z_rt")
    write_zorder_table(df, p, "x", "y", bits=8, n_files=8)
    back = spark.read.parquet(p)
    assert sorted(r.payload for r in back.collect()) == list(range(5_000))


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_small, tmp_path):
    """Dynamic partition pruning: a filter on the DIMENSION side must
    prune FACT partitions at runtime — the join-driven directory skip
    a 100 TB star schema lives on (static pruning can't help because
    the fact filter only materializes from the dim join).
    """
    from pyspark.sql import functions as F

    from world_vaccination_coverage_etl_spark.sources.registry import (
        load_table,
    )

    fact_dir = str(tmp_path / "orders_by_status")
    load_table(spark, sf_small, "orders").write.partitionBy(
        "o_orderstatus"
    ).mode("overwrite").parquet(fact_dir)

    # dimension: an INDEPENDENT table whose filter column is opaque to
    # the fact (no constraint inference possible — only runtime
    # pruning can skip fact partitions).  Written to parquet so the
    # optimizer can't constant-fold the filter into a literal IN list.
    dim_dir = str(tmp_path / "status_dim")
    spark.createDataFrame(
        [("F", "closed"), ("O", "open"), ("P", "open")],
        "status string, phase string",
    ).write.parquet(dim_dir)
    dim = spark.read.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )
    try:
        joined = fact.join(
            dim.filter("phase = 'closed'"), fact.o_orderstatus == dim.status
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower()
        n = joined.count()
        only_f = fact.filter("o_orderstatus = 'F'").count()
        assert n == only_f > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
