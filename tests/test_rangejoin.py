"""Unit tests for operators/rangejoin.py (bucketed interval join)."""

from __future__ import annotations

import datetime as dt

from world_vaccination_coverage_etl_spark.operators.rangejoin import (
    bucketed_interval_join,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_boundary_semantics_and_bucket_straddle(spark):
    # anchor at 01:00; interval 1h -> matches [01:00, 02:00)
    left = spark.createDataFrame(
        [(1, _ts(1), "a")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(0, 59), 100),  # before anchor: no
            (1, _ts(1, 0), 101),   # == anchor: yes (inclusive start)
            (1, _ts(1, 30), 102),  # same bucket: yes
            (1, _ts(1, 59, 59), 103),  # next bucket, in range: yes
            (1, _ts(2, 0), 104),   # == end: no (exclusive end)
            (2, _ts(1, 30), 105),  # other key: no
        ],
        "user_id long, ts timestamp, val long",
    )
    out = bucketed_interval_join(
        left, right, keys=["user_id"], interval_seconds=3600
    )
    got = sorted(r["r_val"] for r in out.collect())
    assert got == [101, 102, 103]


def test_no_duplicate_matches_from_replication(spark):
    # right row replicated to 2 buckets must still match each anchor once
    left = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(1, 30))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(1, 45))], "user_id long, ts timestamp"
    )
    out = bucketed_interval_join(
        left, right, keys=["user_id"], interval_seconds=3600
    )
    rows = [(r["l_ts"], r["r_ts"]) for r in out.collect()]
    assert len(rows) == 2 and len(set(rows)) == 2


def test_matches_naive_join(spark, sf_small):
    from world_vaccination_coverage_etl_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_small, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cid"), "ts"
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), "ts"
    )
    fast = bucketed_interval_join(
        clicks, buys, keys=["user_id"], interval_seconds=6 * 3600
    ).select("user_id", F.col("l_cid").alias("cid"), F.col("r_pid").alias("pid"))
    naive = (
        clicks.alias("c")
        .join(
            buys.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") < F.col("c.ts") + F.expr("INTERVAL 6 HOURS")),
        )
        .select("c.user_id", F.col("c.cid").alias("cid"), F.col("p.pid").alias("pid"))
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_random_events_match_naive(spark):
    """Randomized boundary sweep: bucketed join == naive inequality
    join on seeded random timestamps clustered near bucket edges."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    interval = 600  # 10 min buckets
    rows = []
    for i in range(300):
        # cluster timestamps near multiples of the interval to stress
        # the bucket-boundary replication logic
        base = rng.randrange(0, 40) * interval
        jitter = rng.choice([-2, -1, 0, 1, 2, rng.randrange(interval)])
        rows.append((rng.randrange(5), i, _ts(0) + dt.timedelta(seconds=base + jitter)))
    df = spark.createDataFrame(rows, "user_id long, eid long, ts timestamp")
    left = df.select("user_id", F.col("eid").alias("lid"), "ts")
    right = df.select("user_id", F.col("eid").alias("rid"), "ts")
    fast = bucketed_interval_join(
        left, right, keys=["user_id"], interval_seconds=interval
    ).select("user_id", F.col("l_lid").alias("lid"), F.col("r_rid").alias("rid"))
    naive = (
        left.alias("a")
        .join(
            right.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") < F.col("a.ts") + F.expr(f"INTERVAL {interval} SECONDS")),
        )
        .select("a.user_id", F.col("a.lid").alias("lid"), F.col("b.rid").alias("rid"))
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_pre_epoch_timestamps_bucket_correctly(spark):
    # negative epoch seconds: floor(-0.5) = -1 but cast() would give 0,
    # splitting 1969 anchors from their in-range matches
    left = spark.createDataFrame(
        [(1, dt.datetime(1969, 12, 31, 23, 30))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(1969, 12, 31, 23, 45)),
         (1, dt.datetime(1970, 1, 1, 0, 15))],
        "user_id long, ts timestamp",
    )
    out = bucketed_interval_join(
        left, right, keys=["user_id"], interval_seconds=3600
    )
    assert out.count() == 2  # both within [23:30, 00:30)
