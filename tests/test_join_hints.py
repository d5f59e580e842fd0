"""Join-strategy control pins.

At 100 TB the physical join strategy is a first-order cost decision;
these tests pin that each hint actually selects its strategy on this
Spark version, so an upgrade that silently re-maps hints (or a config
that disables one path) fails CI rather than surfacing as a
mystery-slow cluster job.

AQE can re-plan joins at runtime, so assertions run on the final
(adaptive) executed plan after an action.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _frames(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(0, 1_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("vb")
    )
    return a, b


def test_broadcast_hint_selects_broadcast_hash_join(spark):
    a, b = _frames(spark)
    plan = _plan(a.join(F.broadcast(b), "k"))
    assert "BroadcastHashJoin" in plan


def test_shuffle_merge_hint_selects_sort_merge_join(spark):
    a, b = _frames(spark)
    plan = _plan(a.join(b.hint("SHUFFLE_MERGE"), "k"))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint_selects_shuffled_hash_join(spark):
    a, b = _frames(spark)
    plan = _plan(a.join(b.hint("SHUFFLE_HASH"), "k"))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_merge_hint_beats_auto_broadcast(spark):
    # the hint must override the size-based auto-broadcast decision:
    # b is tiny (would auto-broadcast) yet SHUFFLE_MERGE wins
    a, b = _frames(spark)
    tiny = b.limit(10)
    plan = _plan(a.join(tiny.hint("SHUFFLE_MERGE"), "k"))
    assert "SortMergeJoin" in plan
