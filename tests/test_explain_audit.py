"""The nested-loop/cartesian plan warning stays meaningful (r11
verdict item 3): a scalar crossJoin (1-row global-aggregate broadcast
side) is whitelisted, a REAL cartesian still trips it."""

import importlib.util
import os

from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "explain_audit",
    os.path.join(os.path.dirname(__file__), "..", "tools", "explain_audit.py"),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)
summarize = _MOD.summarize


def _plans(df):
    df.collect()
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
    return qe.explainString(mode("formatted")), qe.explainString(mode("simple"))


def test_scalar_broadcast_crossjoin_not_flagged(spark):
    base = spark.range(100).withColumn("v", F.col("id") * 2)
    total = base.agg(F.sum("v").alias("tot"))
    df = base.crossJoin(F.broadcast(total)).select(
        "id", (F.col("v") / F.col("tot")).alias("share")
    )
    plan, simple = _plans(df)
    assert "BroadcastNestedLoopJoin" in simple
    notes = summarize(plan, simple)
    assert not any("WARNING: nested-loop" in n for n in notes), notes
    assert any("scalar-broadcast" in n for n in notes), notes


def test_grouped_aggregate_build_gets_check_note(spark):
    # distinct dimension crossed with another table: bounded by the
    # group-key cardinality -> surfaced as a check-me note, not a
    # warning and not silently scalar-whitelisted
    base = spark.range(200).withColumn("k", F.col("id") % 4)
    dims = base.groupBy("k").agg(F.count("*").alias("n"))
    df = base.crossJoin(F.broadcast(dims.select("k", "n")))
    plan, simple = _plans(df)
    assert "BroadcastNestedLoopJoin" in simple
    notes = summarize(plan, simple)
    assert not any("WARNING: nested-loop" in n for n in notes), notes
    assert not any("scalar-broadcast" in n for n in notes), notes
    assert any("aggregate-bounded" in n for n in notes), notes


def test_real_cartesian_still_flagged(spark):
    a = spark.range(50).withColumnRenamed("id", "a")
    b = spark.range(40).withColumnRenamed("id", "b")
    df = a.crossJoin(F.broadcast(b)).select((F.col("a") + F.col("b")).alias("s"))
    plan, simple = _plans(df)
    notes = summarize(plan, simple)
    assert any("WARNING: nested-loop" in n for n in notes), notes


def test_unhinted_cartesian_product_still_flagged(spark):
    a = spark.range(30).withColumnRenamed("id", "a")
    b = spark.range(30).withColumnRenamed("id", "b")
    df = a.join(b, F.col("a") < F.col("b"))
    plan, simple = _plans(df)
    notes = summarize(plan, simple)
    assert any("WARNING: nested-loop" in n for n in notes), notes


def test_row_expanding_scalar_build_still_flagged(spark):
    # explode(collect_list(...)) on the broadcast side: the subtree
    # CONTAINS a keys=[] aggregate but Generate multiplies its one row
    # back to N — must stay a WARNING, not a scalar whitelist hit
    base = spark.range(60).withColumn("v", F.col("id") % 7)
    blown = (
        base.agg(F.collect_list("v").alias("vs"))
        .select(F.explode("vs").alias("v2"))
    )
    df = base.crossJoin(F.broadcast(blown))
    plan, simple = _plans(df)
    if "BroadcastNestedLoopJoin" not in simple:
        import pytest as _pytest

        _pytest.skip("planner chose a non-BNLJ shape")
    notes = summarize(plan, simple)
    assert any("WARNING: nested-loop" in n for n in notes), notes
