"""transformWithStateInPandas surface: construction always, execution
only where the env provides protobuf (the TWS worker protocol)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.streaming.tws_totals import (
    RunningTotalsProcessor,
    streaming_running_totals,
)


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_processor_folds_batches_locally():
    """The fold logic is plain Python over pandas batches — testable
    without the streaming runtime."""
    import pandas as pd

    class FakeValueState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            return FakeValueState()

    p = RunningTotalsProcessor()
    p.init(FakeHandle())
    out1 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [1.0, 2.0]})]), None)
    )
    out2 = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"value": [4.0]})]), None)
    )
    assert out1[0].iloc[0].tolist() == [7, 2, 3.0]
    assert out2[0].iloc[0].tolist() == [7, 3, 7.0]  # state carried


def test_stream_plan_constructs(spark, tmp_path):
    src = spark.readStream.schema("user_id long, value double").parquet(
        str(tmp_path)
    )
    out = streaming_running_totals(src)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "sum_value",
    ]


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithStateInPandas worker needs google.protobuf "
    "(absent in this sandbox)",
)
def test_totals_match_batch_aggregate(spark, tmp_path):
    rows = [(u, float(v)) for u in range(5) for v in range(u + 1)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    src_dir, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    df.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("user_id long, value double").parquet(
        src_dir
    )
    q = (
        streaming_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("tws_test")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    exp = {
        r.user_id: (r.n, r.s)
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == exp
