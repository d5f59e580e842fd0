"""Multi-micro-batch tests for streaming/foreach_upsert.py."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from world_vaccination_coverage_etl_spark.streaming.foreach_upsert import (
    latest_per_key,
    streaming_upsert_parquet,
)

SCHEMA = "user_id long, event_id long, ts timestamp"


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _write_file(path, rows):
    """One plain parquet FILE per micro-batch (the file-stream source
    does not recurse into Spark-style output directories)."""
    table = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(table, str(path))


def test_latest_per_key_total_order(spark):
    df = spark.createDataFrame(
        [
            (1, 10, _ts(5)),
            (1, 11, _ts(9)),   # latest ts wins
            (2, 20, _ts(3)),
            (2, 21, _ts(3)),   # ts tie -> higher event_id wins
        ],
        SCHEMA,
    )
    got = {
        r["user_id"]: r["event_id"]
        for r in latest_per_key(df, "user_id", "ts", "event_id").collect()
    }
    assert got == {1: 11, 2: 21}


def test_incremental_upsert_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch files written separately; maxFilesPerTrigger=1 forces one
    # micro-batch per file, so the second file must MERGE, not append
    _write_file(src / "b1.parquet", [(1, 100, _ts(1)), (2, 200, _ts(1))])
    _write_file(src / "b2.parquet", [(1, 101, _ts(2)), (3, 300, _ts(1))])

    q = streaming_upsert_parquet(
        spark, str(src), SCHEMA, out, ck, max_files_per_trigger=1
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch

    got = {
        r["user_id"]: r["event_id"]
        for r in spark.read.parquet(out).collect()
    }
    # user 1 upserted by the later batch, users 2/3 retained
    assert got == {1: 101, 2: 200, 3: 300}
    assert os.path.isdir(ck)


def test_upsert_restart_is_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _write_file(src / "b1.parquet", [(1, 100, _ts(1))])
    q = streaming_upsert_parquet(spark, str(src), SCHEMA, out, ck)
    q.awaitTermination()
    # restart with the same checkpoint and no new files: no reprocessing,
    # warehouse unchanged
    q2 = streaming_upsert_parquet(spark, str(src), SCHEMA, out, ck)
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert [(r["user_id"], r["event_id"]) for r in rows] == [(1, 100)]
