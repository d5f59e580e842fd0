"""Manifest-committed JSONL sink: commit-protocol semantics."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.sources.jsonl_sink_source import (
    MANIFEST,
    register_jsonl_manifest,
)


def _write(spark, df, path, mode="overwrite"):
    register_jsonl_manifest(spark)
    df.write.format("jsonl_manifest").mode(mode).save(path)


def _read(spark, path, ddl):
    register_jsonl_manifest(spark)
    return spark.read.format("jsonl_manifest").schema(ddl).load(path)


def test_round_trip_with_types(spark, tmp_path):
    p = str(tmp_path / "t1")
    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("ts"),
    )
    _write(spark, df.repartition(4), p)
    back = _read(spark, p, "id long, v double, s string, ts timestamp")
    assert back.count() == 100
    r = back.filter(F.col("id") == 7).collect()[0]
    assert r.v == 10.5 and r.s == "name_7" and r.ts.month == 3
    # manifest row counts sum to the table count
    man = json.load(open(os.path.join(p, MANIFEST)))
    assert sum(e["n_rows"] for e in man["files"]) == 100


def test_readers_see_only_manifest_committed_files(spark, tmp_path):
    p = str(tmp_path / "t2")
    _write(spark, spark.range(0, 10).select(F.col("id")), p)
    # simulate a speculative/failed attempt's leftovers: a stray data
    # file in the directory and garbage in staging — neither is listed
    with open(os.path.join(p, "part-99999-stray.jsonl"), "w") as fh:
        fh.write('{"id": 12345}\n')
    os.makedirs(os.path.join(p, "_staging", "deadjob"), exist_ok=True)
    with open(
        os.path.join(p, "_staging", "deadjob", "task-x.jsonl"), "w"
    ) as fh:
        fh.write('{"id": 54321}\n')
    got = {r.id for r in _read(spark, p, "id long").collect()}
    assert got == set(range(10))  # stray rows invisible


def test_overwrite_replaces_and_append_accumulates(spark, tmp_path):
    p = str(tmp_path / "t3")
    _write(spark, spark.range(0, 5).select(F.col("id")), p)
    _write(spark, spark.range(100, 103).select(F.col("id")), p, mode="overwrite")
    got = {r.id for r in _read(spark, p, "id long").collect()}
    assert got == {100, 101, 102}  # old files delisted even if present
    _write(spark, spark.range(200, 202).select(F.col("id")), p, mode="append")
    got = {r.id for r in _read(spark, p, "id long").collect()}
    assert got == {100, 101, 102, 200, 201}


def test_nulls_round_trip(spark, tmp_path):
    p = str(tmp_path / "t4")
    df = spark.range(0, 6).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.col("id") * 10).alias("maybe"),
    )
    _write(spark, df, p)
    back = _read(spark, p, "id long, maybe long")
    assert back.filter(F.col("maybe").isNull()).count() == 3


def test_time_travel_reads_old_snapshots(spark, tmp_path):
    p = str(tmp_path / "t5")
    _write(spark, spark.range(0, 4).select(F.col("id")), p)               # v1
    _write(spark, spark.range(10, 13).select(F.col("id")), p, "overwrite")  # v2
    _write(spark, spark.range(20, 22).select(F.col("id")), p, "append")     # v3
    register_jsonl_manifest(spark)

    def at(v):
        return {
            r.id
            for r in spark.read.format("jsonl_manifest")
            .schema("id long")
            .option("version", v)
            .load(p)
            .collect()
        }

    assert at(1) == {0, 1, 2, 3}
    assert at(2) == {10, 11, 12}
    assert at(3) == {10, 11, 12, 20, 21}
    assert {r.id for r in _read(spark, p, "id long").collect()} == at(3)


def test_vacuum_prunes_past_retention(spark, tmp_path):
    from world_vaccination_coverage_etl_spark.sources.jsonl_sink_source import (
        vacuum_jsonl_manifest,
    )

    p = str(tmp_path / "t6")
    _write(spark, spark.range(0, 4).select(F.col("id")), p)               # v1
    _write(spark, spark.range(10, 13).select(F.col("id")), p, "overwrite")  # v2
    _write(spark, spark.range(20, 22).select(F.col("id")), p, "append")     # v3
    report = vacuum_jsonl_manifest(p, retain=2)
    # v1's files are referenced by no retained snapshot -> deleted
    assert report["deleted_versions"] == [1]
    assert len(report["deleted_files"]) > 0
    register_jsonl_manifest(spark)
    # retained snapshots still read fine
    v2 = {
        r.id
        for r in spark.read.format("jsonl_manifest")
        .schema("id long")
        .option("version", 2)
        .load(p)
        .collect()
    }
    assert v2 == {10, 11, 12}
    # expired snapshot fails FAST (manifest gone), never a partial read
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.format("jsonl_manifest").schema("id long").option(
            "version", 1
        ).load(p).collect()
