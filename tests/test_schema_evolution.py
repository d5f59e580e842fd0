"""Tests for sources/evolution.py (drifted-warehouse reads)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from world_vaccination_coverage_etl_spark.sources.evolution import (
    discover_drift,
    read_with_schema_evolution,
)

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("a", T.DoubleType()),
        T.StructField("b", T.StringType()),
    ]
)


@pytest.fixture()
def drifted_dir(tmp_path):
    # v1 era: no column b, narrow int32 id / float32 a, plus a column
    # later dropped from the contract
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int32()),
                "a": pa.array([1.5, 2.5], pa.float32()),
                "legacy": pa.array(["x", "y"]),
            }
        ),
        str(tmp_path / "v1.parquet"),
    )
    # v2 era: full current schema
    pq.write_table(
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "a": pa.array([3.5], pa.float64()),
                "b": pa.array(["new"]),
            }
        ),
        str(tmp_path / "v2.parquet"),
    )
    return str(tmp_path)


def test_conformed_union(spark, drifted_dir):
    df = read_with_schema_evolution(spark, drifted_dir, TARGET)
    assert [f.name for f in df.schema.fields] == ["id", "a", "b"]
    assert df.schema["id"].dataType.typeName() == "long"
    assert df.schema["a"].dataType.typeName() == "double"
    rows = {r["id"]: (r["a"], r["b"]) for r in df.collect()}
    assert rows[1] == (1.5, None) and rows[2] == (2.5, None)
    assert rows[3] == (3.5, "new")


def test_mergeschema_cannot_express_this(spark, drifted_dir):
    # the motivating failure pair:
    # (a) the default read takes one footer and can lose columns
    plain = spark.read.parquet(drifted_dir)
    assert set(plain.columns) < {"id", "a", "b", "legacy"}
    # (b) mergeSchema refuses the int32 -> int64 width change outright
    with pytest.raises(Exception, match="CANNOT_MERGE|merge"):
        spark.read.option("mergeSchema", "true").parquet(drifted_dir).schema


def test_discover_drift_report(drifted_dir):
    report = discover_drift(drifted_dir, TARGET)
    assert set(report) == {"v1.parquet"}  # v2 conforms -> omitted
    v1 = report["v1.parquet"]
    assert v1["added"] == ["legacy"]
    assert v1["missing"] == ["b"]
    assert sorted(v1["retyped"]) == ["a: float -> double", "id: int32 -> long"]
