"""Parquet warehouse: the engine's table storage.

The reference stores tables in a single SQLite file with
truncate-and-reload semantics (etl_pipeline.py:78-97).  Here a
"database" is a warehouse directory; a table is a parquet dataset
written with ``mode("overwrite")`` — the exact equivalent of the
reference's DROP+CREATE+append load.  Partitioning is caller-chosen;
the clean immunization table partitions by ``antigen`` (cardinality
~15 → healthy file counts at any scale, and the dashboards' hot
predicate is always on (country, antigen), so partition pruning serves
it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_path(warehouse_dir: str, table: str) -> str:
    return os.path.join(warehouse_dir, table)


def write_warehouse_table(
    df: DataFrame,
    warehouse_dir: str,
    table: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    path = table_path(warehouse_dir, table)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def read_warehouse_table(spark: SparkSession, warehouse_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(table_path(warehouse_dir, table))
