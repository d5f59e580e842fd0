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


def write_sorted_table(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Range-partitioned, file-sorted layout — the data-skipping op.

    ``repartitionByRange(sort_cols)`` gives each output file a DISJOINT
    key range, and ``sortWithinPartitions`` orders rows inside it, so
    every parquet footer carries tight, non-overlapping min/max stats
    on ``sort_cols``.  A later scan with a predicate on those columns
    then skips whole files (and whole row groups within files) from
    metadata alone — this is the single-column essence of what table
    formats call OPTIMIZE/ZORDER, done with two built-in operators.

    At 100 TB this is the nightly layout job for the hot filter
    column: one range shuffle (sampled range boundaries, so skew in
    ``sort_cols`` spreads across files instead of hot-spotting one),
    then a local sort per file.  Pair with `compact_parquet`
    (sinks.py) when the input is also fragmented.

    ``tests/test_warehouse_bucketing.py`` pins the layout property:
    per-file min/max ranges on the sort column do not overlap.
    """
    parts = df.repartitionByRange(*sort_cols) if n_files is None else (
        df.repartitionByRange(n_files, *sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted catalog table — the co-located-join layout.

    Two fact tables bucketed the same way (same columns, same bucket
    count) join with NO shuffle exchange: each task reads the matching
    bucket from both sides, and with ``sort_cols`` = join keys the sort
    vanishes too.  At 100 TB this turns the recurring fact⋈fact join
    from a full-network shuffle into a purely local merge — the single
    biggest structural join optimization Spark offers, and it composes
    with partition pruning.  (Bucketed layout requires the session
    catalog: ``saveAsTable``, not path-based ``parquet()``.  Set
    ``spark.sql.warehouse.dir`` to place the files.)

    ``tests/test_warehouse_bucketing.py`` pins the plan property: the
    bucketed self-join contains zero Exchange operators.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
