"""Star-schema table registry over the driver-generated parquet.

``load_table(spark, sf_dir, name)`` is the single scan entry point the
query layer uses — it keeps every query's source declarative
(``spark.read.parquet``) so Catalyst gets predicate pushdown, column
pruning, and row-group skipping for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import STAR_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema table from ``sf_dir`` (lazy parquet scan).

    The ``events`` table is written with nanosecond parquet timestamps,
    which Spark 4 refuses to read natively (PARQUET_TYPE_ILLEGAL).  We
    opt into the legacy long-nanos read and restore a proper timestamp
    with microsecond truncation — bit-identical to how DuckDB (and
    pyarrow) surface the same column, so oracle comparisons line up.
    The conf is set here (not only in our session factory) because the
    driver harness calls queries under its own SparkSession.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each star table as a temp view for the SQL API."""
    for name in STAR_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
