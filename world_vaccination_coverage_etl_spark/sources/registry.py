"""Star-schema table registry over the driver-generated parquet.

``load_table(spark, sf_dir, name)`` is the single scan entry point the
query layer uses — it keeps every query's source declarative
(``spark.read.parquet``) so Catalyst gets predicate pushdown, column
pruning, and row-group skipping for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import STAR_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema table from ``sf_dir`` (lazy parquet scan)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each star table as a temp view for the SQL API."""
    for name in STAR_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
