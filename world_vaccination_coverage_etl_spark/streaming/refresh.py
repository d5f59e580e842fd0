"""Incremental-refresh flavor of the ETL (SURVEY.md §2.10).

The reference refreshes by a weekly cron re-running the full batch ETL
(refresh_vaccination_db.yml:4-6,25-27).  The Spark-native incremental
flavor: a Structured Streaming file source over the staging directory
with ``Trigger.AvailableNow`` — each invocation processes exactly the
files that arrived since the last checkpoint, then stops.  Semantics
stay truncate-and-reload per batch via ``foreachBatch`` + overwrite,
matching the reference's idempotent load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..plans.pipeline import clean_immunization, melt_wide_to_tidy
from ..schemas import TABLE_CLEAN
from ..sources.warehouse import write_warehouse_table


def streaming_refresh_available_now(
    spark: SparkSession,
    staging_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    wide_schema: T.StructType,
) -> None:
    """Process all new staging CSVs, rebuild the clean table, stop.

    ``wide_schema`` must be explicit — streaming sources do not infer.
    """
    stream = (
        spark.readStream.schema(wide_schema)
        .option("header", True)
        .csv(staging_dir)
    )

    def load_batch(batch_df: DataFrame, _epoch: int) -> None:
        clean = clean_immunization(melt_wide_to_tidy(batch_df))
        write_warehouse_table(clean, warehouse_dir, TABLE_CLEAN, partition_by=["antigen"])

    query = (
        stream.writeStream.foreachBatch(load_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
