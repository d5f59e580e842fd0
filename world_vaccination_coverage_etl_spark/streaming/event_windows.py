"""Event-time windowed aggregation over the events table.

Batch and streaming flavors share the same windowing expressions —
``F.window`` works identically in both; the streaming flavor adds a
watermark for state cleanup (late data beyond the watermark is
dropped, the standard Structured Streaming contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def tumbling_event_counts(
    events: DataFrame, duration: str = "1 day", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, type)."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    duration: str = "2 days",
    slide: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows (each event lands in duration/slide windows)."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    duration: str = "1 day",
    watermark: str = "1 day",
    query_name: str = "event_counts",
):
    """Streaming flavor: parquet file source → watermark → tumbling agg
    → memory sink (for tests; swap the sink for production).  Returns
    the started StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = tumbling_event_counts(stream.withWatermark("ts", watermark), duration)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def streaming_tumbling_to_files(
    spark: SparkSession,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    duration: str = "1 day",
    watermark: str = "1 day",
    path_glob: str | None = None,
    ts_from_nanos: bool = False,
):
    """Scale-safe streaming flavor: file source → watermark → tumbling
    agg → **append-mode parquet sink**.

    Unlike the complete-mode memory sink (a correctness harness that
    materializes the whole aggregate on the driver every trigger), this
    is the shape that survives production scale: append mode emits each
    window exactly once, when the watermark passes its end — so state
    is evicted continuously and nothing ever accumulates on the driver.
    Output lands as parquet files partition-parallel.  Returns the
    started StreamingQuery; windows with ``window_end <= max(ts) -
    watermark`` are on disk after termination (AvailableNow).
    """
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(source_dir)
    if ts_from_nanos:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = tumbling_event_counts(stream.withWatermark("ts", watermark), duration)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Sessionization: gap-based session ids per user (batch flavor).

    lag(ts) over (user order by ts) → new-session flag on gap >
    threshold → running sum = session index.  Two window passes over
    the same partitioning — one shuffle total.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # microsecond precision on the gap comparison: sub-second timestamps
    # truncated to whole seconds can flip a gap across the threshold
    # (engine-vs-oracle drift); unix_micros ≡ DuckDB epoch_us.
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            > gap_us,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    return flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
