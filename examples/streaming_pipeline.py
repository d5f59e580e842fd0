"""Runnable demo: production-shaped streaming pipeline end to end.

    python examples/streaming_pipeline.py [sf_dir]

Composes the engine's streaming pieces the way a production topology
would:

1. **source**  — file stream over the events table (schema-adaptive
                 ts handling, same loader contract as batch);
2. **dedup**   — `dropDuplicatesWithinWatermark` on event_id: bounded
                 state, survives at-least-once upstream delivery (the
                 demo unions the feed with itself so every event
                 really arrives twice);
3. **rollup**  — CHAINED stateful aggregation: hourly tumbling
                 partials re-windowed into daily stats
                 (streaming/event_windows.py two_level_window_rollup);
4. **sink**    — the manifest-committed JSONL sink on the DataSource
                 streaming-write API: task-staged files, idempotent
                 per-(stream, batch) driver commit, atomic manifest
                 swap — a replayed micro-batch can never double-write;
5. **consume** — read the table back through the manifest reader and
                 show the rollup.

Append mode all the way: state evicts continuously, nothing
accumulates on the driver, and the sink is exactly-once — the
properties a 100 TB deployment needs from every streaming job.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from world_vaccination_coverage_etl_spark.queries import (  # noqa: E402
    _events_stream,
    _stream_state_partitions,
)
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402
from world_vaccination_coverage_etl_spark.sources.jsonl_sink_source import (  # noqa: E402
    register_jsonl_manifest,
)
from world_vaccination_coverage_etl_spark.streaming.dedup_stream import (  # noqa: E402
    dedup_within_watermark,
)
from world_vaccination_coverage_etl_spark.streaming.event_windows import (  # noqa: E402
    two_level_window_rollup,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming_pipeline", master="local[8]",
                      shuffle_partitions=8)
    register_jsonl_manifest(spark)
    work = tempfile.mkdtemp(prefix="stream_pipe_")
    table = os.path.join(work, "daily_rollup")
    ck = os.path.join(work, "ck")

    src = _events_stream(spark, sf)
    doubled = src.unionByName(src)  # at-least-once upstream, simulated
    # ONE watermark serves the whole cascade: redefining it downstream
    # of a stateful operator is disallowed (the lateness contract is
    # per-input, not per-operator), so the dedup's 1 h delay is also
    # the rollup's eviction clock
    deduped = dedup_within_watermark(
        doubled, ["event_id"], watermark_col="ts", delay="1 hour"
    )
    rolled = two_level_window_rollup(deduped, hourly="1 hour", daily="1 day")
    out = rolled.select(
        F.col("window_start").cast("date").cast("string").alias("day"),
        "event_type",
        "n_events",
        "max_hourly",
        "n_hours",
    )

    with _stream_state_partitions(spark):
        q = (
            out.writeStream.format("jsonl_manifest")
            .option("checkpointLocation", ck)
            .option("stream_id", "daily_rollup")
            .trigger(availableNow=True)
            .start(table)
        )
        q.awaitTermination()

    back = (
        spark.read.format("jsonl_manifest")
        .schema(
            "day string, event_type string, n_events long, "
            "max_hourly long, n_hours long"
        )
        .load(table)
    )
    n = back.count()
    print(f"rollup rows committed exactly-once: {n}")
    back.orderBy("day", "event_type").show(10)

    # restart with no new data: the checkpoint proves nothing re-emits
    with _stream_state_partitions(spark):
        q2 = (
            out.writeStream.format("jsonl_manifest")
            .option("checkpointLocation", ck)
            .option("stream_id", "daily_rollup")
            .trigger(availableNow=True)
            .start(table)
        )
        q2.awaitTermination()
    n2 = (
        spark.read.format("jsonl_manifest")
        .schema(
            "day string, event_type string, n_events long, "
            "max_hourly long, n_hours long"
        )
        .load(table)
        .count()
    )
    print(f"after no-new-data restart: {n2} rows (unchanged={n2 == n})")


if __name__ == "__main__":
    main()
