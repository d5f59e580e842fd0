"""Same-session idempotency: the driver (and bench, best-of-2) may run
a registered query more than once in one SparkSession.  Queries with
side-state (memory-sink names, scratch dirs, checkpoints, cached
indexes, streaming restarts) must return identical results on the
second call."""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.queries import REGISTRY

# one representative per side-state family: memory sink (uuid names),
# parquet sink + checkpoint, foreachBatch warehouse, stage-materialized
# pipeline, session-cached dimension probe, iterative loop
REPEAT = [
    "streaming_tumbling_daily",
    "streaming_tumbling_append",
    "streaming_upsert_latest",
    "dup_connected_components",
    "event_path_topk",
]


@pytest.mark.parametrize("name", REPEAT)
def test_second_run_matches_first(spark, sf_small, name):
    fn = REGISTRY[name].fn
    first = [tuple(r) for r in fn(spark, sf_small).collect()]
    second = [tuple(r) for r in fn(spark, sf_small).collect()]
    assert first == second
    assert len(first) > 0
