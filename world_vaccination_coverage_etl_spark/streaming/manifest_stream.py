"""Exactly-once streaming writes into the manifest-committed table.

``foreachBatch`` gives at-least-once batch delivery: after a crash
between sink-commit and checkpoint-commit, the SAME micro-batch (same
``batch_id``) is replayed.  An idempotent sink must therefore
de-duplicate on batch id — exactly what table formats do with their
transaction log.  Here the manifest IS the log: every commit records
the ``(stream_id, batch_id)`` it came from, and a replayed batch that
is already present becomes a no-op instead of duplicate rows.

This composes two pieces the repo already certifies — the
checkpointed foreachBatch loop (streaming/foreach_upsert.py) and the
atomic manifest commit (sources/jsonl_sink_source.py) — into the
end-to-end exactly-once contract: rows written = rows in exactly one
committed manifest version, under any crash/replay interleaving the
checkpoint can produce.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..sources.jsonl_sink_source import (
    MANIFEST,
    register_jsonl_manifest,
)


def _committed_batches(path: str, stream_id: str) -> set[int]:
    head = os.path.join(path, MANIFEST)
    if not os.path.exists(head):
        return set()
    with open(head) as fh:
        m = json.load(fh)
    return {
        e["batch_id"]
        for e in m.get("streams", [])
        if e["stream_id"] == stream_id
    }


def _record_batch(path: str, stream_id: str, batch_id: int) -> None:
    """Append the (stream_id, batch_id) provenance to the HEAD manifest
    (atomic pointer swap, same discipline as the writer's commit)."""
    head = os.path.join(path, MANIFEST)
    with open(head) as fh:
        m = json.load(fh)
    m.setdefault("streams", []).append(
        {"stream_id": stream_id, "batch_id": batch_id}
    )
    tmp = head + f".b{batch_id}.tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, head)


def stream_to_manifest_table(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    stream_id: str = "s1",
):
    """Start an AvailableNow foreachBatch stream into the manifest table.

    Returns the started StreamingQuery (caller awaits termination).
    A replayed batch id is skipped BEFORE any file is written, so
    crash-replay cannot duplicate rows.
    """
    spark = stream_df.sparkSession
    register_jsonl_manifest(spark)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in _committed_batches(path, stream_id):
            return  # replay of an already-committed batch: no-op
        batch_df.write.format("jsonl_manifest").mode("append").save(path)
        _record_batch(path, stream_id, batch_id)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
