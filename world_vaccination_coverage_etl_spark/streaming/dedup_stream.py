"""Streaming exact deduplication with bounded state.

The batch engine dedups with one hash shuffle (operators/dedup.py
``exact_dedup``); the streaming analogue must ALSO bound its state or
the key set grows forever.  ``dropDuplicatesWithinWatermark`` keeps a
key in the state store only until the event-time watermark passes it —
the shape a 100 TB ingest pipeline needs: duplicates in real feeds
(retries, at-least-once sources) arrive close together in event time,
so eviction after the watermark delay loses nothing while keeping
state O(keys per window) instead of O(keys ever seen).

Plain ``dropDuplicates`` (unbounded state) is deliberately not used
here; it is only correct for bounded replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    watermark_col: str = "ts",
    delay: str = "1 day",
) -> DataFrame:
    """Drop duplicate ``key_cols`` rows arriving within the watermark.

    Emits each key's FIRST arrival (append mode); later copies inside
    ``delay`` are suppressed, and the key's state is evicted once the
    watermark passes, so state stays bounded.
    """
    return stream.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
