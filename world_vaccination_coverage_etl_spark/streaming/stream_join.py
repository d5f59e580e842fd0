"""Watermarked stream-stream interval join.

The last of the stateful streaming operator classes: joining two
unbounded feeds (click x purchase attribution, order x shipment
reconciliation, request x response pairing).  Unlike the stream-static
join (enrich.py, stateless), BOTH sides buffer rows in the state
store until a match can be ruled out — so the operator is only
scale-safe when the engine can evict, which requires:

- a WATERMARK on both inputs (bounds how late each side can arrive),
- a TIME-RANGE predicate tying the two event times together (bounds
  how long a row must wait for its match).

Given both, Spark derives a state-retention bound per side
(watermark delay + interval width) and drops buffered rows past it —
state stays O(rows per retention window), not O(stream ever seen).
That eviction arithmetic is the whole point of this operator at
100 TB/day; an interval-less stream-stream join would buffer forever
and is rejected here by construction (the range predicate is built
in, not caller-supplied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "6 hours",
    watermark: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on key equality with ``right_ts`` in
    ``[left_ts, left_ts + max_delay]``.

    ``on`` is the equality key present in BOTH inputs (it survives
    once in the output); all other column names must be disjoint.
    ``max_delay`` / ``watermark`` are SQL interval strings.
    """
    if not (left.isStreaming and right.isStreaming):
        raise ValueError("both inputs must be streaming DataFrames")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"non-key columns must be disjoint, overlapping: {sorted(overlap)}"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how).drop(rw[on])
