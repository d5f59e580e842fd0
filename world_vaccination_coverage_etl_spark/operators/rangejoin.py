"""Bucketed interval (range) join.

Spark executes a bare inequality join (``a.ts BETWEEN b.ts AND b.ts +
INTERVAL``) as a broadcast-nested-loop or cartesian product — O(n·m)
comparisons, a scale killer.  The standard distributed fix (used by
every time-series engine's "range join optimization") is bucketing:

1. pick the bucket width = the join interval length;
2. each LEFT row lands in bucket ``floor(ts / width)``;
3. each RIGHT row is REPLICATED to its own bucket and the next one —
   any match within ``[ts, ts + width)`` must sit in one of the two;
4. equi-join on (key, bucket) — a plain shuffled hash join — then
   apply the exact range predicate as a cheap residual filter.

Cost: one 2× replication of the right side + one hash shuffle on
(key, bucket) instead of an all-pairs loop.  Equi-join keys (user_id
here) further shrink bucket populations, and AQE handles skewed
buckets.  At 100 TB this is the same plan with more partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval_seconds: int = 6 * 3600,
    how: str = "inner",
) -> DataFrame:
    """Match right rows with ``left_ts <= right_ts < left_ts + interval``.

    ``keys``: equi-join columns present on both sides (e.g. user_id).
    Column names are prefixed ``l_``/``r_`` in the output (except keys)
    to keep the join self-join-safe.
    """
    w = F.lit(interval_seconds)
    # floor, not cast: cast truncates toward zero, which would shift
    # the bucket of any pre-1970 (negative-epoch) timestamp by one
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / w).alias("__bucket")
    l_pref = left.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in keys
        ],
        lb,
    )
    # right rows replicated to their bucket and the previous one: a
    # left anchor in bucket b can only match right rows in b or b+1,
    # equivalently a right row in bucket b matches anchors in b or b-1
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / w)
    r_pref = right.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in keys
        ],
        F.explode(F.array(rb, rb - 1)).alias("__bucket"),
    )
    joined = l_pref.join(r_pref, on=[*keys, "__bucket"], how=how)
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    return joined.filter(
        (rts >= lts)
        & (rts < F.timestamp_seconds(F.unix_timestamp(lts) + w))
    ).drop("__bucket")
