"""Stream-static enrichment join.

The most common production streaming topology: an unbounded fact feed
joined against a (slowly changing) dimension table to attach business
attributes before aggregation — clicks x users, events x devices,
orders x catalog.

Spark's execution model makes this nearly free at any scale: a
stream-static equi-join is STATELESS (no join state store — each
micro-batch joins against the current snapshot of the static side),
and with a broadcast hint the dimension ships to executors once per
batch, so the streaming side never shuffles for the join.  That is
exactly the shape to preserve at 100 TB/day: keep dims broadcastable
(project the join key + needed attributes only) and let the stateful
operators downstream (windows, dedup) carry the only state.

Dimension updates are picked up on the next micro-batch because the
static plan re-resolves per batch — the classic "refresh the dim
table under the running query" pattern; no restart needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | F.Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame with a static dimension.

    ``how`` is restricted to the stream-static-supported types where
    the STREAM is preserved ('inner', 'left_outer', 'left_semi',
    'left_anti') — a right/full outer would need the unmatched static
    rows emitted at stream end, which has no well-defined trigger.
    """
    allowed = {"inner", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"stream-static join supports {sorted(allowed)}, got {how!r}"
        )
    if not stream.isStreaming:
        raise ValueError("`stream` must be a streaming DataFrame")
    if dim.isStreaming:
        raise ValueError("`dim` must be a static DataFrame")
    build = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(build, on, how)
