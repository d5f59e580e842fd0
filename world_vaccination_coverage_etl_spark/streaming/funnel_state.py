"""Stateful streaming funnel — per-user conversion stage as events
arrive.

The batch funnel (queries.py funnel_conversion) classifies each user
by first-occurrence ordering: stage 1 = viewed, stage 2 = clicked
after first view, stage 3 = purchased after that click.  This operator
maintains the same classification INCREMENTALLY over a stream with
``applyInPandasWithState``: the per-user state is just the three
first-occurrence timestamps (O(1) per key, the shape that scales to
10⁹ users), each micro-batch folds its arrivals in with ``min``, and
the user's current stage is re-derived and emitted (update mode).

Because the state is the order-insensitive triple of minimums — not a
sequential cursor — arrival order within or across micro-batches
cannot change the result: min() is commutative, so a late view that
precedes an already-seen click RAISES the user's stage exactly as the
batch query would.  That makes the operator watermark-free (no event
ever has to be dropped for state correctness) and the batch oracle an
exact equivalence, not an approximation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stage(tv, tc, tp) -> int:
    if tv is not None and tc is not None and tc > tv:
        if tp is not None and tp > tc:
            return 3
        return 2
    return 1 if tv is not None else 0


def streaming_funnel_state(
    events_stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel stage, updated each micro-batch.

    Output: (user_id, funnel_stage) in update mode — the stage is
    monotone non-decreasing, so readers keep ``max`` per user.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        (user_id,) = key
        tv, tc, tp = state.get if state.exists else (None, None, None)

        def fold(cur, series):
            vals = series.dropna()
            if not len(vals):
                return cur
            batch_min = int(vals.min())
            return batch_min if cur is None else min(cur, batch_min)

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            tv = fold(tv, pdf.loc[pdf["event_type"] == "view", "ts_us"])
            tc = fold(tc, pdf.loc[pdf["event_type"] == "click", "ts_us"])
            tp = fold(tp, pdf.loc[pdf["event_type"] == "purchase", "ts_us"])
        state.update((tv, tc, tp))
        yield pd.DataFrame(
            {"user_id": [user_id], "funnel_stage": [_stage(tv, tc, tp)]}
        )

    prepared = events_stream.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, funnel_stage int",
        stateStructType="tv long, tc long, tp long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
