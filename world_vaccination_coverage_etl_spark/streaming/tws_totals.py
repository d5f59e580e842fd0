"""Per-key running totals on the transformWithStateInPandas API.

``transformWithStateInPandas`` (Spark 4) is the successor to
``applyInPandasWithState``: instead of one opaque state tuple, the
processor declares NAMED state variables (value/list/map) with
independent schemas and optional TTLs, and gets event-time/processing
-time timers — the building blocks Flink-style stateful applications
need.  This operator is the API's minimal production shape: per-user
running (count, sum) maintained in a ValueState and re-emitted each
micro-batch (update mode).

State is O(1) per key — two numbers — and commutative folds, so
arrival order across micro-batches cannot change the final totals and
the batch aggregate is an EXACT oracle (same contract as
``streaming_funnel_state``).  Readers keep the row with the highest
count per key; counts are monotone, so update-mode re-emissions
collapse with ``max_by``.

ENVIRONMENT GATE: transformWithStateInPandas drives a separate
streaming Python worker whose control protocol is protobuf-based;
this sandbox has no ``google.protobuf``, so the operator cannot
EXECUTE here (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
/ ImportError on google.protobuf).  The implementation is complete and
exercised up to query start by ``tests/test_tws_totals.py`` (plan
construction + the full-runtime test auto-skips without protobuf);
``streaming_funnel_state`` covers the same stateful semantics on the
applyInPandasWithState API, which runs here.  The query is therefore
NOT registered — the registry carries only executable, oracle-checked
entries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState(n, s): fold each batch's count/sum into the state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, s double")

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        prev = self._totals.get()
        n, s = (prev[0], prev[1]) if prev is not None else (0, 0.0)
        for pdf in rows:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def streaming_running_totals(
    events_stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (count, sum) via transformWithStateInPandas."""
    prepared = events_stream.select(
        F.col(user_col).alias("user_id"),
        F.col(value_col).alias("value"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType="user_id long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )
