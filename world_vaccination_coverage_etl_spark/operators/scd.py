"""Slowly-changing-dimension (SCD type 2) build from an event history.

The classic warehouse maintenance step the reference's single-frame
pandas world never needs: collapse an append-only event log into
versioned dimension rows with ``effective_from`` / ``effective_to`` /
``is_current`` validity ranges.

Shape: one shuffle on the dimension key for the change-detection
window (lag + running sum), a partial-agged groupBy on (key, version)
that reuses the same partitioning, and one more key-window for the
``effective_to`` carry — O(1) state per key, no self-join, no
driver traffic.  At 100 TB the key-partitioned windows scale with the
number of keys; a skewed key would be handled by the salted-window
variants elsewhere in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse consecutive runs of ``attr_col`` per ``key_col`` into
    SCD2 version rows.

    A new version starts whenever the attribute differs from the
    previous event's (event order = ``(ts_col, tiebreak_col)``, the
    tiebreak making the collapse deterministic under equal
    timestamps).  ``effective_to`` is the next version's start
    (NULL = open / current row).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    versioned = df.select(
        key_col,
        attr_col,
        ts_col,
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("version"),
    )
    g = versioned.groupBy(key_col, "version", attr_col).agg(
        F.min(ts_col).alias("effective_from"),
        F.count("*").cast("long").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    to = F.lead("effective_from").over(wv)
    return g.select(
        key_col,
        "version",
        attr_col,
        "effective_from",
        to.alias("effective_to"),
        to.isNull().alias("is_current"),
        "n_events",
    )
