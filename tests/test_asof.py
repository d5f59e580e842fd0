"""As-of join semantics tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from world_vaccination_coverage_etl_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0), "l0"),   # before any right row -> NULL
            (1, _ts(10), "l1"),  # after r@5 -> 100
            (1, _ts(20), "l2"),  # ties with r@20 -> right visible -> 200
            (1, _ts(30), "l3"),  # still 200 (no newer right)
            (2, _ts(30), "l4"),  # other key: only r@25 -> 300
            (3, _ts(30), "l5"),  # key with no right rows at all -> NULL
        ],
        "user_id long, ts timestamp, label string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(20), 200.0), (2, _ts(25), 300.0)],
        "user_id long, ts timestamp, val double",
    )
    out = asof_join(left, right, key_cols=["user_id"], ts_col="ts")
    got = {r.label: r.val_asof for r in out.collect()}
    assert got == {
        "l0": None,
        "l1": 100.0,
        "l2": 200.0,
        "l3": 200.0,
        "l4": 300.0,
        "l5": None,
    }
    # left payload columns survive, right rows don't leak through
    assert out.count() == 6
    assert set(out.columns) == {"user_id", "ts", "label", "val_asof"}


def test_asof_multiple_value_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "x")], "k long, ts timestamp, payload string"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 1.5, "a")], "k long, ts timestamp, v double, s string"
    )
    row = asof_join(left, right, key_cols=["k"], ts_col="ts").collect()[0]
    assert row.v_asof == 1.5 and row.s_asof == "a" and row.payload == "x"
