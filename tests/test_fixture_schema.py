"""Fixture-drift tripwire (round-4 postmortem).

The driver regenerates /root/testdata between rounds; round 4 changed
``events.ts`` from TIMESTAMP(NANOS) to a plain microsecond timestamp and
the then-hardcoded nanos conversion broke ten queries.  These tests make
the NEXT regeneration fail ``pytest`` locally, before it fails the
driver:

* footer assertions pin every physical schema the query layer assumes;
* the events loader is exercised against BOTH physical layouts (the
  real testdata file plus a synthesized nanos file) so whichever way the
  fixtures drift, one branch of the schema-adaptive load is proven
  against real bytes, not assumptions.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from world_vaccination_coverage_etl_spark.sources.registry import (
    events_ts_is_nanos,
    load_table,
)

SF = "/root/testdata/sf0.001"

# column -> pyarrow type-check predicate; a regenerated fixture that
# changes any physical type trips the matching assertion by name
_EXPECTED = {
    "region": {"r_regionkey": pa.types.is_integer, "r_name": pa.types.is_string},
    "nation": {"n_nationkey": pa.types.is_integer, "n_name": pa.types.is_string},
    "customer": {"c_custkey": pa.types.is_integer, "c_acctbal": pa.types.is_floating},
    "supplier": {"s_suppkey": pa.types.is_integer},
    "part": {"p_partkey": pa.types.is_integer, "p_retailprice": pa.types.is_floating},
    "orders": {
        "o_orderkey": pa.types.is_integer,
        "o_orderdate": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
        "o_totalprice": pa.types.is_floating,
    },
    "lineitem": {
        "l_orderkey": pa.types.is_integer,
        "l_quantity": lambda t: pa.types.is_floating(t) or pa.types.is_integer(t),
        "l_shipdate": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
    },
    "events": {
        "event_id": pa.types.is_integer,
        "user_id": pa.types.is_integer,
        "event_type": pa.types.is_string,
        "value": pa.types.is_floating,
        # ts must be one of the two layouts the adaptive loader handles
        "ts": lambda t: pa.types.is_timestamp(t) or pa.types.is_int64(t),
    },
    "documents": {"doc_id": pa.types.is_integer, "text": pa.types.is_string},
    "embeddings": {
        "vec_id": pa.types.is_integer,
        "embedding": lambda t: pa.types.is_list(t) or pa.types.is_fixed_size_list(t),
    },
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_testdata_physical_schema(table):
    path = os.path.join(SF, f"{table}.parquet")
    assert os.path.exists(path), f"fixture missing: {path}"
    schema = pq.read_schema(path)
    for col, pred in _EXPECTED[table].items():
        assert col in schema.names, f"{table}.{col} vanished from fixture"
        t = schema.field(col).type
        assert pred(t), f"{table}.{col} drifted to unexpected physical type {t}"


def test_events_loader_native_layout(spark):
    """Against the REAL testdata (whatever layout this generation uses):
    the loaded ts must surface as event-time-capable TIMESTAMP."""
    df = load_table(spark, SF, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    # sane wall-clock range, not 1970-epoch garbage and not a collapsed
    # 1000x-shrunk span (the round-4 silent-corruption mode)
    assert row["lo"].year >= 2000, row
    assert (row["hi"] - row["lo"]) >= dt.timedelta(days=1), row


def test_events_loader_legacy_nanos_layout(spark, tmp_path):
    """Synthesize a TIMESTAMP(NANOS) events file and prove the legacy
    branch still decodes it to the same instants."""
    instants = [
        dt.datetime(2024, 3, 1, 12, 0, 0),
        dt.datetime(2024, 3, 3, 18, 30, 45, 123456),
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(instants, pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    nanos_dir = tmp_path / "nanos_sf"
    nanos_dir.mkdir()
    pq.write_table(
        table,
        str(nanos_dir / "events.parquet"),
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,  # keep nanosecond resolution
    )
    assert events_ts_is_nanos(str(nanos_dir)) is True
    df = load_table(spark, str(nanos_dir), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == instants


def test_events_probe_matches_real_fixture():
    """The probe must classify the real fixture the same way pyarrow
    does — guards the probe itself against drift."""
    t = pq.read_schema(os.path.join(SF, "events.parquet")).field("ts").type
    expect_nanos = not (pa.types.is_timestamp(t) and t.unit != "ns")
    assert events_ts_is_nanos(SF) is expect_nanos
