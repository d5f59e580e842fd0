"""Interactive serving loop tests (serve.py) — the widget → query →
render loop the reference runs in Streamlit, here over stdlib HTTP."""

from __future__ import annotations

import threading
import urllib.request

import pytest

from world_vaccination_coverage_etl_spark.serve import DashboardApp, make_server

WIDE_ROWS = [
    ("Aland", y, 60.0 + i * 2.0, 70.0 + i)
    for i, y in enumerate(range(2010, 2023))
] + [
    ("Borland", y, 50.0 + i, None)
    for i, y in enumerate(range(2012, 2022))
]


@pytest.fixture(scope="module")
def served(spark):
    from world_vaccination_coverage_etl_spark.plans.pipeline import (
        clean_immunization,
        melt_wide_to_tidy,
    )

    wide = spark.createDataFrame(
        WIDE_ROWS,
        schema="Entity string, year int, coverage__bcg double, "
        "coverage__dtp3 double",
    )
    clean = clean_immunization(melt_wide_to_tidy(wide))
    server = make_server(DashboardApp(spark, clean), port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()
    server.server_close()


def _get(url: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.status, resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:  # 4xx still carries a body
        return e.code, e.read().decode("utf-8")


def test_index_lists_dimension_pairs(served):
    status, body = _get(served + "/")
    assert status == 200
    assert "Aland" in body and "Borland" in body
    assert "coverage__bcg" in body and "coverage__dtp3" in body


def test_dashboard_runs_parameterized_query(served):
    status, body = _get(
        served + "/dashboard?country=Aland&antigen=coverage__bcg"
        "&start_year=2017&pre_years=5&post_years=5"
    )
    assert status == 200
    assert "Aland" in body and "coverage__bcg" in body
    assert "Policy brief" in body and "<svg" in body


def test_dashboard_params_change_result(served):
    # interaction: switching the antigen widget re-runs the query and
    # produces a different document
    _, bcg = _get(served + "/dashboard?country=Aland&antigen=coverage__bcg")
    _, dtp3 = _get(served + "/dashboard?country=Aland&antigen=coverage__dtp3")
    assert bcg != dtp3
    assert "coverage__dtp3" in dtp3 and "coverage__dtp3" not in bcg


def test_dashboard_missing_series_404(served):
    status, body = _get(served + "/dashboard?country=Nowhere&antigen=coverage__bcg")
    assert status == 404 and "no data" in body


def test_dashboard_requires_params(served):
    status, _ = _get(served + "/dashboard")
    assert status == 400
