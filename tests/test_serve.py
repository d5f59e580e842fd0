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
    # each request runs a Spark job in the server thread; under a
    # saturated host (e.g. a concurrent 32-core sweep) a single
    # attempt can exceed any fixed budget — retry with a generous
    # per-attempt timeout so load cannot fail a correctness test
    # (r10 verdict item 7)
    last: Exception | None = None
    for _ in range(3):
        try:
            with urllib.request.urlopen(url, timeout=120) as resp:
                return resp.status, resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:  # 4xx still carries a body
            return e.code, e.read().decode("utf-8")
        except (TimeoutError, urllib.error.URLError) as e:
            last = e
    raise AssertionError(f"request kept timing out: {url}") from last


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


def test_interactive_series_html_fragment():
    """The plotly-parity surface (reference streamlit_app.py:254-308):
    static SVG marks identical to _svg_chart, embedded JSON data, and
    the vanilla-JS hover/zoom/pan/reset handlers."""
    import json

    from world_vaccination_coverage_etl_spark.functions.chart import (
        _svg_chart,
        interactive_series_html,
    )

    pts = [(2000, 80.0), (2001, 85.5), (2002, 70.25)]
    wins = [(2000, 2001, "#1f77b4"), (2001, 2002, "#ff7f0e")]
    frag = interactive_series_html(
        pts, "A <Title> & more", campaign_year=2001, windows=wins
    )
    # every static mark of the non-interactive renderer is present
    static = _svg_chart(
        [(float(x), float(y)) for x, y in pts],
        "A <Title> & more", 2001.0, 720, 360, wins,
    )
    inner = static[static.index(">") + 1 : static.rindex("</svg>")]
    assert inner in frag
    # embedded data round-trips
    import html as _html
    import re

    m = re.search(r"data-chart='([^']*)'", frag)
    cfg = json.loads(_html.unescape(m.group(1)))
    assert cfg["points"] == [[2000.0, 80.0], [2001.0, 85.5], [2002.0, 70.25]]
    assert cfg["campaign"] == 2001 and len(cfg["windows"]) == 2
    assert "&lt;Title&gt;" in cfg["title"]  # escaped before JS innerHTML
    # the interaction handlers ship
    for hook in ("mousemove", "wheel", "mousedown", "dblclick", "hovtx"):
        assert hook in frag
    # empty series still guarded
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interactive_series_html([])


def test_dashboard_embeds_interactive_chart(tmp_path):
    from types import SimpleNamespace

    from world_vaccination_coverage_etl_spark.functions.dashboard import (
        render_dashboard_html,
    )

    stats = SimpleNamespace(
        avg_before=80.0, avg_after=85.0, diff_pp=5.0, p_value=0.01,
        n_before=5, n_after=5, significance="significant increase",
        ci_lo_before=78.0, ci_hi_before=82.0, ci_lo_after=83.0,
        ci_hi_after=87.0, sem_before=1.0, sem_after=1.0,
    )
    body = render_dashboard_html(
        "Testland", "DTP3", [(y, 80.0 + y % 5) for y in range(1998, 2008)],
        stats, start_year=2003, pre_years=5, post_years=4,
    )
    assert "data-chart=" in body and "<script>" in body
    assert "dblclick" in body  # zoom-reset handler shipped
