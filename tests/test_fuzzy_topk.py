"""fuzzy_match_topk_docs: the capped fuzzy-match flavor (r10).

The DuckDB oracle certifies the query at sf0.01 by brute-force
expansion; these tests pin the same rule independently with a pure-
Python levenshtein at sf0.001 (500 docs — small enough for O(n²))
so a prune regression cannot hide behind an oracle text change, plus
structural invariants of the top-k contract.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str, cap: int = 8) -> int:
    """Plain DP edit distance with a band cap (−1 past cap)."""
    if abs(len(a) - len(b)) > cap:
        return -1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        lo = cap + 1
        for j, cb in enumerate(b, 1):
            v = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            )
            cur.append(v)
            lo = min(lo, v)
        if lo > cap:
            return -1
        prev = cur
    return prev[-1] if prev[-1] <= cap else -1


@pytest.fixture(scope="module")
def topk_result(spark):
    from world_vaccination_coverage_etl_spark.queries import REGISTRY

    return (
        REGISTRY["fuzzy_match_topk_docs"].fn(spark, SF).toPandas()
    )


@pytest.fixture(scope="module")
def brute_force(spark):
    """Per-doc top-3 by (dist, partner id) over the FULL pair set."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            "doc_id",
            "lang",
            "cast(n_chars / 16 as long) as lb",
            "substring(text, 1, 40) as h",
        )
        .toPandas()
    )
    rows = docs.to_dict("records")
    out = {}
    for a in rows:
        cands = []
        for b in rows:
            if b["doc_id"] == a["doc_id"]:
                continue
            if b["lang"] != a["lang"] or abs(b["lb"] - a["lb"]) > 1:
                continue
            d = _lev(a["h"], b["h"])
            if 0 <= d <= 8:
                cands.append((d, b["doc_id"]))
        cands.sort()
        if cands:
            out[a["doc_id"]] = cands[:3]
    return out


def test_topk_matches_brute_force(topk_result, brute_force):
    got = {}
    for r in topk_result.itertuples():
        got.setdefault(r.doc_id, []).append((r.dist, r.match_id, r.rk))
    assert set(got) == set(brute_force)
    for doc_id, expect in brute_force.items():
        mine = sorted(got[doc_id], key=lambda t: t[2])
        assert [(d, m) for d, m, _ in mine] == expect, doc_id
        assert [rk for _, _, rk in mine] == list(range(1, len(mine) + 1))


def test_topk_structural_invariants(topk_result):
    assert not topk_result.empty
    grp = topk_result.groupby("doc_id")
    assert int(grp.size().max()) <= 3
    for _doc, g in grp:
        g = g.sort_values("rk")
        # ranks contiguous from 1; dist non-decreasing along rank;
        # partner ids strictly increasing within a dist level
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        assert list(g["dist"]) == sorted(g["dist"])
        for d in set(g["dist"]):
            ids = list(g[g["dist"] == d]["match_id"])
            assert ids == sorted(ids)
    # no self matches
    assert (topk_result["doc_id"] != topk_result["match_id"]).all()


def test_fan_out_gates_on_split_count(spark):
    from world_vaccination_coverage_etl_spark.queries._core import fan_out

    one = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    assert one.rdd.getNumPartitions() == 1
    wide = fan_out(one, SF)
    target = spark.sparkContext.defaultParallelism
    assert wide.rdd.getNumPartitions() == target
    assert wide.count() == one.count()


def test_fan_out_noop_for_many_split_source(spark, tmp_path):
    """The gate must be a NO-OP when the source supplies enough
    splits (the 100 TB case) — pinned against a sparse file whose
    apparent size spans many maxPartitionBytes splits, so no real
    I/O happens and no RDD is materialized for the probe."""
    from world_vaccination_coverage_etl_spark.queries._core import (
        _scan_split_estimate,
        fan_out,
    )

    big = tmp_path / "documents.parquet"
    with open(big, "wb") as fh:
        fh.truncate(8 << 30)  # sparse 8 GiB
    target = spark.sparkContext.defaultParallelism
    est = _scan_split_estimate(spark, str(tmp_path), "documents")
    assert est >= target
    # fan_out must return the input plan object untouched (the probe
    # is metadata-only: the fake parquet is never read)
    df = spark.range(10)
    assert fan_out(df, str(tmp_path)) is df


def test_fuzzy_candidate_join_keeps_user_partitioning(spark):
    """The r10 salted candidate join must keep its user-specified
    exchanges: if the planner ever re-wraps them (or AQE coalesces
    them away), the quadratic fan-out lands back on a handful of
    reducers — the 30-minute-straggler regression this guards."""
    from world_vaccination_coverage_etl_spark.queries.m10_tpch_breadth import (
        _fuzzy_group_graph,
    )

    _g, _m, gpairs = _fuzzy_group_graph(spark, SF)
    plan = gpairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") == 2
    # no planner-inserted exchange may sit between the user exchanges
    # and the join: every ENSURE_REQUIREMENTS exchange in the plan
    # must hash on the pre-join (lang, lb, h) groupBy key, never on
    # the salted join keys
    for line in plan.splitlines():
        if "ENSURE_REQUIREMENTS" in line:
            assert "__salt" not in line and "__isalt" not in line, line
