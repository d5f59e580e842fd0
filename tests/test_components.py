"""Unit tests for operators/components.py (connected components)."""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.operators.components import (
    component_summary,
    connected_components,
)


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], "id_a long, id_b long"
    )
    out = connected_components(nodes, edges, **kw)
    return {r["doc_id"]: r["component_id"] for r in out.collect()}


def test_chain_clique_singleton(spark):
    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, singleton 20
    got = _cc(
        spark,
        [1, 2, 3, 4, 10, 11, 12, 20],
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_direction_insensitive(spark):
    # edges listed high->low still propagate the min label
    got = _cc(spark, [5, 6, 7], [(7, 6), (6, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_empty_edges(spark):
    got = _cc(spark, [1, 2, 3], [])
    assert got == {1: 1, 2: 2, 3: 3}


def test_summary(spark):
    nodes = spark.createDataFrame([(n,) for n in [1, 2, 3, 9]], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    comp = connected_components(nodes, edges)
    rows = {
        r["component_id"]: (r["n_members"], r["keeper_id"])
        for r in component_summary(comp).collect()
    }
    assert rows == {1: (3, 1), 9: (1, 9)}


def test_nonconvergence_raises(spark):
    # a 6-node chain has diameter 5; with max_iter=1 label propagation
    # cannot finish -> the guard must fire rather than return bad labels
    nodes = spark.createDataFrame([(n,) for n in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1)


def test_random_graphs_match_union_find(spark):
    """Randomized cross-check: label propagation == a union-find
    reference on seeded random graphs (varying density, incl. isolated
    nodes)."""
    import random

    for seed, n, m in [(1, 30, 10), (2, 40, 60), (3, 25, 5), (4, 50, 120)]:
        rng = random.Random(seed)
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical: min node id reachable
        expect = {}
        for v in nodes:
            root = find(v)
            expect.setdefault(root, []).append(v)
        want = {v: min(members) for root, members in expect.items() for v in members}

        got = _cc(spark, nodes, edges)
        assert got == want, f"seed={seed}"


def test_staged_flavor_matches_checkpoint_flavor(spark, tmp_path):
    """Durable-parquet staging (the cluster path: per-round staging
    tables instead of executor-pinned localCheckpoint) must yield the
    same labeling."""
    nodes = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (6, 7)], "id_a long, id_b long"
    )
    base = sorted(
        tuple(r) for r in connected_components(nodes, edges).collect()
    )
    staged = sorted(
        tuple(r)
        for r in connected_components(
            nodes, edges, staging_dir=str(tmp_path / "cc")
        ).collect()
    )
    assert staged == base
    comp = dict(base)
    assert comp[2] == 0 and comp[4] == 3 and comp[5] == 5 and comp[7] == 6


# --------------------------------------------------------------- #
# degree-oriented triangle enumeration (r10 verdict item 4)

from itertools import combinations

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.operators.components import (
    orient_edges,
    oriented_triangles,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src long, dst long"
    )


def _tris(spark, pairs):
    out = oriented_triangles(_edges_df(spark, pairs)).collect()
    return sorted((r["a"], r["b"], r["c"]) for r in out)


def _brute(pairs):
    adj = {frozenset(p) for p in pairs}
    nodes = sorted({n for p in pairs for n in p})
    return sorted(
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= adj
    )


def test_triangles_clique_exactly_once(spark):
    # K4 has exactly 4 triangles; each enumerated once, sorted a<b<c
    k4 = list(combinations([3, 1, 7, 5], 2))
    assert _tris(spark, k4) == [(1, 3, 5), (1, 3, 7), (1, 5, 7), (3, 5, 7)]


def test_triangles_star_no_wedges(spark):
    # star graphs are triangle-free; the degree orientation must also
    # keep the intermediate wedge set empty (every edge orients
    # leaf->hub, so no vertex has 2 out-neighbors)
    star = [(0, i) for i in range(1, 41)]
    assert _tris(spark, star) == []


def test_triangles_match_bruteforce(spark):
    import random

    rng = random.Random(11)
    nodes = list(range(30))
    pairs = [
        (a, b) for a, b in combinations(nodes, 2) if rng.random() < 0.15
    ]
    assert _tris(spark, pairs) == _brute(pairs)


def test_orientation_skew_bound_on_star(spark):
    # THE scale property: a hub with id 0 and degree d would own
    # C(d, 2) wedges under id orientation; under degree orientation
    # its in-degree is d and its OUT-degree is 0 — max out-degree
    # over the whole star is 1, so the wedge join's per-key fan-out
    # is bounded by the orientation, not by the hub
    star = [(0, i) for i in range(1, 41)]
    o = orient_edges(_edges_df(spark, star))
    outdeg = (
        o.groupBy("x").agg(F.count(F.lit(1)).alias("d")).agg(F.max("d"))
    ).collect()[0][0]
    assert outdeg == 1
    # and the hub is never an out-endpoint
    assert o.filter(F.col("x") == 0).count() == 0
