"""IVF-flat ANN tests: quantizer determinism, assignment tie rule,
JVM/batched parity, recall, and the k-means centroid plug-in."""

from __future__ import annotations

import hashlib

import numpy as np

from world_vaccination_coverage_etl_spark.operators.clustering import (
    kmeans_fit_predict,
)
from world_vaccination_coverage_etl_spark.operators.similarity import (
    adaptive_nlist,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    ivf_assign,
    ivf_assign_batched,
    sampled_centroids,
)


def _clustered(n_clusters=8, per_cluster=25, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + 0.15 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_adaptive_nlist_regimes():
    # certification corpora stay in the 16-cell regime the static SQL
    # reproduces; growth is n/target; the flat quantizer caps at 4096
    assert adaptive_nlist(500) == 16
    assert adaptive_nlist(2000) == 16
    assert adaptive_nlist(256 * 16) == 16
    assert adaptive_nlist(200_000) == 782
    assert adaptive_nlist(10**9) == 4096


def test_sampled_centroids_match_hashlib_ranking(spark):
    rows = _clustered(n_clusters=4, per_cluster=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=8)
    # recompute the md5 ranking engine-free: same ids, same order
    ranked = sorted(
        rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
    )[:8]
    by_vec = {tuple(v): i for i, v in rows}
    got_ids = [by_vec[tuple(v)] for _, v in cents]
    assert got_ids == [r[0] for r in ranked]
    assert [cid for cid, _ in cents] == list(range(8))


def test_assign_tie_breaks_to_lowest_cid(spark):
    rows = _clustered(n_clusters=2, per_cluster=5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c = [1.0] + [0.0] * 15
    # two identical centroids: every row's scores tie; both paths must
    # pick cid 0 (oracle rule: ORDER BY score DESC, cid)
    dup = [(0, c), (1, c)]
    for assign in (ivf_assign, ivf_assign_batched):
        got = assign(df, dup).select("list_id").distinct().collect()
        assert [r.list_id for r in got] == [0], assign.__name__


def test_batched_assignment_matches_jvm(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=16)
    jvm = {
        r.vec_id: r.list_id
        for r in ivf_assign(df, cents).select("vec_id", "list_id").collect()
    }
    batched = {
        r.vec_id: r.list_id
        for r in ivf_assign_batched(df, cents)
        .select("vec_id", "list_id")
        .collect()
    }
    assert jvm == batched


def test_ivf_probe_all_lists_is_exact(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    exact = [
        (r.vec_id, r.cosine)
        for r in cosine_topk_bruteforce(df, q, k=10, round_dp=6).collect()
    ]
    full_probe = [
        (r.vec_id, r.cosine)
        for r in cosine_topk_ivf(
            df, q, k=10, nlist=16, nprobe=16, round_dp=6
        ).collect()
    ]
    assert full_probe == exact


def test_ivf_recall_against_bruteforce(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    exact = {r.vec_id for r in cosine_topk_bruteforce(df, q, k=10).collect()}
    approx = {
        r.vec_id
        for r in cosine_topk_ivf(df, q, k=10, nlist=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall} below 0.8"


def test_kmeans_centroids_plug_in(spark):
    # trained (non-sampled) centroids use the same downstream: the
    # query's own cell is probed, so the query vector itself tops the
    # result with cosine 1.0
    rows = _clustered(n_clusters=4, per_cluster=20)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, cents = kmeans_fit_predict(df, k=4, n_iter=2)
    centroids = list(enumerate(cents))
    q = rows[0][1]
    got = cosine_topk_ivf(
        df, q, k=5, nprobe=2, round_dp=6, centroids=centroids
    ).collect()
    assert len(got) == 5
    assert got[0].vec_id == 0 and got[0].cosine == 1.0
    cos = [r.cosine for r in got]
    assert cos == sorted(cos, reverse=True)


def test_cell_occupancy_partitions_the_corpus(spark):
    # the inverted lists are a PARTITION of the corpus: counts sum to
    # n, every cid is in range, and the histogram matches a per-row
    # recount of the same assignment
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=16)
    assigned = ivf_assign(df, cents).select("vec_id", "list_id").collect()
    assert len(assigned) == len(rows)
    assert all(0 <= r.list_id < 16 for r in assigned)
    hist = {}
    for r in assigned:
        hist[r.list_id] = hist.get(r.list_id, 0) + 1
    counted = (
        ivf_assign(df, cents).groupBy("list_id").count().collect()
    )
    assert {r.list_id: r["count"] for r in counted} == hist


def test_ivf_materialized_index_prunes_probed_cells(spark, tmp_path):
    # the 100 TB posture claimed in the registry note: materialize the
    # assignment once partitioned by list_id and a probe becomes
    # PARTITION PRUNING — the unprobed cells' files are never opened
    from pyspark.sql import functions as F

    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=16)
    out = str(tmp_path / "ivf_index")
    ivf_assign(df, cents).write.partitionBy("list_id").parquet(out)

    probe = spark.read.parquet(out).filter(F.col("list_id").isin([3, 7]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "list_id" in plan.split("PartitionFilters")[1][:200]
    # and the pruned read is exactly the probed cells' rows
    full = {
        r.vec_id
        for r in ivf_assign(df, cents)
        .filter(F.col("list_id").isin([3, 7]))
        .collect()
    }
    assert {r.vec_id for r in probe.collect()} == full


def test_ivf_large_nlist_uses_batched_path(spark):
    # past IVF_JVM_NLIST_MAX the plan must not carry per-centroid
    # literal arrays: the assignment shows up as a single Arrow eval
    rows = _clustered(n_clusters=8, per_cluster=30, dim=8, seed=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=80)
    q = rows[0][1]
    out = cosine_topk_ivf(
        df, q, k=5, nprobe=8, round_dp=6, centroids=cents
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert len(out.collect()) == 5


# ---------------------------------------------------------------- #
# two-level (hierarchical) IVF


def test_two_level_layout_maps_every_cell_and_fixes_leaders(spark):
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        two_level_layout,
    )

    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=16)
    layout = two_level_layout(cents, n_groups=4)
    assert set(layout) == {cid for cid, _ in cents}
    assert set(layout.values()) <= {0, 1, 2, 3}
    # a leader's best-cosine leader is itself (cosine exactly 1.0)
    for lid in range(4):
        assert layout[lid] == lid


def test_ivf2_probe_everything_is_exact(spark):
    # with every group and every cell probed the candidate set is the
    # whole corpus (hierarchical assignment PARTITIONS it), so the
    # search degenerates to exact brute-force top-k
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        cosine_topk_ivf2,
    )

    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=16)
    q = rows[0][1]
    exact = [
        (r.vec_id, r.cosine)
        for r in cosine_topk_bruteforce(df, q, k=10, round_dp=6).collect()
    ]
    full = [
        (r.vec_id, r.cosine)
        for r in cosine_topk_ivf2(
            df, q, cents, n_groups=4, k=10,
            nprobe_groups=4, nprobe=16, round_dp=6,
        ).collect()
    ]
    assert full == exact


def test_ivf2_recall_against_bruteforce(spark):
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        cosine_topk_ivf2,
    )

    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    exact = {r.vec_id for r in cosine_topk_bruteforce(df, q, k=10).collect()}
    cents = sampled_centroids(df, nlist=16)
    approx = {
        r.vec_id
        for r in cosine_topk_ivf2(
            df, q, cents, n_groups=4, k=10, nprobe_groups=2, nprobe=4,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"two-level IVF recall {recall} below 0.6"


def test_ivf2_assignment_is_group_local_argmax(spark):
    # every row's cell must belong to the row's own best leader group
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        ivf2_assign_batched,
        two_level_layout,
    )

    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sampled_centroids(df, nlist=16)
    layout = two_level_layout(cents, n_groups=4)
    leaders = {cid: v for cid, v in cents[:4]}
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        _py_fold_cosine,
        _round_half_away,
    )

    got = {
        r.vec_id: r.list_id
        for r in ivf2_assign_batched(df, cents, n_groups=4)
        .select("vec_id", "list_id")
        .collect()
    }
    by_id = dict(rows)
    for vid, cell in got.items():
        v = by_id[vid]
        best_leader = min(
            (-_round_half_away(_py_fold_cosine(v, lv), 6), lid)
            for lid, lv in leaders.items()
        )[1]
        assert layout[cell] == best_leader, (vid, cell)


def test_ivf2_empty_leader_group_gets_sentinel(spark):
    """r11 ADVICE (medium): two nearly-identical leaders make the
    layout remap the later leader's own cell to the earlier one
    (rounded cosine tie at 1.0), leaving the later group EMPTY; a row
    that still argmaxes to that later leader must come out as
    list_id = -1 (the oracle's drop semantics), never as a silent
    lowest-cell-id np.argmax artifact."""
    import math

    from world_vaccination_coverage_etl_spark.operators.similarity import (
        ivf2_assign_batched,
        two_level_layout,
    )

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    # leaders 1e-3 rad apart: cos = 1 - 5e-7 rounds to 1.0 at 6 dp;
    # the third cell sits at -0.5 rad, strictly closer to leader 0
    cents = [(0, unit(0.0)), (1, unit(1e-3)), (2, unit(-0.5))]
    layout = two_level_layout(cents, n_groups=2, round_dp=6)
    assert layout[1] == 0  # leader 1's own cell remapped -> group empty
    assert all(lid != 1 for lid in layout.values())

    # a row past leader 1: strictly closer to it than to leader 0 at
    # 6 dp (cos gap ~2e-6 > rounding quantum)
    rows = [(0, unit(2.5e-3)), (1, unit(0.0)), (2, unit(-0.5))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r.vec_id: r.list_id
        for r in ivf2_assign_batched(df, cents, n_groups=2).collect()
    }
    assert got[0] == -1  # empty-group row: sentinel, not cell 0
    assert got[1] == 0 and got[2] == 2  # healthy rows unaffected


def test_pq_adc_topk_rejects_noncontiguous_codebook(spark):
    import pytest as _pytest

    from world_vaccination_coverage_etl_spark.operators.similarity import (
        pq_adc_topk,
    )

    df = spark.createDataFrame(
        [(0, [0.0] * 16)], ["vec_id", "embedding"]
    )
    bad = [(0, [0.1] * 16), (2, [0.2] * 16)]  # gap: no code 1
    with _pytest.raises(ValueError, match="contiguous"):
        pq_adc_topk(df, [0.0] * 16, bad, k=1, m=8)


def test_pq_adc_topk_codes_col_reuses_prebuilt_codes(spark):
    """codes_col passthrough: identical ranking to the inline re-encode,
    and the plan never evaluates the encode UDF on the vector column."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode_batched,
        sampled_centroids,
    )

    rows, _ = (lambda r: (r, None))(
        [
            (i, list(np.random.default_rng(i).standard_normal(16)))
            for i in range(40)
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )
    sample = sampled_centroids(df, nlist=4)
    q = [float(x) for x in np.random.default_rng(99).standard_normal(16)]
    inline = pq_adc_topk(df, q, sample, k=5, m=8).collect()
    prebuilt = pq_encode_batched(df, sample, m=8).drop("embedding")
    reused = pq_adc_topk(
        prebuilt, q, sample, k=5, m=8, codes_col="codes"
    ).collect()
    assert [(r.vec_id, r.adc_dist) for r in inline] == [
        (r.vec_id, r.adc_dist) for r in reused
    ]


def test_pq_adc_topk_codes_col_wrong_m_fails_loud(spark):
    import pytest as _pytest

    from world_vaccination_coverage_etl_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode_batched,
        sampled_centroids,
    )

    rows = [(i, [float(x) for x in np.random.default_rng(i).standard_normal(16)])
            for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sample = sampled_centroids(df, nlist=4)
    pre = pq_encode_batched(df, sample, m=4).drop("embedding")  # 4 codes/row
    q = [0.0] * 16
    with _pytest.raises(Exception, match="expected m=8"):
        pq_adc_topk(pre, q, sample, k=3, m=8, codes_col="codes").collect()
