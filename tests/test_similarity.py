"""Similarity-search tests: brute-force correctness + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from world_vaccination_coverage_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    knn_all_pairs_bruteforce,
)


def _clustered(n_clusters=8, per_cluster=25, dim=16, seed=7):
    """Synthetic clustered vectors: LSH has real near neighbors to find."""
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


def test_bruteforce_topk_matches_numpy(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    got = [r.vec_id for r in cosine_topk_bruteforce(df, q, k=10).collect()]

    V = np.array([r[1] for r in rows])
    qv = np.array(q)
    sims = (V @ qv) / (np.linalg.norm(V, axis=1) * np.linalg.norm(qv))
    # numpy ground truth with the same (-cosine, id) tiebreak
    expect = [int(i) for i in sorted(range(len(rows)), key=lambda i: (-sims[i], i))[:10]]
    assert got == expect


def test_lsh_recall_against_bruteforce(spark):
    rows = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    exact = {r.vec_id for r in cosine_topk_bruteforce(df, q, k=10).collect()}
    approx = {
        r.vec_id
        for r in cosine_topk_lsh(df, q, k=10, bits=6, probe_hamming=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall} below 0.9"


def test_knn_allpairs_shape_and_selfpair_exclusion(spark):
    rows = _clustered(n_clusters=3, per_cluster=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_all_pairs_bruteforce(df, k=3).collect()
    assert len(out) == len(rows) * 3
    for r in out:
        assert r.src_id != r.nbr_id
        assert 1 <= r.rank <= 3


def test_knn_neighbors_share_cluster(spark):
    rows = _clustered(n_clusters=4, per_cluster=15)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_all_pairs_bruteforce(df, k=3).collect()
    same_cluster = sum(1 for r in out if r.src_id // 15 == r.nbr_id // 15)
    assert same_cluster / len(out) > 0.95


def test_knn_within_blocks_matches_bruteforce_per_block(spark):
    """The Arrow per-block kernel must reproduce the bruteforce operator
    restricted to the same blocks (cosines compared at the kernel's own
    6-dp rounding)."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        knn_within_blocks,
    )

    rows = _clustered(n_clusters=4, per_cluster=20)
    blocked = [(vid, v, vid % 3) for vid, v in rows]
    df = spark.createDataFrame(
        blocked, "vec_id long, embedding array<double>, block int"
    )
    got = {
        (r.src_id, r.rank): (r.nbr_id, r.cosine)
        for r in knn_within_blocks(df, k=4, block_col="block").collect()
    }
    ref = {
        (r.src_id, r.rank): (r.nbr_id, round(r.cosine, 6))
        for r in knn_all_pairs_bruteforce(df, k=4, block_col="block").collect()
    }
    assert set(got) == set(ref)
    for key, (nbr, cos) in ref.items():
        g_nbr, g_cos = got[key]
        assert g_cos == pytest.approx(cos, abs=2e-6)
        # ids may legitimately differ only on a rounded-cosine tie
        if g_nbr != nbr:
            assert g_cos == pytest.approx(cos, abs=2e-6)


def test_knn_within_blocks_zero_vector_and_singleton(spark):
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0], 0),   # zero vector: cosine 0.0 to everyone
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [1.0, 1.0], 9),   # singleton block: emits nothing
        ],
        "vec_id long, embedding array<double>, block int",
    )
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        knn_within_blocks,
    )

    out = knn_within_blocks(df, k=2, block_col="block").collect()
    assert {r.src_id for r in out} == {0, 1, 2}
    zero_rows = [r for r in out if r.src_id == 0]
    assert all(r.cosine == 0.0 for r in zero_rows)
    top1 = {r.src_id: r.nbr_id for r in out if r.rank == 1}
    assert top1[1] == 2 and top1[2] == 1


def test_lsh_bucket_batched_matches_jvm_expression(spark):
    """The Arrow bucket kernel must assign every vector to the same
    bucket as the Catalyst lsh_bucket expression (same plane draw)."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        lsh_bucket,
        lsh_bucket_batched,
    )
    from pyspark.sql import functions as F

    rows = _clustered(n_clusters=6, per_cluster=15, dim=12)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = df.select(
        "vec_id",
        lsh_bucket(F.col("embedding"), dim=12, bits=5, seed=3).alias("jvm"),
        lsh_bucket_batched(F.col("embedding"), dim=12, bits=5, seed=3).alias("arrow"),
    ).collect()
    assert all(r.jvm == r.arrow for r in out)


def test_hard_negatives_respects_label_and_ceiling(spark):
    import numpy as np

    from world_vaccination_coverage_etl_spark.operators.similarity import (
        hard_negatives_within_blocks,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    rows = []
    base = rng.standard_normal((4, 8))
    for i in range(80):
        lab = i % 4
        v = base[lab] + 0.3 * rng.standard_normal(8)
        rows.append((i, lab, [float(x) for x in v]))
    # vec 80 duplicates vec 0 but with a different label: the pair's
    # cosine ~1.0 must be EXCLUDED by the dup ceiling
    rows.append((80, 1, [float(x) for x in base[0]]))
    rows.append((81, 0, [float(x) for x in base[0]]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    ).withColumn("block", F.lit(0))
    out = hard_negatives_within_blocks(
        df, k=3, block_col="block", dup_ceiling=0.95
    ).collect()
    labels = {i: i % 4 for i in range(80)}
    labels[80], labels[81] = 1, 0
    for r in out:
        assert labels[r.src_id] != labels[r.nbr_id], (r.src_id, r.nbr_id)
        assert r.cosine <= 0.95 + 1e-12
    # the cross-label duplicate pair (80, 81) must not be mined
    pairs = {(r.src_id, r.nbr_id) for r in out}
    assert (81, 80) not in pairs and (80, 81) not in pairs
    # every source with any eligible candidate appears
    assert len({r.src_id for r in out}) >= 75


def test_adaptive_lsh_bits_occupancy_contract():
    """Bucket bits must grow with log2(n/target) so expected occupancy
    stays bounded as the corpus scales (fixed bits measured 425x time
    on a 100x input), while the certification regime (<=16k rows at
    target 1024) keeps the 4-bit blocks the static oracles reproduce."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        adaptive_lsh_bits,
    )

    # certification regime: floor holds through 16k rows
    for n in (0, 1, 200, 2000, 16 * 1024):
        assert adaptive_lsh_bits(n) == 4
    # scale regime: occupancy n/2^bits stays within [target/2, target]
    for n in (10**5, 2 * 10**5, 10**6, 10**7, 10**8 // 2):
        bits = adaptive_lsh_bits(n)
        assert n / (1 << bits) <= 1024
        assert n / (1 << bits) > 256
    # ceiling caps the bucket count
    assert adaptive_lsh_bits(10**12) == 16
    # monotone in n
    vals = [adaptive_lsh_bits(n) for n in range(1, 10**6, 7919)]
    assert vals == sorted(vals)


def test_knn_kernel_chunking_exact(spark):
    """The row-chunked matmul (the skew-bucket OOM guard) must be
    result-identical to the single-chunk path: chunk_rows=16 forces a
    90-row block through 6 chunk boundaries, including diagonal masking
    at non-zero chunk offsets."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        knn_within_blocks,
    )

    rows = _clustered(n_clusters=3, per_cluster=30, dim=8, seed=11)
    df = spark.createDataFrame(
        [(vid, v, 0) for vid, v in rows],
        "vec_id long, embedding array<double>, block int",
    )
    chunked = knn_within_blocks(
        df, k=3, block_col="block", chunk_rows=16
    ).collect()
    whole = knn_within_blocks(
        df, k=3, block_col="block", chunk_rows=10**6
    ).collect()
    key = lambda r: (r.src_id, r.rank, r.nbr_id, r.cosine)  # noqa: E731
    assert sorted(map(key, chunked)) == sorted(map(key, whole))
    assert len(chunked) == 90 * 3


def test_hard_negatives_kernel_chunking_exact(spark):
    """Chunk-boundary parity for the hard-negative miner (ADVICE r6):
    its same-label slice and dup-ceiling mask index at non-zero chunk
    offsets, so chunk_rows=16 through a 90-row block must reproduce the
    single-chunk result exactly."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        hard_negatives_within_blocks,
    )

    rows = _clustered(n_clusters=3, per_cluster=30, dim=8, seed=13)
    df = spark.createDataFrame(
        [(vid, v, vid % 4, 0) for vid, v in rows],
        "vec_id long, embedding array<double>, label int, block int",
    )
    chunked = hard_negatives_within_blocks(
        df, k=3, block_col="block", chunk_rows=16
    ).collect()
    whole = hard_negatives_within_blocks(
        df, k=3, block_col="block", chunk_rows=10**6
    ).collect()
    key = lambda r: (r.src_id, r.rank, r.nbr_id, r.cosine)  # noqa: E731
    assert sorted(map(key, chunked)) == sorted(map(key, whole))
    assert chunked  # degenerate-test guard
    # constraints hold under chunking: no same-label, none above ceiling
    labels = {vid: vid % 4 for vid, _ in rows}
    assert all(labels[r.src_id] != labels[r.nbr_id] for r in chunked)
    assert all(r.cosine <= 0.95 for r in chunked)
