"""two_phase_ranks / two_phase_ntile == the single-window forms, on
adversarial inputs (heavy ties at quantile boundaries, descending
orders, per-partition skew, fused multi-spec), plus the scale pin:
no unpartitioned WindowExec in the physical plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.operators.ranks import (
    RankSpec,
    two_phase_ntile,
    two_phase_ranks,
)

def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _heavy_tied(spark):
    # 60% of rows share v=5 (a guaranteed quantile-boundary value),
    # the rest spread over 0..99; unique numeric tiebreak.
    rows = [(5.0 if i % 5 < 3 else float(i % 100), i) for i in range(2000)]
    return _df(spark, rows, ["v", "tid"])


@pytest.mark.parametrize("desc", [False, True])
def test_rank_matches_window_heavy_ties(spark, desc):
    df = _heavy_tied(spark)
    spec = RankSpec("v", "tid", out_col="r", value_desc=desc)
    got, totals = two_phase_ranks(df, [spec], num_buckets=8)
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("tid").asc()]
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert totals[()] == 2000
    assert (
        got.select("tid", "r")
        .exceptAll(want.select("tid", "r"))
        .isEmpty()
    )


def test_rank_bucket_window_is_partitioned(spark):
    df = _heavy_tied(spark)
    got, _ = two_phase_ranks(df, [RankSpec("v", "tid", out_col="r")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # every WindowExec line carries a non-empty partition spec: the
    # bucket expression shows up as a hash partitioning key, never the
    # empty SinglePartition that the naive global window produces.
    assert "SinglePartition" not in plan


@pytest.mark.parametrize("k,n_rows", [(4, 103), (10, 2000), (7, 5)])
def test_ntile_matches_window(spark, k, n_rows):
    rows = [(float(i % 13), i) for i in range(n_rows)]
    df = _df(spark, rows, ["v", "tid"])
    got = two_phase_ntile(
        df, k, RankSpec("v", "tid", value_desc=True), out_col="nt", num_buckets=4
    )
    w = Window.orderBy(F.col("v").desc(), F.col("tid").asc())
    want = df.withColumn("nt", F.ntile(k).over(w))
    assert (
        got.select("tid", "nt").exceptAll(want.select("tid", "nt")).isEmpty()
    )


def test_ntile_partitioned_skew(spark):
    # one partition holds 90% of rows; heavy value ties inside it.
    rows = []
    for i in range(1800):
        rows.append(("big", float(7 if i % 3 else i % 50), i))
    for i in range(200):
        rows.append(("small", float(i % 9), 10000 + i))
    df = _df(spark, rows, ["lang", "v", "tid"])
    got = two_phase_ntile(
        df,
        4,
        RankSpec("v", "tid"),
        partition_cols=["lang"],
        out_col="nt",
        num_buckets=8,
    )
    w = Window.partitionBy("lang").orderBy("v", "tid")
    want = df.withColumn("nt", F.ntile(4).over(w))
    assert (
        got.select("tid", "nt").exceptAll(want.select("tid", "nt")).isEmpty()
    )


def test_fused_multi_spec_matches_three_windows(spark):
    rows = [
        (i, float(i % 17), float((i * 7) % 23), float(i % 5))
        for i in range(500)
    ]
    df = _df(spark, rows, ["uid", "a", "b", "c"])
    specs = [
        RankSpec("a", "uid", out_col="ra"),
        RankSpec("b", "uid", out_col="rb", value_desc=True),
        RankSpec("c", "uid", out_col="rc", value_desc=True),
    ]
    got, totals = two_phase_ranks(df, specs, num_buckets=4)
    want = df
    for col, vdesc, out in [("a", False, "ra"), ("b", True, "rb"), ("c", True, "rc")]:
        order = [F.col(col).desc() if vdesc else F.col(col).asc(), F.col("uid").asc()]
        want = want.withColumn(out, F.row_number().over(Window.orderBy(*order)))
    assert totals[()] == 500
    assert (
        got.select("uid", "ra", "rb", "rc")
        .exceptAll(want.select("uid", "ra", "rb", "rc"))
        .isEmpty()
    )


def test_tie_permute_is_valid_permutation(spark):
    # string tiebreak, massive tie group: ranks within each value group
    # must be exactly the group's consecutive global-rank range (in some
    # order), and all ranks a permutation of 1..N.
    rows = [(1.0 if i % 2 else float(i % 10 + 2), f"w{i:05d}") for i in range(3000)]
    df = _df(spark, rows, ["f", "w"])
    spec = RankSpec(
        "f",
        "w",
        out_col="r",
        value_desc=True,
        tie_permute=True,
        value_bounds=list(range(1, 13)),
        num_sub=8,
    )
    got, totals = two_phase_ranks(df, [spec])
    rows_out = got.select("f", "r").collect()
    assert totals[()] == 3000
    ranks = sorted(r["r"] for r in rows_out)
    assert ranks == list(range(1, 3001))
    # group ranges: for each f (desc), its ranks occupy a contiguous block
    by_f = {}
    for r in rows_out:
        by_f.setdefault(r["f"], []).append(r["r"])
    start = 1
    for f in sorted(by_f, reverse=True):
        grp = sorted(by_f[f])
        assert grp == list(range(start, start + len(grp)))
        start += len(grp)


def test_static_bounds_skip_stats_job(spark):
    # all-static spec: pass 1 must not run (no percentile agg needed);
    # output still exact.
    rows = [(float(i % 4 + 1), i) for i in range(100)]
    df = _df(spark, rows, ["f", "tid"])
    spec = RankSpec(
        "f",
        "tid",
        out_col="r",
        value_desc=True,
        tie_permute=True,
        value_bounds=[1, 2, 3, 4, 5],
    )
    got, totals = two_phase_ranks(df, [spec])
    assert totals[()] == 100
    ranks = sorted(r["r"] for r in got.collect())
    assert ranks == list(range(1, 101))


def test_cumsum_matches_window(spark):
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_cumsum,
    )

    rows = [(float(i % 37), i, float((i * 13) % 7 + 1)) for i in range(1500)]
    df = _df(spark, rows, ["v", "tid", "wt"])
    got = two_phase_cumsum(
        df, RankSpec("v", "tid", value_desc=True), "wt", out_col="c",
        num_buckets=8,
    )
    w = (
        Window.orderBy(F.col("v").desc(), F.col("tid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("c", F.sum("wt").over(w))
    assert (
        got.select("tid", "c").exceptAll(want.select("tid", "c")).isEmpty()
    )


def test_cumsum_exclusive_and_plan(spark):
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_cumsum,
    )

    rows = [(float(i % 11), i, 2.0) for i in range(400)]
    df = _df(spark, rows, ["v", "tid", "wt"])
    got = two_phase_cumsum(
        df, RankSpec("v", "tid"), "wt", out_col="c", inclusive=False
    )
    w = (
        Window.orderBy("v", "tid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("c", F.sum("wt").over(w) - F.col("wt"))
    assert (
        got.select("tid", "c").exceptAll(want.select("tid", "c")).isEmpty()
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_cumsum_tie_permute_multiset_invariance(spark):
    """String tiebreak + heavy ties: per-row before-masses within each
    tie group must be exactly the group's arithmetic progression (in
    some order) — the invariance the Pareto coverage counts rely on."""
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_cumsum,
    )

    rows = [
        (1.0 if i % 2 else float(i % 8 + 2), f"w{i:05d}") for i in range(2000)
    ]
    df = _df(spark, rows, ["f", "w"])
    spec = RankSpec(
        "f",
        "w",
        value_desc=True,
        tie_permute=True,
        value_bounds=list(range(1, 11)),
        num_sub=8,
    )
    got = two_phase_cumsum(df, spec, "f", out_col="c", inclusive=False)
    out = got.select("f", "c").collect()
    by_f = {}
    for r in out:
        by_f.setdefault(r["f"], []).append(r["c"])
    start = 0.0
    for f in sorted(by_f, reverse=True):
        vals = sorted(by_f[f])
        m = len(vals)
        assert vals == [start + k * f for k in range(m)], f
        start += m * f


@pytest.mark.parametrize("seed", [3, 17, 42, 99])
def test_randomized_differential_vs_window(spark, seed):
    """Seeded-random differential: random value distributions (heavy
    ties included), random weights, both directions, random bucket
    counts — two-phase rank/ntile/cumsum must equal the single-window
    forms row for row."""
    import random

    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_cumsum,
    )

    rng = random.Random(seed)
    n = rng.randint(50, 800)
    vals = [float(rng.choice([rng.randint(0, 8), rng.randint(0, 10**6)]))
            for _ in range(n)]
    rows = [(vals[i], i, float(rng.randint(1, 9))) for i in range(n)]
    df = _df(spark, rows, ["v", "tid", "wt"])
    desc = bool(rng.getrandbits(1))
    k = rng.randint(2, 9)
    b = rng.choice([2, 4, 8, 16])
    spec = RankSpec("v", "tid", out_col="r", value_desc=desc)
    order = [F.col("v").desc() if desc else F.col("v").asc(),
             F.col("tid").asc()]

    got, totals = two_phase_ranks(df, [spec], num_buckets=b)
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert totals[()] == n
    assert got.select("tid", "r").exceptAll(want.select("tid", "r")).isEmpty()

    gnt = two_phase_ntile(df, k, spec, out_col="nt", num_buckets=b)
    wnt = df.withColumn("nt", F.ntile(k).over(Window.orderBy(*order)))
    assert (
        gnt.select("tid", "nt").exceptAll(wnt.select("tid", "nt")).isEmpty()
    )

    gc = two_phase_cumsum(df, spec, "wt", out_col="c", num_buckets=b)
    wc = df.withColumn(
        "c",
        F.sum("wt").over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    assert gc.select("tid", "c").exceptAll(wc.select("tid", "c")).isEmpty()


def test_empty_input_all_modes(spark):
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_cumsum,
    )

    df = spark.createDataFrame([], "v double, tid long, wt double, p string")
    got, totals = two_phase_ranks(df, [RankSpec("v", "tid", out_col="r")])
    assert got.count() == 0 and totals == {(): 0}
    gp = two_phase_ntile(
        df, 4, RankSpec("v", "tid"), partition_cols=["p"], out_col="nt"
    )
    assert gp.count() == 0
    gc = two_phase_cumsum(df, RankSpec("v", "tid"), "wt", out_col="c")
    assert gc.count() == 0


def test_partitioned_null_and_weird_keys(spark):
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_ntile,
    )

    rows = [("en" if i % 3 == 0 else (None if i % 3 == 1 else "d'e"),
             float(i % 13), i) for i in range(300)]
    df = spark.createDataFrame(rows, ["lang", "v", "tid"])
    got = two_phase_ntile(
        df, 4, RankSpec("v", "tid"), partition_cols=["lang"], out_col="nt"
    )
    w = Window.partitionBy("lang").orderBy("v", "tid")
    want = df.withColumn("nt", F.ntile(4).over(w))
    assert (
        got.select("tid", "nt").exceptAll(want.select("tid", "nt")).isEmpty()
    )


def test_partitioned_rejects_float_keys(spark):
    df = spark.createDataFrame(
        [(1.5, 2.0, 1), (2.5, 3.0, 2)], ["p", "v", "tid"]
    )
    with pytest.raises(TypeError, match="string/int/NULL"):
        two_phase_ranks(df, [RankSpec("v", "tid")], partition_cols=["p"])


def test_partitioned_rejects_bool_keys(spark):
    # bool is an int subclass, but str(True)='True' while Spark's
    # string cast yields 'true' — the broadcast key would silently
    # miss; the guard must reject it loudly (r12 ADVICE, medium).
    df = spark.createDataFrame(
        [(True, 2.0, 1), (False, 3.0, 2)], ["p", "v", "tid"]
    )
    with pytest.raises(TypeError, match="bool.*string/int/NULL"):
        two_phase_ranks(df, [RankSpec("v", "tid")], partition_cols=["p"])


def test_partitioned_separator_keys_do_not_collide(spark):
    """Adversarial partition values: with two partition columns, the
    tuples ('a\\x1fb', 'c') and ('a', 'b\\x1fc') concatenate to the
    same unescaped key, and a value equal to the NULL sentinel would
    alias an actual NULL — component escaping must keep all of them
    distinct (r12 ADVICE)."""
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_ntile,
    )

    parts = [("a\x1fb", "c"), ("a", "b\x1fc"), ("\x00NULL", "c"),
             (None, "c"), ("a\x1b", "_b"), ("a", "\x1b_b")]
    rows = []
    for j, (p1, p2) in enumerate(parts):
        for i in range(40):
            rows.append((p1, p2, float(i % 7), j * 1000 + i))
    df = spark.createDataFrame(rows, ["p1", "p2", "v", "tid"])
    got = two_phase_ntile(
        df, 4, RankSpec("v", "tid"), partition_cols=["p1", "p2"],
        out_col="nt",
    )
    w = Window.partitionBy("p1", "p2").orderBy("v", "tid")
    want = df.withColumn("nt", F.ntile(4).over(w))
    assert (
        got.select("tid", "nt").exceptAll(want.select("tid", "nt")).isEmpty()
    )


def test_partition_cardinality_ceiling(spark):
    """At MAX_PART_VALUES partitions the CASE-chain plan must build,
    codegen, and produce exact results; one more partition value must
    be rejected loudly (r12 verdict hardening #1)."""
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        MAX_PART_VALUES,
    )

    rows = [
        (f"p{j:03d}", float((i * 7 + j) % 11), j * 100 + i)
        for j in range(MAX_PART_VALUES)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["p", "v", "tid"])
    got, _ = two_phase_ranks(
        df, [RankSpec("v", "tid", out_col="r")], partition_cols=["p"],
        num_buckets=16,
    )
    w = Window.partitionBy("p").orderBy("v", "tid")
    want = df.withColumn("r", F.row_number().over(w).cast("long"))
    assert got.select("tid", "r").exceptAll(want.select("tid", "r")).isEmpty()

    over = df.unionAll(
        spark.createDataFrame([("p_overflow", 1.0, 999999)], df.columns)
    )
    with pytest.raises(ValueError, match="ceiling"):
        two_phase_ranks(over, [RankSpec("v", "tid")], partition_cols=["p"])


def test_non_numeric_tiebreak_requires_tie_permute(spark):
    df = spark.createDataFrame(
        [(1.0, "wa"), (2.0, "wb")], ["v", "w"]
    )
    with pytest.raises(TypeError, match="tie_permute=True"):
        two_phase_ranks(df, [RankSpec("v", "w")])
    # permute path accepts the same spec
    got, totals = two_phase_ranks(
        df, [RankSpec("v", "w", out_col="r", tie_permute=True)]
    )
    assert totals[()] == 2 and sorted(
        r["r"] for r in got.collect()
    ) == [1, 2]


def test_non_numeric_value_col_rejected(spark):
    df = spark.createDataFrame([("x", 1), ("y", 2)], ["v", "tid"])
    with pytest.raises(TypeError, match="value_col"):
        two_phase_ranks(df, [RankSpec("v", "tid")])


def test_cumsum_weight_kind_contract(spark):
    """Default weight_kind='count' must reject fractional weights
    loudly (the double accumulator is only exact for integer-valued
    weights); weight_kind='fractional' opts in and matches the window
    form up to fp tolerance (r12 verdict hardening #2)."""
    from world_vaccination_coverage_etl_spark.operators.ranks import (
        two_phase_cumsum,
    )

    rows = [(float(i % 9), i, 0.25 + (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, ["v", "tid", "wt"])
    with pytest.raises(ValueError, match="fractional"):
        two_phase_cumsum(df, RankSpec("v", "tid"), "wt", out_col="c")

    got = two_phase_cumsum(
        df, RankSpec("v", "tid"), "wt", out_col="c",
        weight_kind="fractional",
    )
    w = (
        Window.orderBy("v", "tid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("c", F.sum("wt").over(w))
    joined = (
        got.select("tid", F.col("c").alias("got_c"))
        .join(want.select("tid", F.col("c").alias("want_c")), "tid")
        .withColumn("diff", F.abs(F.col("got_c") - F.col("want_c")))
    )
    assert joined.agg(F.max("diff")).collect()[0][0] < 1e-9

    with pytest.raises(ValueError, match="weight_kind"):
        two_phase_cumsum(
            df, RankSpec("v", "tid"), "wt", out_col="c", weight_kind="bogus"
        )
