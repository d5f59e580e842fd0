"""Statistical-kernel edge cases under Spark 4 ANSI mode.

Regression (ADVICE r1): a constant series (zero variance in both
windows) must yield NULL t/dof like scipy's NaN — not abort the job
with an ANSI DIVIDE_BY_ZERO.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.functions.stats import (
    mean_ci_columns,
    welch_t_columns,
)


def _agg(spark, values_a, values_b):
    rows = [("a", float(v)) for v in values_a] + [("b", float(v)) for v in values_b]
    df = spark.createDataFrame(rows, "w string, v double")
    return df.groupBy().agg(
        F.avg(F.when(F.col("w") == "a", F.col("v"))).alias("mean_a"),
        F.var_samp(F.when(F.col("w") == "a", F.col("v"))).alias("var_a"),
        F.count(F.when(F.col("w") == "a", F.col("v"))).alias("n_a"),
        F.avg(F.when(F.col("w") == "b", F.col("v"))).alias("mean_b"),
        F.var_samp(F.when(F.col("w") == "b", F.col("v"))).alias("var_b"),
        F.count(F.when(F.col("w") == "b", F.col("v"))).alias("n_b"),
    )


def _welch(spark, a, b):
    agg = _agg(spark, a, b)
    t, dof = welch_t_columns(
        F.col("mean_a"), F.col("var_a"), F.col("n_a"),
        F.col("mean_b"), F.col("var_b"), F.col("n_b"),
    )
    return agg.select(t.alias("t"), dof.alias("dof")).first()


def test_welch_constant_series_null_not_crash(spark):
    row = _welch(spark, [99.0, 99.0, 99.0], [99.0, 99.0, 99.0])
    assert row.t is None and row.dof is None


def test_welch_single_sample_gated(spark):
    row = _welch(spark, [1.0], [2.0, 3.0, 4.0])
    assert row.t is None and row.dof is None


def test_welch_matches_scipy_closed_form(spark):
    a, b = [1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0, 8.0, 10.0]
    row = _welch(spark, a, b)
    # reference values: scipy.stats.ttest_ind(a, b, equal_var=False)
    # gives t = -2.2514363, Welch–Satterthwaite dof = 5.5207877
    assert abs(row.t - (-2.2514363231593695)) < 1e-9
    assert abs(row.dof - 5.520787746170677) < 1e-9


def test_mean_ci_n1_is_null(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    agg = df.groupBy().agg(
        F.avg("v").alias("m"), F.stddev_samp("v").alias("s"), F.count("*").alias("n")
    )
    lo, hi = mean_ci_columns(F.col("m"), F.col("s"), F.col("n"))
    row = agg.select(lo.alias("lo"), hi.alias("hi")).first()
    assert row.lo is None and row.hi is None


def test_normal_p_brackets_t_p_kernelwise():
    """The certified-query gate rests on 0 <= p_t - p_normal <= 3/df
    (df >= 5): re-assert it directly against the kernels."""
    import math

    import numpy as np

    from world_vaccination_coverage_etl_spark.functions.tdist import t_sf

    t = np.linspace(0.0, 40.0, 2001)
    erf = np.vectorize(math.erf, otypes=[np.float64])
    p_normal = 1.0 - erf(t / math.sqrt(2.0))
    for df in (5.0, 12.0, 47.0, 300.0, 2999.0):
        p_t = 2.0 * t_sf(t, np.full_like(t, df))
        gap = p_t - p_normal
        assert gap.min() >= -1e-12
        assert gap.max() <= 3.0 / df


def test_t_crit_z_bracket_kernelwise():
    """CI gate bound: z <= t_crit(0.975, df) <= z + 5/df for df >= 5."""
    import numpy as np

    from world_vaccination_coverage_etl_spark.functions.tdist import t_ppf

    z = 1.9599639845400545
    df = np.array([5.0, 9.0, 29.0, 100.0, 999.0, 29999.0])
    tc = t_ppf(np.full_like(df, 0.975), df)
    assert (tc >= z).all()
    assert (tc <= z + 5.0 / df).all()
