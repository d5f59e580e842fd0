"""SURVEY §2.5 aggregations; §2.7 sorts / limits / top-k.

Split from the former single-file queries.py (r5 verdict item 8);
registration order is preserved by the package __init__ import order.
"""

from ._core import *  # noqa: F401,F403

# --------------------------------------------------------------------- #
# §2.5 aggregations


@register(
    "agg_mean",
    """
    SELECT l_returnflag, l_linestatus,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    note="grouped sample mean (SURVEY §2.5 agg_mean; reference etl_pipeline.py:143-144)",
)
def q_agg_mean(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_extremes",
    """
    SELECT l_returnflag,
           CAST(min(year(l_shipdate)) AS INT) AS min_year,
           CAST(max(year(l_shipdate)) AS INT) AS max_year,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    note="min/max/count KPIs (SURVEY §2.5 agg_extremes; reference streamlit_app.py:201-203)",
)
def q_agg_extremes(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min(F.year("l_shipdate")).alias("min_year"),
            F.max(F.year("l_shipdate")).alias("max_year"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_first_last",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderdate, o_orderkey) AS rn_asc,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_desc
      FROM orders)
    SELECT o_orderpriority,
           round(max(CASE WHEN rn_asc = 1 THEN o_totalprice END), 2) AS earliest_price,
           round(max(CASE WHEN rn_desc = 1 THEN o_totalprice END), 2) AS latest_price,
           round(max(CASE WHEN rn_desc = 1 THEN o_totalprice END)
                 - max(CASE WHEN rn_asc = 1 THEN o_totalprice END), 2) AS delta
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    note="first/last by time order with full tiebreak (SURVEY §2.5 agg_first_last; reference streamlit_app.py:199-202)",
)
def q_agg_first_last(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    order_key = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    earliest = F.min_by("o_totalprice", order_key)
    latest = F.max_by("o_totalprice", order_key)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(earliest, 2).alias("earliest_price"),
            F.round(latest, 2).alias("latest_price"),
            F.round(latest - earliest, 2).alias("delta"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_sem_ci",
    """
    SELECT o_orderpriority,
           round(avg(o_totalprice), 6) AS mean_price,
           round(stddev_samp(o_totalprice), 6) AS sd_price,
           CAST(count(*) AS BIGINT) AS n,
           round(stddev_samp(o_totalprice) / sqrt(count(*)), 6) AS sem
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    note="mean/SEM aggregates feeding the CI kernel (SURVEY §2.5 agg_sem_ci; reference etl_pipeline.py:37-43)",
)
def q_agg_sem_ci(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 6).alias("mean_price"),
            F.round(F.stddev_samp("o_totalprice"), 6).alias("sd_price"),
            F.count("*").alias("n"),
            F.round(
                F.stddev_samp("o_totalprice") / F.sqrt(F.count("*")), 6
            ).alias("sem"),
        )
        .orderBy("o_orderpriority")
    )


# two-sided 97.5% normal quantile: the df->inf limit of the t critical
# value, and its strict lower bound for every finite df.  Shared by the
# gate-certified CI and Welch-p queries below.
Z_975 = 1.9599639845400545


@register(
    "agg_mean_ci_t",
    """
    SELECT o_orderpriority,
           round(avg(o_totalprice), 6) AS mean_price,
           CAST(count(*) AS BIGINT) AS n,
           round(stddev_samp(o_totalprice) / sqrt(count(*)), 6) AS sem,
           true AS ci_brackets_mean,
           true AS ci_halfwidth_ok
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    note="t-quantile CI, hash-certified via the approx-gate pattern: mean/n/sem are "
    "SQL-checked values; the CI bounds (numpy t_ppf kernel, operators/../tdist.py) are "
    "certified through in-plan booleans the oracle asserts literally — the CI must "
    "bracket the mean, and the half-width sem*t_crit must satisfy "
    "z <= t_crit <= z + 5/df (bound validated vs the kernel for df>=5; "
    "raw-bound numeric fidelity is pinned by scipy-golden tests in tests/test_stats.py)",
)
def q_agg_mean_ci_t(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    aggregated = o.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("mean_price"),
        F.stddev_samp("o_totalprice").alias("sd_price"),
        F.count("*").alias("n"),
    )
    lo, hi = mean_ci_columns(
        F.col("mean_price"), F.col("sd_price"), F.col("n"), conf=0.95
    )
    sem = F.col("sd_price") / F.sqrt(F.col("n"))
    half = (hi - lo) / F.lit(2.0)
    dof = (F.col("n") - 1).cast("double")
    # t_crit upper bound: z + 5/df holds for df >= 5 (10x headroom vs the
    # true Fisher-expansion gap ~2.39/df); fall back to the df=1 maximum
    # 12.7062... for tiny groups so the gate never flakes.
    upper_mult = F.when(dof >= 5, F.lit(Z_975) + F.lit(5.0) / dof).otherwise(
        F.lit(13.0)
    )
    defined = (F.col("n") >= 2) & (F.col("sd_price") > 0)
    return (
        aggregated.select(
            "o_orderpriority",
            F.round("mean_price", 6).alias("mean_price"),
            "n",
            F.round(sem, 6).alias("sem"),
            F.when(defined, (lo < F.col("mean_price")) & (F.col("mean_price") < hi))
            .otherwise(F.lit(True))
            .alias("ci_brackets_mean"),
            F.when(defined, (half >= sem * F.lit(Z_975)) & (half <= sem * upper_mult))
            .otherwise(F.lit(True))
            .alias("ci_halfwidth_ok"),
        )
        .orderBy("o_orderpriority")
    )


def _window_conditions():
    before = (F.year(F.col("o_orderdate")) >= REF_YEAR - PRE_YEARS) & (
        F.year(F.col("o_orderdate")) <= REF_YEAR - 1
    )
    after = (F.year(F.col("o_orderdate")) >= REF_YEAR) & (
        F.year(F.col("o_orderdate")) <= REF_YEAR + POST_YEARS
    )
    return before, after


_WINDOW_AGG_SQL = f"""
      SELECT o_orderpriority,
             avg(CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR - PRE_YEARS} AND {REF_YEAR - 1}
                      THEN o_totalprice END) AS avg_before,
             avg(CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR} AND {REF_YEAR + POST_YEARS}
                      THEN o_totalprice END) AS avg_after,
             var_samp(CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR - PRE_YEARS} AND {REF_YEAR - 1}
                      THEN o_totalprice END) AS var_before,
             var_samp(CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR} AND {REF_YEAR + POST_YEARS}
                      THEN o_totalprice END) AS var_after,
             count(CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR - PRE_YEARS} AND {REF_YEAR - 1}
                      THEN o_totalprice END) AS n_before,
             count(CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR} AND {REF_YEAR + POST_YEARS}
                      THEN o_totalprice END) AS n_after
      FROM orders GROUP BY o_orderpriority
"""


@register(
    "agg_window_compare",
    f"""
    SELECT o_orderpriority,
           round(avg_before, 6) AS avg_before,
           round(avg_after, 6) AS avg_after,
           round(avg_after - avg_before, 6) AS diff_pp,
           CAST(n_before AS BIGINT) AS n_before,
           CAST(n_after AS BIGINT) AS n_after
    FROM ({_WINDOW_AGG_SQL})
    ORDER BY o_orderpriority
    """,
    note="before/after conditional aggregation block (SURVEY §2.5 agg_window_compare; reference streamlit_app.py:326-342)",
)
def q_agg_window_compare(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    before, after = _window_conditions()
    v = F.col("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.avg(F.when(before, v)).alias("avg_before_raw"),
            F.avg(F.when(after, v)).alias("avg_after_raw"),
            F.count(F.when(before, v)).alias("n_before"),
            F.count(F.when(after, v)).alias("n_after"),
        )
        .select(
            "o_orderpriority",
            F.round("avg_before_raw", 6).alias("avg_before"),
            F.round("avg_after_raw", 6).alias("avg_after"),
            F.round(F.col("avg_after_raw") - F.col("avg_before_raw"), 6).alias("diff_pp"),
            "n_before",
            "n_after",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_welch_t",
    f"""
    SELECT o_orderpriority,
           round((avg_before - avg_after)
                 / sqrt(var_before / n_before + var_after / n_after), 6) AS t_stat,
           round(pow(var_before / n_before + var_after / n_after, 2)
                 / (pow(var_before / n_before, 2) / (n_before - 1)
                    + pow(var_after / n_after, 2) / (n_after - 1)), 6) AS dof
    FROM ({_WINDOW_AGG_SQL})
    WHERE n_before > 1 AND n_after > 1
    ORDER BY o_orderpriority
    """,
    note="Welch t statistic + Welch–Satterthwaite df, closed form from distributed aggregates (SURVEY §2.5 agg_welch_ttest; reference etl_pipeline.py:136-139)",
)
def q_agg_welch_t(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    before, after = _window_conditions()
    v = F.col("o_totalprice")
    aggregated = o.groupBy("o_orderpriority").agg(
        F.avg(F.when(before, v)).alias("avg_before"),
        F.avg(F.when(after, v)).alias("avg_after"),
        F.var_samp(F.when(before, v)).alias("var_before"),
        F.var_samp(F.when(after, v)).alias("var_after"),
        F.count(F.when(before, v)).alias("n_before"),
        F.count(F.when(after, v)).alias("n_after"),
    )
    t_stat, dof = welch_t_columns(
        F.col("avg_before"), F.col("var_before"), F.col("n_before"),
        F.col("avg_after"), F.col("var_after"), F.col("n_after"),
    )
    return (
        aggregated.filter((F.col("n_before") > 1) & (F.col("n_after") > 1))
        .select(
            "o_orderpriority",
            F.round(t_stat, 6).alias("t_stat"),
            F.round(dof, 6).alias("dof"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_welch_pvalue",
    f"""
    SELECT o_orderpriority,
           round((avg_before - avg_after)
                 / sqrt(var_before / n_before + var_after / n_after), 6) AS t_stat,
           round(pow(var_before / n_before + var_after / n_after, 2)
                 / (pow(var_before / n_before, 2) / (n_before - 1)
                    + pow(var_after / n_after, 2) / (n_after - 1)), 6) AS dof,
           true AS p_in_unit,
           true AS p_brackets_normal
    FROM ({_WINDOW_AGG_SQL})
    WHERE n_before > 1 AND n_after > 1
    ORDER BY o_orderpriority
    """,
    note="Welch two-sided p-value, hash-certified via the approx-gate pattern: "
    "t_stat/dof are SQL-checked (same closed forms as agg_welch_t); the t-CDF "
    "p (numpy kernel) is certified through in-plan booleans — p in [0,1] and "
    "p_normal <= p <= p_normal + 3/dof where p_normal = erfc(|t|/sqrt(2)) is the "
    "df->inf limit (bracket validated vs the kernel for df>=5, sup gap ~0.32/df; "
    "raw p + significance labels pinned by scipy-golden tests in tests/test_stats.py)",
)
def q_agg_welch_pvalue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    before, after = _window_conditions()
    v = F.col("o_totalprice")
    aggregated = o.groupBy("o_orderpriority").agg(
        F.avg(F.when(before, v)).alias("avg_before"),
        F.avg(F.when(after, v)).alias("avg_after"),
        F.var_samp(F.when(before, v)).alias("var_before"),
        F.var_samp(F.when(after, v)).alias("var_after"),
        F.count(F.when(before, v)).alias("n_before"),
        F.count(F.when(after, v)).alias("n_after"),
    )
    t_stat, dof = welch_t_columns(
        F.col("avg_before"), F.col("var_before"), F.col("n_before"),
        F.col("avg_after"), F.col("var_after"), F.col("n_after"),
    )
    with_t = (
        aggregated.filter((F.col("n_before") > 1) & (F.col("n_after") > 1))
        .withColumn("t_stat", t_stat)
        .withColumn("dof", dof)
        .withColumn("p_value", two_sided_p_udf(F.col("t_stat"), F.col("dof")))
        .withColumn("p_normal", normal_two_sided_p_udf(F.col("t_stat")))
    )
    p, pn, d = F.col("p_value"), F.col("p_normal"), F.col("dof")
    return (
        with_t.select(
            "o_orderpriority",
            F.round("t_stat", 6).alias("t_stat"),
            F.round("dof", 6).alias("dof"),
            ((p >= 0.0) & (p <= 1.0)).alias("p_in_unit"),
            (
                (p >= pn - F.lit(1e-9))
                & (p <= pn + F.when(d >= 5, F.lit(3.0) / d).otherwise(F.lit(1.0)))
            ).alias("p_brackets_normal"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    note="explicit GROUPING SETS (neither rollup nor cube): per-flag totals, "
    "per-status totals, and the grand total in ONE pass — Spark expands the "
    "sets into a single Expand + partial-agged aggregate instead of three "
    "scans unioned; the hand-picked-sets flavor completes the grouping-sets "
    "family (rollup/cube siblings above)",
)
def q_agg_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    # pre-aggregate on the (flag, status) pair BEFORE the grouping-sets
    # Expand: Expand multiplies its INPUT rows by the number of sets, so
    # feeding it the 6-row compact aggregate instead of the fact table
    # removes 2/3 of the partial-agg volume (1.6 -> 0.6 s at sf0.1, r13
    # optimization round).  Decimal sums are exact and associative, so
    # the two-level sum is bit-identical; keys are non-null in this
    # schema (NULL keys would alias the grouping-set indicator rows).
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(sum(s) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
               CAST(sum(c) AS BIGINT) AS n_rows
        FROM (SELECT l_returnflag, l_linestatus,
                     sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
                     count(*) AS c
              FROM lineitem_gs GROUP BY l_returnflag, l_linestatus)
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    note="hierarchical grouping-sets aggregation (Spark rollup; extension beyond reference §2.5)",
)
def q_agg_rollup(spark, sf_dir):
    # pre-aggregate before the rollup Expand (see agg_grouping_sets)
    pre = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
            F.count("*").alias("c"),
        )
    )
    return (
        pre.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("s").cast("decimal(18,2)").cast("double").alias("sum_qty"),
            F.sum("c").cast("long").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    note="full grouping-sets lattice (Spark cube; completes §2.5 grouping-set "
    "coverage next to rollup) — Spark expands the lattice map-side into one "
    "aggregation pass, not 2^k scans",
)
def q_agg_cube(spark, sf_dir):
    # pre-aggregate before the cube Expand (see agg_grouping_sets)
    pre = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
            F.count("*").alias("c"),
        )
    )
    return (
        pre.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("s").cast("decimal(18,2)").cast("double").alias("sum_qty"),
            F.sum("c").cast("long").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "pivot_wide",
    """
    SELECT l_returnflag,
           CAST(CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE) AS F,
           CAST(CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE) AS O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    note="long->wide pivot (inverse of the melt; extension)",
)
def q_pivot_wide(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .withColumn("qty_dec", F.col("l_quantity").cast("decimal(18,2)"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("qty_dec").cast("decimal(18,2)").cast("double"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------- #
# §2.7 sorts / limits / top-k


@register(
    "limit_head",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    note="top-k with full tiebreak (SURVEY §2.7 limit_head; reference report_generator.py:77-78)",
)
def q_limit_head(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


