"""Query registry: every SURVEY.md §2 operator as a (Spark plan, DuckDB
oracle SQL) pair over the driver's star schema, plus the large-scale
extension operators (dedup / similarity / text / JSON / event-time).

Contract (driver, __spark_entry__.py): each entry's Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL must produce
identical column names, types, and values in DuckDB.  Determinism rules
applied throughout:

- every float-valued output is ``round()``-ed identically on both sides;
- money aggregates go through DECIMAL(18,2) casts so distributed vs
  single-node summation order cannot produce differing bits;
- every ordered/limited query carries a full tie-breaker key;
- timestamps are cast to DATE (or formatted) at the output edge so
  engine timestamp internals never reach the comparator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.flags import country_flag_udf
from .functions.stats import (
    mean_ci_columns,
    normal_two_sided_p_udf,
    two_sided_p_udf,
    welch_t_columns,
)
from .operators.dedup import (
    embedding_cosine_dup_pairs,
    exact_dedup,
    exact_dedup_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_from_grams,
    shingles_udf,
    simhash_md5_near_dup_pairs,
)
from .operators.reshape import unpivot_measures
from .operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    knn_all_pairs_bruteforce,
)
from .operators.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    STOPWORDS_EN,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_count,
    word_frequencies,
)
from .sources.registry import load_table
from .streaming.event_windows import (
    sessionize,
    sliding_event_counts,
    streaming_sessionize_state,
    tumbling_event_counts,
)

# --------------------------------------------------------------------- #
# constants shared by Spark plans and oracle SQL

REF_YEAR = 1998          # campaign-style reference year on orders
PRE_YEARS = 2            # before window: [1996, 1997]
POST_YEARS = 1           # after window:  [1998, 1999]
Q1_CUTOFF = "2001-09-01"


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => not SQL-expressible; driver does rows-only
    note: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, note: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, note=note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------- #
# §2.1/2.2 scans, filters, projections


@register(
    "filter_eq2",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
    note="conjunctive equality predicate + projection (SURVEY §2.2 filter_eq2; reference streamlit_app.py:119)",
)
def q_filter_eq2(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


@register(
    "dim_index",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer ORDER BY c_mktsegment, c_nationkey
    """,
    note="distinct dimension index (SURVEY §2.5 agg_distinct_pairs; reference streamlit_app.py:99-108)",
)
def q_dim_index(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@register(
    "agg_unique_vals",
    "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    note="per-column distinct (SURVEY §2.5 agg_unique_vals)",
)
def q_agg_unique_vals(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct().orderBy("o_orderpriority")


@register(
    "filter_membership",
    """
    SELECT DISTINCT o_orderpriority FROM orders
    WHERE o_orderstatus = 'F' ORDER BY o_orderpriority
    """,
    note="dependent-dimension filter (SURVEY §2.2 filter_membership; reference streamlit_app.py:190)",
)
def q_filter_membership(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderpriority")
        .distinct()
        .orderBy("o_orderpriority")
    )


@register(
    "filter_range_year",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1996 AND 1999
    GROUP BY 1 ORDER BY 1
    """,
    note="closed-range predicate (SURVEY §2.2 filter_range_year; reference etl_pipeline.py:75)",
)
def q_filter_range_year(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .filter(F.col("order_year").between(1996, 1999))
        .groupBy("order_year")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("order_year")
    )


@register(
    "filter_window_range",
    f"""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CASE WHEN year(o_orderdate) BETWEEN {REF_YEAR - PRE_YEARS} AND {REF_YEAR - 1}
                THEN 'before' ELSE 'after' END AS phase
    FROM orders
    WHERE year(o_orderdate) BETWEEN {REF_YEAR - PRE_YEARS} AND {REF_YEAR + POST_YEARS}
    """,
    note="parameterized before/after range slices (SURVEY §2.2 filter_window_range; reference etl_pipeline.py:124-131)",
)
def q_filter_window_range(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").withColumn("yr", F.year("o_orderdate"))
    return (
        o.filter(F.col("yr").between(REF_YEAR - PRE_YEARS, REF_YEAR + POST_YEARS))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.when(
                F.col("yr").between(REF_YEAR - PRE_YEARS, REF_YEAR - 1), "before"
            )
            .otherwise("after")
            .alias("phase"),
        )
    )


@register(
    "cast_coerce",
    """
    SELECT event_type,
           CAST(count(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS n_valid,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="lossy numeric coercion, null on malformed (SURVEY §2.2 cast_coerce; reference explorer_app.py:244-245) + JSON extraction",
)
def q_cast_coerce(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_valid"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "filter_dropna",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(value), 6) AS sum_big
    FROM events WHERE value >= 50.0
    GROUP BY event_type ORDER BY event_type
    """,
    note="null elimination (SURVEY §2.2 filter_dropna; reference etl_pipeline.py:73) — "
    "a nullable derived measure (NULL below threshold) so na.drop removes real rows",
)
def q_filter_dropna(spark, sf_dir):
    # the driver's events table has no raw NULLs, so derive a nullable
    # column (melt-then-dropna shape, like the reference) and drop on it
    e = _t(spark, sf_dir, "events").withColumn(
        "big_value", F.when(F.col("value") >= 50.0, F.col("value"))
    )
    return (
        e.na.drop(subset=["big_value"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("big_value"), 6).alias("sum_big"),
        )
        .orderBy("event_type")
    )


@register(
    "proj_prefix_rename",
    """
    SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand,
           regexp_replace(p_brand, '^Brand#', '') AS brand_code
    FROM part
    """,
    note="prefix column selection + rename + prefix strip (SURVEY §2.2 proj_prefix_select/proj_rename, §2.9 str_prefix_strip)",
)
def q_proj_prefix_rename(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    # schema-level prefix selection like the reference's coverage__ scan
    keep = [c for c in part.columns if c.startswith("p_")][:3]
    renamed = part.select(
        *[F.col(c).alias(c.removeprefix("p_")) for c in keep]
    )
    return renamed.withColumn(
        "brand_code", F.regexp_replace(F.col("brand"), "^Brand#", "")
    )


# --------------------------------------------------------------------- #
# §2.3 unpivot


@register(
    "unpivot_melt",
    """
    SELECT p_partkey, 'p_retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value
    FROM part WHERE p_retailprice IS NOT NULL
    UNION ALL
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_size IS NOT NULL
    """,
    note="wide->long melt with null drop (SURVEY §2.3 unpivot_melt; reference etl_pipeline.py:68-73)",
)
def q_unpivot_melt(spark, sf_dir):
    return unpivot_measures(
        _t(spark, sf_dir, "part"),
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variable_col="measure",
        value_col="value",
    )


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
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                         AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem_gs
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
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_qty"),
            F.count("*").alias("n_rows"),
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
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_qty"),
            F.count("*").alias("n_rows"),
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


# --------------------------------------------------------------------- #
# joins (required by the star-schema harness; SURVEY §2.4 note)


@register(
    "join_broadcast_dim",
    """
    SELECT n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY n.n_name
    """,
    note="broadcast dimension join (SURVEY §2.4; small side broadcast-hinted)",
)
def q_join_broadcast_dim(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_name", "r_name")
        .orderBy("n_name")
    )


@register(
    "join_semi",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    note="left-semi join (EXISTS)",
)
def q_join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_anti",
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    note="left-anti join (NOT EXISTS); restricted to 'F' orders so survivors exist "
    "(every customer has *some* order — an unrestricted anti-join is vacuously empty)",
)
def q_join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_nationkey")
    )


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    note="TPC-H-style Q1 pricing summary (flagship aggregation)",
)
def q_q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_top_revenue",
    """
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey LIMIT 10
    """,
    note="TPC-H-style Q3: 3-way join + grouped revenue + top-k",
)
def q_q3_top_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
    )


@register(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    note="TPC-H-style Q5: 5-way star join, broadcast dims, grouped revenue",
)
def q_q5_region_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )
    dims = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"))
        .orderBy("n_name")
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    note="TPC-H-style Q4: EXISTS decorrelated to a left-semi join (orders with any "
    "returned lineitem per priority; the driver schema carries no commit/receipt "
    "dates, so the late-delivery predicate maps to l_returnflag) — the lineitem side "
    "projects only l_orderkey through the join",
)
def q_q4_order_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    late = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE)
             AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    note="TPC-H-style Q6: pure scan-side predicate aggregation — every filter pushes "
    "to the parquet scan, single partial+final agg, no join, no wide shuffle; the "
    "canonical predicate-pushdown benchmark shape",
)
def q_q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue_delta")
        )
    )


@register(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    note="TPC-H-style Q18: HAVING-filtered aggregate subquery joined back to "
    "orders/customer (large-volume orders). The aggregate runs FIRST and its "
    "survivor set (~0.1% of orders) gets an explicit broadcast into the orders "
    "join; the customer join is left to AQE, which sees a tiny runtime left side "
    "and plans a broadcast. Top-k via TakeOrdered with o_orderkey tiebreak — no "
    "global sort",
)
def q_q18_large_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 300)
        .select("l_orderkey", F.round("qty_raw", 2).alias("total_qty"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    note="TPC-H-style Q10 (returned-item revenue): both selective predicates "
    "(orderdate quarter, returnflag) push to their parquet scans BEFORE the "
    "fact-fact shuffle join; the 25-row nation dim is an explicit broadcast; "
    "top-20 via TakeOrdered with custkey tiebreak, no global sort. Decimal "
    "revenue accumulation for exact cross-engine sums",
)
def q_q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    """
    SELECT
      CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                ELSE 0 END) AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue,
      CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue,
      round(100.0
            * CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      ELSE 0 END) AS DECIMAL(18,4)) AS DOUBLE)
            / CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                        AS DECIMAL(18,4)) AS DOUBLE), 6) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '1997-09-01' AND l.l_shipdate < DATE '1997-10-01'
    """,
    note="TPC-H-style Q14 (promo revenue share): shipdate month pushes to the "
    "lineitem scan, part dim rides a broadcast join, conditional aggregation in "
    "one pass. The pct is computed as a DOUBLE ratio of exact decimal sums so "
    "both engines divide bit-identical operands",
)
def q_q14_promo_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("date"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    agg = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .cast("decimal(18,4)").cast("double").alias("promo_revenue"),
            F.sum(rev).cast("decimal(18,4)").cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    note="TPC-H-style Q19 (disjunctive multi-clause predicate): the classic "
    "OR-across-join test. Catalyst extracts the single-side conjuncts it can "
    "prove common (l_quantity BETWEEN 1 AND 30 pushes to the lineitem scan, "
    "brand/size disjunction to the part scan) and evaluates the full residual "
    "disjunction after the broadcast join — scan-prunes without changing "
    "semantics",
)
def q_q19_disjunctive_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .filter(clause)
        .agg(
            F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "event_path_topk",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM paths GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
    note="top-10 three-step event paths per user timeline (path mining): two "
    "lead() passes over one (user_id) window shuffle with a total (ts, "
    "event_id) order — no self-joins for sequence extraction — then a "
    "partial-agged count and TakeOrdered",
)
def q_event_path_topk(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week,
                                  CAST(date_trunc('week', e.ts) AS DATE)) / 7)
                  AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    WHERE week_offset <= 8
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    note="weekly cohort retention triangle: first-activity week per user (one "
    "partial-agged shuffle), joined back to activity (AQE broadcasts the "
    "user->cohort map when it fits) and rolled up to distinct active users per "
    "(cohort, week offset) — the canonical retention query, all JVM date math",
)
def q_cohort_retention(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firsts, on="user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 8)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))))
                       AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    note="TPC-H-style Q15 (top supplier): quarter revenue per supplier "
    "(pushed date range, partial-agged shuffle), then the max-revenue scalar "
    "joins back in-plan as a broadcast 1-row aggregate — the self-agg-max "
    "pattern with no driver round-trip; supplier dim broadcast. Equality on "
    "DOUBLEs is safe because both sides derive from the same exact decimal sum",
)
def q_q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("decimal(18,4)").cast("double").alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
      AND n1.n_name <> n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    note="TPC-H-style Q7 (volume shipping): cross-border revenue by (supplier "
    "nation, customer nation, year). The nation dim joins TWICE under different "
    "roles — both explicit broadcasts, as is the supplier dim — so the only "
    "shuffles are the two fact-fact joins (lineitem-orders, orders-customer) "
    "and the final partial-agged groupBy; the shipdate range pushes to the "
    "lineitem scan. The inequality n1<>n2 is evaluated post-join (residual), "
    "matching the reference pattern of international-only flows",
)
def q_q7_volume_shipping(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01')
    SELECT o_year,
           round(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                                    THEN volume ELSE 0 END)
                           AS DECIMAL(18,4)) AS DOUBLE)
                 / CAST(CAST(sum(volume) AS DECIMAL(18,4)) AS DOUBLE),
                 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    note="TPC-H-style Q8 (national market share): NATION_2's share of PROMO "
    "revenue sold into ASIA-region customers, by order year. Nation again "
    "plays two roles (customer-side chained through region to gate the "
    "market, supplier-side for the share numerator); part/supplier/nation/"
    "region all broadcast, p_type and the orderdate range push to their "
    "scans, and the share is a conditional aggregation — one pass, no "
    "separate numerator query. Both engines divide the same exact decimal "
    "sums so round(...,6) is stable",
)
def q_q8_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = _t(spark, sf_dir, "customer")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0)))
            .cast("decimal(18,4)").cast("double").alias("num"),
            F.sum(vol).cast("decimal(18,4)").cast("double").alias("den"),
        )
        .select(
            "o_year",
            F.round(F.col("num") / F.col("den"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q9_nation_profit",
    """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))
                         * CAST(p.p_retailprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,4)) AS DOUBLE) AS retail_value
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    note="TPC-H-style Q9 (product-type profit by nation and year): the driver "
    "schema has no partsupp/ps_supplycost, so the profit expression is split "
    "into its two exact components (discounted revenue and quantity x retail "
    "value) instead of a supply-cost subtraction — same plan shape: LIKE "
    "predicate pushes to the part scan as a string filter, part broadcast "
    "prunes lineitem FIRST, supplier+nation broadcast, one partial-agged "
    "groupBy over (nation, year). Decimal accumulation keeps both sums "
    "bit-identical across engines",
)
def q_q9_nation_profit(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    retail = F.col("l_quantity").cast("decimal(18,2)") * F.col(
        "p_retailprice"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev"),
            retail.alias("retail"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("rev").cast("decimal(18,4)").cast("double").alias("revenue"),
            F.sum("retail").cast("decimal(18,4)").cast("double").alias("retail_value"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q13_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    note="TPC-H-style Q13 (customer order-count distribution): LEFT OUTER "
    "join so zero-order customers survive with c_count=0 — the ON-clause "
    "predicate on the right side is pre-filtered onto the orders scan "
    "(equivalent for left joins, and it pushes to parquet where an ON-clause "
    "residual would not), then a two-level aggregation: per-customer count "
    "(shuffle on custkey) and the histogram roll-up (shuffle on the tiny "
    "count domain). count(o_orderkey) counts only matched rows, preserving "
    "outer-join null semantics in both engines",
)
def q_q13_customer_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_qty_revenue",
    """
    WITH pa AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey)
    SELECT round(CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                           AS DECIMAL(18,4)) AS DOUBLE) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < pa.qty_thresh
    """,
    note="TPC-H-style Q17 (small-quantity-order revenue): the correlated "
    "scalar subquery (per-part average quantity) decorrelates to a "
    "partial-agged groupBy on l_partkey joined back as an equi join — never "
    "a per-row subquery execution. The brand predicate pushes to the part "
    "scan and the broadcast part join prunes lineitem before the threshold "
    "join. Quantities are integral doubles so avg() is order-independent "
    "and the 0.2x threshold compares identically in both engines; revenue "
    "accumulates in exact decimal before the /7.0 presentation divide",
)
def q_q17_small_qty_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = (
        li.groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh"))
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(pa, F.col("pa_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("decimal(18,4)").cast("double") / F.lit(7.0),
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_small"),
        )
    )


@register(
    "q21_waiting_supplier",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_ret_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN per_order po ON po.l_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND po.n_supp >= 2 AND po.n_ret_supp = 1
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100
    """,
    note="TPC-H-style Q21 (suppliers who kept orders waiting): the driver "
    "schema has no commit/receipt dates, so 'failed delivery' maps to "
    "l_returnflag='R' — the EXISTS (another supplier contributed) and NOT "
    "EXISTS (no OTHER supplier failed) correlated subqueries decorrelate "
    "into ONE aggregate over lineitem per order (distinct-supplier count + "
    "distinct-failing-supplier count) instead of two extra self-joins: "
    "n_supp>=2 is the EXISTS, n_ret_supp=1 combined with l1 failing is the "
    "NOT EXISTS. Supplier broadcast, TakeOrdered top-k with name tiebreak",
)
def q_q21_waiting_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    # two-level aggregate instead of a double countDistinct: Spark
    # plans multi-column distinct aggregates with an Expand (x2 row
    # blow-up of the whole fact); per-(order, supplier) partial agg
    # first keeps every pass map-side combinable and Expand-free
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("has_r")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_ret_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(F.broadcast(s), s.s_suppkey == l1.l_suppkey)
        .join(o, o.o_orderkey == l1.l_orderkey)
        .join(
            per_order,
            (F.col("po_orderkey") == l1.l_orderkey)
            & (F.col("n_supp") >= 2)
            & (F.col("n_ret_supp") == 1),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                     AS DECIMAL(18,4)) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY segment ORDER BY segment
    """,
    note="TPC-H-style Q22 (global sales opportunity): above-average-balance "
    "customers with no recent orders, grouped by market segment (the driver "
    "schema has no phone column for country codes). The scalar average is an "
    "in-plan 1-row broadcast (exact decimal sum / count, so the threshold is "
    "bit-identical across engines — no driver round-trip), the NOT EXISTS "
    "decorrelates to a LEFT ANTI join against the date-pruned orders scan, "
    "and balances aggregate in exact decimal",
)
def q_q22_dormant_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(18,4)").cast("double").alias("totacctbal"),
        )
        .orderBy("segment")
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                             AS DECIMAL(18,4)) AS DOUBLE)
                   / sum(l_quantity), 4) AS unit_cost
      FROM lineitem l GROUP BY 1, 2),
    eu AS (
      SELECT c.l_partkey, c.unit_cost, s.s_name, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    mn AS (SELECT l_partkey, min(unit_cost) AS mc FROM eu GROUP BY 1)
    SELECT p.p_partkey, p.p_brand, p.p_type, e.s_name, e.n_name, e.unit_cost
    FROM eu e
    JOIN mn ON mn.l_partkey = e.l_partkey AND e.unit_cost = mn.mc
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size BETWEEN 10 AND 30
    ORDER BY e.unit_cost, p.p_partkey, e.s_name LIMIT 100
    """,
    note="TPC-H-style Q2 (min-cost supplier per part in a region): no "
    "partsupp in the driver schema, so supply cost derives from lineitem "
    "(average realized unit price per (part, supplier) — exact decimal sum "
    "over integral quantities, rounded to 4 dp so the argmin equality "
    "compares identically cross-engine). The correlated MIN subquery "
    "decorrelates to a per-part aggregate broadcast back as an equi join "
    "on (partkey, unit_cost) — the per-group ARGMIN join-back, the one "
    "TPC-H shape q15 (global max) and q17 (threshold filter) don't cover; "
    "supplier/nation/region prune before the min so only regional offers "
    "compete, and the size predicate pushes to the part scan",
)
def q_q2_min_cost_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").between(10, 30))
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,4)").cast("double")
            / F.sum("l_quantity"),
            4,
        ).alias("unit_cost")
    )
    eu = (
        cost.join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select("l_partkey", "unit_cost", "s_name", "n_name")
    )
    mn = eu.groupBy(F.col("l_partkey").alias("mn_partkey")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        eu.join(
            F.broadcast(mn),
            (F.col("mn_partkey") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("mc")),
        )
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .select(
            "p_partkey", "p_brand", "p_type", "s_name", "n_name", "unit_cost"
        )
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q16_supplier_diversity",
    """
    SELECT p.p_brand, p.p_type,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
    note="TPC-H-style Q16 (supplier diversity by part attributes): the "
    "driver schema has no partsupp, so the supplier-part relation derives "
    "from lineitem. Shapes: the NOT IN exclusion subquery (negative-balance "
    "suppliers standing in for the complaints LIKE) decorrelates to a LEFT "
    "ANTI join against a broadcast few-row set — safe because s_suppkey is "
    "non-null, the NULL-semantics trap of NOT IN never triggers; the "
    "brand/type/size predicates all push to the part scan; a SINGLE-column "
    "count(DISTINCT) plans as a two-phase aggregate (no Expand — the "
    "multi-distinct blow-up q21 avoids does not apply)",
)
def q_q16_supplier_diversity(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@register(
    "doc_concat_shards",
    """
    SELECT source,
           substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id))
             AS text_digest
    FROM documents
    GROUP BY source, shard ORDER BY source, shard
    """,
    note="pretraining shard assembly (operators/packing.py concat_shards): "
    "row-local salted-md5 shard assignment (16 shards via 1 hex char — the "
    "hash_split contract, growth-stable and engine-portable), then ONE "
    "shuffle on (source, shard) and an all-JVM ordered concatenation "
    "(array_sort(collect_list(struct(doc_id, text))) -> transform -> "
    "array_join). The md5 digest of each joined shard certifies the exact "
    "byte order of the concatenation against the oracle's ORDER BY "
    "string_agg without shipping shard text into the result; per-group "
    "state is bounded by the shard fanout — the same lever pack_token_bins "
    "uses",
)
def q_doc_concat_shards(spark, sf_dir):
    from .operators.packing import concat_shards

    d = _t(spark, sf_dir, "documents")
    return concat_shards(d).orderBy("source", "shard")


@register(
    "sql_api_running_revenue",
    """
    WITH m AS (
      SELECT CAST(year(l_shipdate) AS INT) AS yr,
             CAST(month(l_shipdate) AS INT) AS mo,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))))
                       AS DECIMAL(18,4)) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY yr, mo)
    SELECT yr, mo, revenue,
           round(sum(revenue) OVER (PARTITION BY yr ORDER BY mo
                                    ROWS UNBOUNDED PRECEDING), 4)
             AS ytd_revenue
    FROM m ORDER BY yr, mo
    """,
    note="SQL-API parity: this query is executed as LITERAL SQL TEXT via "
    "spark.sql() over temp views — the same string both engines parse "
    "(reference users write SQL against SQLite; the engine accepts the "
    "identical entry path, and Catalyst plans it exactly like the "
    "DataFrame build: pushed scans, partial agg, one window pass over the "
    "tiny month domain). The running sum accumulates in deterministic "
    "frame order over decimal-exact doubles, so round(...,4) is stable "
    "cross-engine",
)
def q_sql_api_running_revenue(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_api_lineitem_v"
    )
    return spark.sql(
        """
        WITH m AS (
          SELECT CAST(year(l_shipdate) AS INT) AS yr,
                 CAST(month(l_shipdate) AS INT) AS mo,
                 CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2))))
                           AS DECIMAL(18,4)) AS DOUBLE) AS revenue
          FROM sql_api_lineitem_v GROUP BY yr, mo)
        SELECT yr, mo, revenue,
               round(sum(revenue) OVER (PARTITION BY yr ORDER BY mo
                                        ROWS UNBOUNDED PRECEDING), 4)
                 AS ytd_revenue
        FROM m ORDER BY yr, mo
        """
    )


@register(
    "domain_cap_sample",
    """
    WITH r AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, lang FROM r WHERE rn <= 40 ORDER BY doc_id
    """,
    note="per-domain frequency capping (operators/sampling.py "
    "capped_per_group, cap=40): the web-corpus step that bounds any one "
    "source's contribution. Deterministic salted-md5 order makes the kept "
    "prefix unbiased, growth-stable, and engine-portable; the "
    "implementation is TWO-PHASE (rank within (source, hash-part) first, "
    "then re-rank the <= cap x 16 survivors) so a hot domain spreads over "
    "16 tasks instead of serializing one window task — provably identical "
    "to the oracle's single row_number() because any row of the global "
    "top-cap is in its own part's top-cap",
)
def q_domain_cap_sample(spark, sf_dir):
    from .operators.sampling import capped_per_group

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return capped_per_group(d, "source", cap=40).orderBy("doc_id")


@register(
    "incremental_dedup_new_docs",
    rf"""
    WITH assigned AS (
      SELECT doc_id, source, text,
             CASE WHEN substr(md5('incr:' || CAST(doc_id AS VARCHAR)), 1, 4)
                       < 'c000'
                  THEN 'base' ELSE 'new' END AS batch
      FROM documents),
    base_keys AS (
      SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
      FROM assigned WHERE batch = 'base'),
    new_first AS (
      SELECT min(doc_id) AS doc_id,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
      FROM assigned WHERE batch = 'new' GROUP BY 2)
    SELECT n.doc_id FROM new_first n
    WHERE NOT EXISTS (SELECT 1 FROM base_keys b WHERE b.k = n.k)
    ORDER BY n.doc_id
    """,
    note="incremental ingest dedup: the continuous-crawl step — an "
    "incoming batch ('new', 25% by the salted-md5 split contract) is "
    "deduplicated WITHIN itself (keep-min-id per normalized key, one "
    "hash-partial-agged shuffle) and then LEFT ANTI joined against the "
    "existing corpus's distinct normalized keys ('base'). At 100 TB the "
    "base side is the pre-computed key column of the warehouse (already "
    "distinct, bucketed on the key) so the anti join co-locates without "
    "re-scanning history; here both sides derive from the documents "
    "fixture via the deterministic batch assignment. Normalization is "
    "the exact_dedup contract (whitespace-collapse + lowercase)",
)
def q_incremental_dedup_new_docs(spark, sf_dir):
    from .operators.dedup import normalized_text

    d = _t(spark, sf_dir, "documents")
    batch = F.when(
        F.substring(
            F.md5(F.concat(F.lit("incr:"), F.col("doc_id").cast("string"))),
            1,
            4,
        )
        < "c000",
        F.lit("base"),
    ).otherwise(F.lit("new"))
    assigned = d.select(
        "doc_id", normalized_text(F.col("text")).alias("k"), batch.alias("batch")
    )
    base_keys = (
        assigned.filter(F.col("batch") == "base").select("k").distinct()
    )
    new_first = (
        assigned.filter(F.col("batch") == "new")
        .groupBy("k")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return (
        new_first.join(base_keys, "k", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "funnel_conversion",
    """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view_then_click,
           CAST(sum(CASE WHEN t_click > t_view AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM f
    """,
    note="ordered funnel analysis (view -> click -> purchase by first "
    "occurrence per user): one conditional-min shuffle on user_id + a scalar "
    "roll-up — the product-analytics staple, all JVM conditional aggregation, "
    "no self-joins or window passes over raw events",
)
def q_funnel_conversion(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("t_view").cast("long").alias("n_view"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("long").alias("n_view_then_click"),
        F.sum(F.when(purchased, 1).otherwise(0)).cast("long").alias("n_full_funnel"),
    )


@register(
    "props_json_extract",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
             AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="semi-structured JSON payload extraction (get_json_object on the "
    "events.props column) feeding a grouped aggregate — JVM-side JSON path "
    "evaluation in the scan stage, no UDF; the semi-structured-column pattern "
    "every event pipeline needs",
)
def q_props_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg(k), 6).alias("avg_k"),
            F.max(k).cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "doc_length_ntile_bins",
    """
    WITH b AS (
      SELECT lang, n_chars,
             ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bin
      FROM documents)
    SELECT lang, CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM b GROUP BY lang, bin ORDER BY lang, bin
    """,
    note="quartile binning per language via ntile() (curriculum/bucketing "
    "shape): one window shuffle partitioned by lang with a deterministic "
    "(n_chars, doc_id) order, then a partial-agged roll-up; ntile's "
    "extra-rows-to-early-buckets rule is identical across engines",
)
def q_doc_length_ntile_bins(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        d.withColumn("bin", F.ntile(4).over(w))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("lang", "bin")
    )


@register(
    "set_ops",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    EXCEPT
    SELECT n_nationkey FROM nation WHERE n_regionkey = 0
    ORDER BY nationkey
    """,
    note="set operations: INTERSECT + EXCEPT (SURVEY §2.8 extension)",
)
def q_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n0 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select(F.col("n_nationkey").alias("nationkey"))
    )
    return c.intersect(s).exceptAll(n0.distinct()).orderBy("nationkey")


# --------------------------------------------------------------------- #
# window functions (SURVEY §2.6 gap-fill)


@register(
    "window_topn_per_group",
    """
    SELECT c_nationkey, o_orderkey, round(o_totalprice, 2) AS total_price, rnk
    FROM (
      SELECT c.c_nationkey, o.o_orderkey, o.o_totalprice,
             CAST(row_number() OVER (PARTITION BY c.c_nationkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    WHERE rnk <= 3 ORDER BY c_nationkey, rnk
    """,
    note="top-N per group via ranking window",
)
def q_window_topn_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_nationkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rnk",
        )
        .orderBy("c_nationkey", "rnk")
    )


@register(
    "window_lag_delta",
    """
    SELECT user_id, event_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta
    FROM events WHERE user_id < 10
    """,
    note="lag-based per-entity delta (analytic window)",
)
def q_window_lag_delta(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


@register(
    "window_moving_avg",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mov_avg
    FROM events WHERE user_id < 10
    """,
    note="moving average over a row frame",
)
def q_window_moving_avg(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return e.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("mov_avg")
    )


# --------------------------------------------------------------------- #
# §2.9 scalar functions / UDF


def _flag_oracle() -> str:
    """CASE oracle generated from the SAME mapping table the UDF uses
    (functions/flags.py) so the two can never drift.  Assumes the
    fallback (no-pycountry) path, which is this environment."""
    from .functions.flags import _NAME_TO_ALPHA2, WHITE_FLAG, _alpha2_to_flag

    cases = "\n             ".join(
        "WHEN upper(trim(n_name)) = '{}' THEN '{}'".format(
            name.replace("'", "''"), _alpha2_to_flag(code)
        )
        for name, code in sorted(_NAME_TO_ALPHA2.items())
    )
    return f"""
    SELECT n_name,
           CASE {cases}
                ELSE '{WHITE_FLAG}' END AS flag
    FROM nation ORDER BY n_name
    """


@register(
    "udf_country_flag",
    _flag_oracle(),
    note="country->emoji-flag scalar UDF (SURVEY §2.9 udf_country_flag; reference "
    "streamlit_app.py:82-87); oracle is a CASE expression generated from the UDF's "
    "own mapping table (hash-checked, was rows-only through r2)",
)
def q_udf_country_flag(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_name", country_flag_udf(F.col("n_name")).alias("flag")
    ).orderBy("n_name")


# --------------------------------------------------------------------- #
# event-time windows (extension; SURVEY §2.10)


@register(
    "event_tumbling_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    note="tumbling event-time window aggregation (batch flavor of the streaming op)",
)
def q_event_tumbling_daily(spark, sf_dir):
    agg = tumbling_event_counts(_t(spark, sf_dir, "events"), "1 day")
    return agg.select(
        F.col("window_start").cast("date").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    ).orderBy("day", "event_type")


@register(
    "event_sliding_2d",
    """
    WITH shifted AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start, value FROM events
      UNION ALL
      SELECT CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS DATE) AS window_start, value
      FROM events)
    SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM shifted GROUP BY window_start ORDER BY window_start
    """,
    note="sliding event-time windows (2-day window, 1-day slide): each event lands in 2 windows",
)
def q_event_sliding_2d(spark, sf_dir):
    agg = sliding_event_counts(
        _t(spark, sf_dir, "events"), duration="2 days", slide="1 day"
    )
    return (
        agg.groupBy(F.col("window_start").cast("date").alias("window_start"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 6).alias("sum_value"),
        )
        .orderBy("window_start")
    )


@register(
    "sessionize_counts",
    """
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    note="gap-based sessionization (30 min) via lag + cumulative sum",
)
def q_sessionize_counts(spark, sf_dir):
    sessions = sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
    return (
        sessions.groupBy("user_id")
        .agg((F.max("session_idx") + 1).cast("long").alias("n_sessions"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------- #
# Structured Streaming flavor (SURVEY §2.10) — REAL streaming queries:
# parquet file source → watermark → event-time tumbling agg, run with
# Trigger.AvailableNow and compared to the batch oracle.

_EVENTS_STREAM_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_EVENTS_STREAM_SCHEMA_NATIVE = (
    # ts is declared TIMESTAMP (LTZ), not NTZ: withWatermark rejects NTZ
    # event-time columns, and the LTZ read of parquet micros matches the
    # legacy timestamp_micros() path bit-for-bit under a UTC session
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream_schema(sf_dir):
    """Pick the stream schema matching the physical events layout.

    File streams need a declared schema, so the nanos-vs-native probe
    (sources.registry.events_ts_is_nanos, one footer read) decides
    between the legacy ``ts long`` shape (+ ÷1000 conversion downstream)
    and the native ``ts timestamp_ntz`` pass-through.  Hardcoding one
    silently corrupted every streaming timestamp when the testdata
    regenerated — hence the probe.
    """
    from .sources.registry import events_ts_is_nanos

    if events_ts_is_nanos(sf_dir):
        return _EVENTS_STREAM_SCHEMA_NANOS, True
    return _EVENTS_STREAM_SCHEMA_NATIVE, False


def _events_stream(spark, sf_dir):
    """File-stream over the events table (the source needs a directory;
    pathGlobFilter scopes it within the shared sf dir).  ts handling is
    schema-adaptive: TIMESTAMP(NANOS) era → read as long → truncate to
    micros; native micro timestamps → pass through."""
    schema, from_nanos = _events_stream_schema(sf_dir)
    if from_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if from_nanos:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


class _stream_state_partitions:
    """Scope ``spark.sql.shuffle.partitions`` down for a streaming start.

    A stateful stream materializes one state store per shuffle partition
    per micro-batch; for a windows×types aggregate (~10² groups) 32
    stores are pure overhead.  The value is captured into the stream's
    checkpoint at start, so restoring the conf right after ``start()``
    leaves batch queries untouched.  (On a real cluster you'd size this
    to the key cardinality the same way.)
    """

    def __init__(self, spark, n: int = 8):
        self.spark, self.n = spark, str(n)

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


@register(
    "streaming_tumbling_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    note="Structured Streaming tumbling-window aggregation (streaming/event_windows.py): "
    "parquet file source + watermark + F.window, Trigger.AvailableNow, complete-mode "
    "memory sink — a correctness harness (complete mode sees every window); the "
    "scale-safe sink shape is streaming_tumbling_append below",
)
def q_streaming_tumbling_daily(spark, sf_dir):
    import uuid

    agg = tumbling_event_counts(
        _events_stream(spark, sf_dir).withWatermark("ts", "1 day"), "1 day"
    )
    # unique sink name per invocation: a fixed name would collide if the
    # harness runs the query twice in one session
    qname = f"stream_tumbling_daily_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        # conf restore must wait for termination: the shuffle-partition
        # conf is captured asynchronously when batch 0 plans
        q.awaitTermination()
    mem = spark.table(qname)
    return mem.select(
        F.col("window_start").cast("date").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    ).orderBy("day", "event_type")


@register(
    "streaming_tumbling_append",
    """
    WITH agg AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2),
    m AS (SELECT max(ts) AS mx FROM events)
    SELECT day, event_type, n_events, sum_value
    FROM agg, m
    WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <= mx - INTERVAL 1 DAY
    ORDER BY day, event_type
    """,
    note="Structured Streaming tumbling agg through the PRODUCTION sink shape "
    "(streaming/event_windows.py streaming_tumbling_to_files): append mode + parquet "
    "file sink + watermark state eviction — each window emits exactly once when the "
    "watermark (max event time - 1 day) passes its end, so the oracle is the batch agg "
    "restricted to watermark-closed windows; nothing accumulates on the driver",
)
def q_streaming_tumbling_append(spark, sf_dir):
    from .scratch import scratch_dir
    from .streaming.event_windows import streaming_tumbling_to_files

    out_dir = scratch_dir("stream_append_out_")
    ck_dir = scratch_dir("stream_append_ck_")
    schema, from_nanos = _events_stream_schema(sf_dir)
    if from_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    with _stream_state_partitions(spark):
        q = streaming_tumbling_to_files(
            spark,
            sf_dir,
            schema,
            out_dir,
            ck_dir,
            duration="1 day",
            watermark="1 day",
            path_glob="events.parquet",
            ts_from_nanos=from_nanos,
        )
        q.awaitTermination()
    res = spark.read.parquet(out_dir)
    return res.select(
        F.col("window_start").cast("date").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    ).orderBy("day", "event_type")


@register(
    "streaming_two_level_window",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             CAST(count(*) AS BIGINT) AS n_hour
      FROM events GROUP BY 1, 2),
    m AS (SELECT max(ts) AS mx FROM events),
    daily AS (
      SELECT CAST(date_trunc('day', h) AS DATE) AS day, event_type,
             CAST(sum(n_hour) AS BIGINT) AS n_events,
             max(n_hour) AS max_hourly,
             CAST(count(*) AS BIGINT) AS n_hours
      FROM hourly GROUP BY 1, 2)
    SELECT day, event_type, n_events, max_hourly, n_hours
    FROM daily, m
    WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <= mx - INTERVAL 1 HOUR
    ORDER BY day, event_type
    """,
    note="CHAINED streaming aggregations — two stateful operators in one "
    "query (streaming/event_windows.py two_level_window_rollup): hourly "
    "tumbling partials re-windowed BY THE WINDOW COLUMN into daily "
    "rollups, append mode, one shared watermark.  The production "
    "pre-aggregation cascade: level 2's input is windows x keys, not raw "
    "events, so daily state is tiny at any event rate.  Oracle = the "
    "equivalent batch cascade restricted to watermark-closed days "
    "(day_end <= max(ts) - 1 hour) — the eviction rule empirically "
    "pinned at both scales; the max-per-hour column certifies the "
    "two-level structure (not derivable from a flat daily agg)",
)
def q_streaming_two_level_window(spark, sf_dir):
    import uuid

    from .streaming.event_windows import two_level_window_rollup

    s = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    rolled = two_level_window_rollup(s, hourly="1 hour", daily="1 day")
    qname = f"stream_two_level_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            rolled.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(qname)
        .select(
            F.col("window_start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "max_hourly",
            "n_hours",
        )
        .orderBy("day", "event_type")
    )


@register(
    "streaming_sink_jsonl_events",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="the Python DataSource STREAMING-WRITE path end to end "
    "(sources/jsonl_sink_source.py JsonlStreamWriter): the events "
    "stream passes through the manifest-committed JSONL sink "
    "(task-staged files -> idempotent per-(stream,batch) driver commit "
    "-> atomic manifest swap) and is read back through the bundled "
    "manifest reader; the oracle is the batch aggregate over the "
    "source table, so the hash fails if the sink drops, duplicates, or "
    "corrupts one row (doubles round-trip exactly via repr JSON).  "
    "Exactly-once under replay is pytest-pinned "
    "(tests/test_jsonl_sink_source.py)",
)
def q_streaming_sink_jsonl_events(spark, sf_dir):
    from .scratch import scratch_dir
    from .sources.jsonl_sink_source import register_jsonl_manifest

    register_jsonl_manifest(spark)
    out = scratch_dir("jsonl_sink_out_")
    ck = scratch_dir("jsonl_sink_ck_")
    s = _events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    with _stream_state_partitions(spark):
        q = (
            s.writeStream.format("jsonl_manifest")
            .option("checkpointLocation", ck)
            .option("stream_id", "events")
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination()
    back = (
        spark.read.format("jsonl_manifest")
        .schema("event_id long, event_type string, value double")
        .load(out)
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "streaming_dedup_events",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="streaming exact dedup with BOUNDED state (streaming/dedup_stream.py "
    "dedup_within_watermark -> dropDuplicatesWithinWatermark): the stream is a "
    "self-union of the events feed, so every event_id arrives exactly twice; the "
    "dedup emits each first arrival and evicts key state once the watermark "
    "passes. Oracle = plain batch aggregate over the UN-duplicated table — the "
    "hash check fails if even one duplicate leaks through (counts would double) "
    "or one event is lost",
)
def q_streaming_dedup_events(spark, sf_dir):
    import uuid

    from .streaming.dedup_stream import dedup_within_watermark

    s = _events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    deduped = dedup_within_watermark(
        doubled, ["event_id"], watermark_col="ts", delay="1 day"
    )
    qname = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(qname)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "streaming_enrich_nation",
    """
    SELECT n.n_name, e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 6) AS sum_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, e.event_type ORDER BY n.n_name, e.event_type
    """,
    note="stream-static enrichment join (streaming/enrich.py enrich_with_dim): the "
    "events stream joins a broadcast customer->nation dimension per micro-batch — "
    "STATELESS (no join state store, dim refreshes picked up next batch), the "
    "production clicks-x-users topology; downstream per-(nation, type) aggregate is "
    "the only stateful operator. Oracle = the equivalent batch join+agg",
)
def q_streaming_enrich_nation(spark, sf_dir):
    import uuid

    from .streaming.enrich import enrich_with_dim

    dim = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    enriched = enrich_with_dim(_events_stream(spark, sf_dir), dim, ["user_id"])
    agg = enriched.groupBy("n_name", "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    qname = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(qname).orderBy("n_name", "event_type")


@register(
    "stream_click_attribution",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             make_timestamp(epoch_ns(ts) // 1000) AS ts
      FROM events)
    SELECT c.user_id AS user_id, c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM e c JOIN e p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    ORDER BY user_id, click_id, purchase_id
    """,
    note="watermarked stream-stream interval join (streaming/stream_join.py "
    "stream_interval_join): click x purchase attribution within 6 hours per user. "
    "Both sides buffer in the state store ONLY for watermark + interval width — "
    "the built-in time-range predicate is what makes a two-sided streaming join "
    "scale-safe. Oracle = the batch self-join at micros precision "
    "(make_timestamp(epoch_ns//1000) mirrors the nanos->micros ingest truncation)",
)
def q_stream_click_attribution(spark, sf_dir):
    import uuid

    from .streaming.stream_join import stream_interval_join

    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = stream_interval_join(
        clicks, purchases, on="user_id",
        left_ts="click_ts", right_ts="purchase_ts",
        max_delay="6 hours", watermark="1 day",
    )
    qname = f"stream_attr_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            joined.select("user_id", "click_id", "purchase_id")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(qname).orderBy("user_id", "click_id", "purchase_id")


@register(
    "stream_attribution_outer",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             make_timestamp(epoch_ns(ts) // 1000) AS ts
      FROM events),
    c AS (SELECT user_id, event_id AS click_id, ts FROM e
          WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts FROM e
          WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                  - INTERVAL 1 DAY AS w),
    matched AS (
      SELECT c.user_id, c.click_id, p.purchase_id
      FROM c JOIN p ON p.user_id = c.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR),
    unmatched AS (
      SELECT c.user_id, c.click_id, CAST(-1 AS BIGINT) AS purchase_id
      FROM c, wm
      WHERE NOT EXISTS (SELECT 1 FROM p
                        WHERE p.user_id = c.user_id
                          AND p.ts >= c.ts
                          AND p.ts <= c.ts + INTERVAL 6 HOUR)
        AND c.ts + INTERVAL 6 HOUR < wm.w)
    SELECT user_id, click_id, CAST(purchase_id AS BIGINT) AS purchase_id
    FROM matched
    UNION ALL SELECT user_id, click_id, purchase_id FROM unmatched
    ORDER BY user_id, click_id, purchase_id
    """,
    note="watermarked stream-stream LEFT OUTER interval join (streaming/"
    "stream_join.py how='left_outer'): clicks that never convert emit a "
    "null-extended row (surfaced as purchase_id=-1) once the watermark "
    "proves no purchase can still arrive. The oracle encodes the exact "
    "eviction semantics, empirically pinned: the GLOBAL watermark is the "
    "MIN across both inputs' event-time maxima minus the delay (not the "
    "union max — clicks and purchases advance at different rates), and a "
    "click is released when click_ts + interval < watermark. Matched "
    "pairs emit immediately; only the outer tail waits on state eviction "
    "— which is what bounds the state store at 100 TB/day",
)
def q_stream_attribution_outer(spark, sf_dir):
    import uuid

    from .streaming.stream_join import stream_interval_join

    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = stream_interval_join(
        clicks, purchases, on="user_id",
        left_ts="click_ts", right_ts="purchase_ts",
        max_delay="6 hours", watermark="1 day", how="left_outer",
    )
    qname = f"stream_attr_outer_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            joined.select(
                "user_id",
                "click_id",
                F.coalesce(F.col("purchase_id"), F.lit(-1)).alias("purchase_id"),
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(qname).orderBy("user_id", "click_id", "purchase_id")


@register(
    "range_join_attribution",
    """
    SELECT c.user_id AS user_id, c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 6 HOUR
    ORDER BY user_id, click_id, purchase_id
    """,
    note="BATCH interval join via bucketing (operators/rangejoin.py "
    "bucketed_interval_join): a bare ts-range join plans as a nested-loop / "
    "cartesian product at O(n*m); bucketing by the interval width + 2x "
    "replication of the right side turns it into a plain equi hash join on "
    "(user_id, bucket) with an exact residual range filter — one shuffle, "
    "AQE-skew-safe, the time-series-engine range-join optimization. Oracle is "
    "the naive inequality self-join",
)
def q_range_join_attribution(spark, sf_dir):
    from .operators.rangejoin import bucketed_interval_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = bucketed_interval_join(
        clicks, purchases, keys=["user_id"],
        left_ts="ts", right_ts="ts", interval_seconds=6 * 3600,
    )
    return joined.select(
        "user_id",
        F.col("l_click_id").alias("click_id"),
        F.col("r_purchase_id").alias("purchase_id"),
    ).orderBy("user_id", "click_id", "purchase_id")


@register(
    "streaming_upsert_latest",
    """
    WITH r AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events)
    SELECT user_id, event_id AS last_event_id FROM r WHERE rk = 1
    ORDER BY user_id
    """,
    note="streaming keyed upsert through foreachBatch "
    "(streaming/foreach_upsert.py): each micro-batch merges into the parquet "
    "warehouse keeping the latest row per user (total (ts, event_id) order, so "
    "last-write-wins is deterministic); stateless stream — no watermark, "
    "arbitrarily late keys still upsert. Plain-parquet merge = latest-per-key "
    "+ materialize + overwrite; a table format swaps the batch body for MERGE "
    "INTO. Oracle is the batch latest-per-key window",
)
def q_streaming_upsert_latest(spark, sf_dir):
    from .scratch import scratch_dir
    from .streaming.foreach_upsert import streaming_upsert_parquet

    out_dir = scratch_dir("upsert_out_")
    ck_dir = scratch_dir("upsert_ck_")
    schema, from_nanos = _events_stream_schema(sf_dir)
    if from_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    with _stream_state_partitions(spark):
        q = streaming_upsert_parquet(
            spark, sf_dir, schema, out_dir, ck_dir,
            path_glob="events.parquet",
        )
        q.awaitTermination()
    # nanos-era note: ordering by the raw long ts is order-equivalent
    # to ordering by the decoded timestamp, and ts isn't projected out,
    # so no conversion is needed on either branch
    res = spark.read.parquet(out_dir)
    return res.select(
        "user_id", F.col("event_id").alias("last_event_id")
    ).orderBy("user_id")


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS approx_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="HyperLogLog++ approx_count_distinct per event_type, gated against the exact "
    "distinct in the same plan (operators/approx.py distinct_with_hll_gate; |err| <= "
    "4x rsd) — the oracle asserts the gate, so a drifting sketch fails the hash check",
)
def q_approx_distinct_users(spark, sf_dir):
    from .operators.approx import distinct_with_hll_gate

    e = _t(spark, sf_dir, "events")
    return distinct_with_hll_gate(e, "event_type", "user_id").orderBy("event_type")


@register(
    "approx_quantiles_value",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS exact_p50,
           round(quantile_cont(value, 0.95), 6) AS exact_p95,
           true AS approx_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="Greenwald-Khanna-style percentile_approx (p50/p95) per event_type, gated in "
    "rank space against exact percentiles at p +/- 0.01 (operators/approx.py "
    "quantiles_with_sketch_gate) — sketch drift fails the oracle hash check",
)
def q_approx_quantiles_value(spark, sf_dir):
    from .operators.approx import quantiles_with_sketch_gate

    e = _t(spark, sf_dir, "events")
    return quantiles_with_sketch_gate(e, "event_type", "value").orderBy("event_type")


@register(
    "session_window_agg",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM flagged)
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 1800000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM islands GROUP BY user_id, sess
    ORDER BY user_id, session_start_us
    """,
    note="NATIVE Spark session windows (F.session_window, 30 min gap) vs the manual "
    "lag+cumsum islands oracle; window end = last event + gap per Spark's [start, "
    "last+gap) session semantics (new session when the gap is >= the timeout, hence "
    "the >= in the oracle)",
)
def q_session_window_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start_us")
    )


@register(
    "asof_join_last_purchase",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
    purch AS (
      SELECT user_id, ts, max(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    u AS (
      SELECT user_id, ts, 1 AS tag, event_id, value, NULL::DOUBLE AS pval FROM clicks
      UNION ALL
      SELECT user_id, ts, 0, NULL, NULL, pval FROM purch),
    w AS (
      SELECT user_id, ts, tag, event_id, value,
             last_value(pval IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, tag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pval_asof
      FROM u)
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           round(value, 6) AS value, round(pval_asof, 6) AS pval_asof
    FROM w WHERE tag = 1 ORDER BY event_id
    """,
    note="as-of (point-in-time) join: every click gains the most recent prior purchase "
    "value per user (operators/asof.py asof_join; union + carry-forward, ONE shuffle, "
    "linear — no range-join pair blow-up)",
)
def q_asof_join_last_purchase(spark, sf_dir):
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    out = asof_join(clicks, purchases, key_cols=["user_id"], ts_col="ts")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("value"),
        F.round("pval_asof", 6).alias("pval_asof"),
    ).orderBy("event_id")


@register(
    "streaming_sessionize_state",
    """
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    note="CUSTOM STATEFUL streaming operator via applyInPandasWithState "
    "(streaming/event_windows.py streaming_sessionize_state): per-user (last_ts, "
    "session_count) state, gap>30min opens a session, update-mode emission — must "
    "reproduce the batch sessionize oracle exactly",
)
def q_streaming_sessionize_state(spark, sf_dir):
    import uuid

    agg = streaming_sessionize_state(_events_stream(spark, sf_dir), gap_minutes=30)
    qname = f"stream_sessionize_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    mem = spark.table(qname)
    # update mode re-emits a user's row per micro-batch; the cumulative
    # count is monotone, so max() per user is the final state
    return (
        mem.groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "streaming_funnel_state",
    """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
             min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(CASE WHEN tc > tv AND tp > tc THEN 3
                     WHEN tc > tv THEN 2
                     WHEN tv IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_stage
    FROM f ORDER BY user_id
    """,
    note="stateful streaming funnel via applyInPandasWithState "
    "(streaming/funnel_state.py): per-user state is the order-insensitive "
    "triple of first-occurrence minimums (O(1) per key), so arrival order "
    "within/across micro-batches cannot change the result and no watermark is "
    "needed — the oracle is an exact batch equivalence, the same "
    "classification as funnel_conversion but per user. Stage is monotone, so "
    "update-mode re-emissions collapse with max()",
)
def q_streaming_funnel_state(spark, sf_dir):
    import uuid

    from .streaming.funnel_state import streaming_funnel_state

    agg = streaming_funnel_state(_events_stream(spark, sf_dir))
    qname = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    with _stream_state_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    mem = spark.table(qname)
    return (
        mem.groupBy("user_id")
        .agg(F.max("funnel_stage").alias("funnel_stage"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------- #
# LLM-data-pipeline extensions: text analysis over `documents`
# (SURVEY §7.2 M3; operators in operators/text.py)

# DuckDB token expression mirroring operators.text._tokens
_DUCK_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '[^a-zA-Z0-9]+'),"
    " x -> x <> '')"
)
# DuckDB trigram word-shingle CTE mirroring operators.dedup._shingles(k=3)
_DUCK_SHINGLES = r"""
    toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
                 range(0, greatest(len(toks) - 3, 0) + 1),
                 i -> array_to_string(toks[i+1:i+3], ' '))) AS grams
      FROM toks WHERE len(toks) > 0)
"""

DOC_SHIFT = 1_000_000   # id shift for the self-union dedup fixtures
VEC_SHIFT = 100_000


def _duck_list(words: list[str]) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{inner}]"


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
    note="md5 content fingerprint over normalized text (operators/text.py with_fingerprint; engine-portable)",
)
def q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return with_fingerprint(d).select("doc_id", "fingerprint").orderBy("doc_id")


@register(
    "doc_token_counts",
    r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS INT) AS bpe_tokens
    FROM documents ORDER BY doc_id
    """,
    note="whitespace + BPE-ish token counts (operators/text.py with_token_count; JVM regexp_count, no per-row Python)",
)
def q_doc_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        with_token_count(d)
        .select(
            "doc_id",
            F.col("ws_tokens").cast("int").alias("ws_tokens"),
            F.col("bpe_tokens").cast("int").alias("bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def _lang_id_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    scores = ",\n           ".join(
        f"len(list_intersect(toks, {_duck_list(LANG_MARKERS[lang])})) AS score_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    cases = "\n             ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs[:-1]
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
           {scores}
          FROM toks)
    SELECT doc_id,
           CASE WHEN {best} = 0 THEN 'und'
             {cases}
             ELSE '{langs[-1]}' END AS lang_id
    FROM s ORDER BY doc_id
    """


@register(
    "doc_language_id",
    _lang_id_oracle(),
    note="marker-word language ID, argmax with asc-code tiebreak (operators/text.py with_language_id)",
)
def q_doc_language_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return with_language_id(d).select("doc_id", "lang_id").orderBy("doc_id")


@register(
    "doc_quality_score",
    rf"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             {_DUCK_TOKS} AS toks
      FROM documents),
    ratios AS (
      SELECT doc_id, n_chars,
             len(toks) AS n_words,
             CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_intersect(toks, {_duck_list(STOPWORDS_EN)}))::DOUBLE / len(toks)
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN len(toks) > 0 THEN n_chars::DOUBLE / len(toks) ELSE 0.0 END AS mean_word_len
      FROM feats)
    SELECT doc_id, n_words,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_ratio, 6) AS stop_ratio,
           round(mean_word_len, 6) AS mean_word_len,
           round(least(n_words::DOUBLE / 100.0, 1.0) * 0.4
                 + least(stop_ratio * 5.0, 1.0) * 0.4
                 + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.2, 6) AS quality_score
    FROM ratios ORDER BY doc_id
    """,
    note="heuristic quality features + combined score (operators/text.py with_quality_score; all JVM expressions)",
)
def q_doc_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        with_quality_score(d)
        .select(
            "doc_id",
            "n_words",
            "punct_ratio",
            "stop_ratio",
            "mean_word_len",
            "quality_score",
        )
        .orderBy("doc_id")
    )


@register(
    "word_frequencies",
    f"""
    SELECT word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest({_DUCK_TOKS}) AS word FROM documents)
    GROUP BY word ORDER BY freq DESC, word LIMIT 100
    """,
    note="two-phase distributed word count (operators/text.py word_frequencies; map-side partial agg)",
)
def q_word_frequencies(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return word_frequencies(d).orderBy(F.desc("freq"), F.asc("word")).limit(100)


@register(
    "doc_unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w FROM documents),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
    cnt AS (SELECT w, sum(tf) AS c FROM tf GROUP BY w),
    tot AS (SELECT sum(c) AS n FROM cnt)
    SELECT tf.doc_id,
           round(sum(tf.tf * -ln(cnt.c / tot.n)) / sum(tf.tf), 6) AS avg_nll,
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens
    FROM tf JOIN cnt USING (w), tot
    GROUP BY tf.doc_id ORDER BY tf.doc_id
    """,
    note="unigram NLL perplexity proxy (operators/text.py unigram_logprob, "
    "CCNet-style quality signal; the LM is the corpus itself): per-(doc, "
    "term) counts FIRST so the vocabulary join's skew is bounded by "
    "document frequency (not occurrence count — the naive shape funnels "
    "'the' through one partition), corpus total as an in-plan 1-row "
    "broadcast, token-weighted average; ln() certified at 6-dp rounding, "
    "the tfidf libm-portability contract",
)
def q_doc_unigram_logprob(spark, sf_dir):
    from .operators.text import unigram_logprob

    d = _t(spark, sf_dir, "documents")
    return unigram_logprob(d).orderBy("doc_id")


@register(
    "corpus_health_by_source",
    """
    WITH lang_mix AS (
      SELECT source, lang, count(*) AS nl FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, sum(nl) AS n FROM lang_mix GROUP BY source),
    ent AS (
      SELECT l.source,
             round(-sum((l.nl / t.n) * ln(l.nl / t.n)), 6) AS lang_entropy
      FROM lang_mix l JOIN tot t ON t.source = l.source
      GROUP BY l.source)
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(d.n_chars), 4) AS avg_chars,
           CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           e.lang_entropy
    FROM documents d JOIN ent e ON e.source = d.source
    GROUP BY d.source, e.lang_entropy
    ORDER BY d.source
    """,
    note="per-source corpus health report — the monitoring query a "
    "training-data pipeline runs per ingest batch: volume, mean length, "
    "and the language-mix Shannon entropy per source (a sudden entropy "
    "drop flags a crawler stuck in one language; a spike flags "
    "mis-routed content). Two partial-agged shuffles on the source key "
    "plus a broadcast of the tiny per-source entropy — integral sums "
    "keep avg() exact, entropy under the 6-dp ln() contract",
)
def q_corpus_health_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    lang_mix = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("nl"))
    tot = lang_mix.groupBy("source").agg(F.sum("nl").alias("n"))
    p = F.col("nl") / F.col("n")
    ent = (
        lang_mix.join(tot, "source")
        .groupBy("source")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"))
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .join(F.broadcast(ent), "source")
        .select(
            "source", "n_docs", "avg_chars", "n_langs", "lang_entropy"
        )
        .orderBy("source")
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term),
    dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_t FROM tf GROUP BY term),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln(n.n_docs::DOUBLE / dft.df_t), 6) AS tfidf
      FROM tf JOIN dft USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, tfidf,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
      FROM scored)
    SELECT doc_id, term, tf, tfidf, rank
    FROM ranked WHERE rank <= 3 AND doc_id < 200
    ORDER BY doc_id, rank
    """,
    note="top-3 TF-IDF terms per doc (operators/text.py tfidf_top_terms): two "
    "partial-agged shuffles (doc-term counts, term doc-freqs) + AQE-broadcast "
    "join back + per-doc window top-k; corpus size N stays in-plan as a "
    "broadcast 1-row aggregate — no driver-side count. Ranking compares the "
    "6-dp-rounded score with the term tiebreak so libm ln() ulp differences "
    "can't reorder engines; output bounded to doc_id < 200 for the oracle",
)
def q_tfidf_top_terms(spark, sf_dir):
    from .operators.text import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, k=3)
    return out.filter(F.col("doc_id") < 200).orderBy("doc_id", "rank")


@register(
    "weighted_sample_docs",
    """
    WITH w AS (
      SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS weight,
             round(ln((('0x' || substr(md5('wsample:' || doc_id::VARCHAR), 1, 8))::BIGINT
                       + 0.5) / 4294967296.0) / length(text), 9) AS key
      FROM documents WHERE length(text) > 0),
    r AS (
      SELECT doc_id, lang, weight,
             row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rk
      FROM w)
    SELECT lang, doc_id, weight FROM r WHERE rk <= 5 ORDER BY lang, doc_id
    """,
    note="weighted sampling without replacement, Efraimidis-Spirakis "
    "exponential race (operators/sampling.py weighted_sample_topk): key = "
    "ln(u)/weight with u from the salted-md5 contract — engine-portable, "
    "run-stable, inclusion probability proportional to length(text); top-5 per "
    "lang stratum via one window shuffle (9-dp-rounded key + id tiebreak keeps "
    "both engines' rankings identical)",
)
def q_weighted_sample_docs(spark, sf_dir):
    from .operators.sampling import weighted_sample_topk

    d = _t(spark, sf_dir, "documents").withColumn(
        "weight", F.length("text").cast("long")
    )
    out = weighted_sample_topk(d, weight_col="weight", k=5, strata_col="lang")
    return out.select("lang", "doc_id", "weight").orderBy("lang", "doc_id")


@register(
    "doc_repetition_stats",
    f"""
    WITH ex AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w,
             generate_subscripts({_DUCK_TOKS}, 1) AS pos
      FROM documents),
    l AS (
      SELECT doc_id, w,
             lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
             lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
      FROM ex),
    g AS (
      SELECT doc_id, 2 AS n, w || ' ' || w2 AS gram FROM l WHERE w2 IS NOT NULL
      UNION ALL
      SELECT doc_id, 3, w || ' ' || w2 || ' ' || w3 FROM l WHERE w3 IS NOT NULL),
    c AS (
      SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY doc_id, n, gram)
    SELECT doc_id, n,
           round(max(cnt)::DOUBLE / sum(cnt), 6) AS top_gram_frac,
           round(coalesce(sum(cnt) FILTER (cnt > 1), 0)::DOUBLE / sum(cnt), 6)
             AS dup_gram_frac
    FROM c GROUP BY doc_id, n ORDER BY doc_id, n
    """,
    note="Gopher-style n-gram repetition quality filter (operators/text.py "
    "repetition_stats): per-doc top-gram and duplicate-gram occurrence fractions "
    "for n=2,3 — machine-generated/boilerplate text repeats itself. All-JVM plan: "
    "posexplode + lead() over one doc-key window shuffle, then two-phase gram "
    "counts (high-cardinality fixed-width shuffle key; nothing quadratic in doc "
    "length)",
)
def q_doc_repetition_stats(spark, sf_dir):
    from .operators.text import repetition_stats

    d = _t(spark, sf_dir, "documents")
    return repetition_stats(d).withColumn("n", F.col("n").cast("int")).orderBy(
        "doc_id", "n"
    )


@register(
    "doc_pii_scrub",
    r"""
    WITH w AS (
      SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' now.' AS text
      FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
               '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[PII]', 'g'),
             '\+?[0-9]{1,3}[-.][0-9]{3}[-.][0-9]{3,4}', '[PII]', 'g')
             AS scrubbed,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssn,
           CAST(len(regexp_extract_all(text,
             '\+?[0-9]{1,3}[-.][0-9]{3}[-.][0-9]{3,4}')) AS INT) AS n_phone
    FROM w ORDER BY doc_id
    """,
    note="PII redaction (email/SSN/phone -> '[PII]') over a corpus with "
    "deterministically synthesized PII per doc (the driver corpus has none) — "
    "the privacy-scrub stage of a curation pipeline (operators/text.py scrub_pii). "
    "Sequential JVM regexp_replace, row-local; patterns restricted to the "
    "Java-regex/RE2 common subset so Spark and the DuckDB oracle match exactly",
)
def q_doc_pii_scrub(spark, sf_dir):
    from .operators.text import scrub_pii

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now."),
        ).alias("text"),
    )
    return (
        scrub_pii(d)
        .select("doc_id", "scrubbed", "n_email", "n_ssn", "n_phone")
        .orderBy("doc_id")
    )


@register(
    "doc_chunk_windows",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, greatest(1,
               CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT) + 1)))
               AS chunk_idx
      FROM t WHERE len(toks) > 0)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ')
             AS chunk_text,
           CAST(least(64, n - chunk_idx * 48) AS INT) AS n_tokens
    FROM c ORDER BY doc_id, chunk_idx
    """,
    note="overlapping fixed-size token windows (chunk 64, overlap 16 -> stride 48) — "
    "the context-window packing / RAG-chunking step of an LLM data pipeline "
    "(operators/text.py chunk_text_windows). Pure JVM split->sequence->posexplode->"
    "slice, row-local (no shuffle); output multiplicity IS the operator's product",
)
def q_doc_chunk_windows(spark, sf_dir):
    from .operators.text import chunk_text_windows

    d = _t(spark, sf_dir, "documents")
    return chunk_text_windows(d, chunk_size=64, overlap=16).orderBy(
        "doc_id", "chunk_idx"
    )


# --------------------------------------------------------------------- #
# deterministic sampling / dataset splits (operators/sampling.py)


@register(
    "split_counts",
    """
    SELECT CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train' ELSE 'val' END AS split,
           lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """,
    note="deterministic engine-portable train/val split via salted-md5 bucket "
    "(operators/sampling.py hash_split; row-local, zero shuffle, membership stable "
    "under corpus growth) — counts per (split, lang)",
)
def q_split_counts(spark, sf_dir):
    from .operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    return (
        hash_split(d, train_frac=0.8)
        .groupBy("split", "lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "salted_agg_events",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(value), 6) AS sum_value_r
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="two-phase SALTED aggregation over a low-cardinality key (operators/"
    "sampling.py salted_agg_count, 16 salt parts): hot keys spread across partial "
    "aggregates, merged in phase 2 — oracle pins bit-identity with the unsalted "
    "aggregation (counts/sums are associative)",
)
def q_salted_agg_events(spark, sf_dir):
    from .operators.sampling import salted_agg_count

    e = _t(spark, sf_dir, "events")
    out = salted_agg_count(e, ["event_type"], salt_parts=16, value_col="value")
    return out.select(
        "event_type",
        "n_rows",
        F.round("sum_value", 6).alias("sum_value_r"),
    ).orderBy("event_type")


@register(
    "skew_join_segment",
    """
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 6) AS sum_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    note="explicit salted skew join (operators/skewjoin.py salted_skew_join, 8 "
    "parts): big side salted per-row, small side replicated per salt, so a hot "
    "join key spreads over 8 reducers instead of one — the manual form of AQE "
    "skew-join for the cases AQE can't see. Output is salt-invariant by "
    "construction; the oracle is the plain unsalted join+agg, so the hash check "
    "proves the equivalence",
)
def q_skew_join_segment(spark, sf_dir):
    from .operators.skewjoin import salted_skew_join

    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_skew_join(e, c, ["c_custkey"], salt_parts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "det_sample_ids",
    """
    SELECT doc_id FROM documents
    WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc'
    ORDER BY doc_id
    """,
    note="hash-threshold deterministic ~5% sample (operators/sampling.py "
    "deterministic_sample; row-local filter, no shuffle, reproducible across engines)",
)
def q_det_sample_ids(spark, sf_dir):
    from .operators.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    return deterministic_sample(d, fraction=0.05).select("doc_id").orderBy("doc_id")


@register(
    "exact_k_sample_docs",
    """
    WITH s AS (
      SELECT doc_id, lang, source
      FROM documents
      ORDER BY md5('ksample:' || CAST(doc_id AS VARCHAR)), doc_id
      LIMIT 100)
    SELECT doc_id, lang, source FROM s ORDER BY doc_id
    """,
    note="exactly-k uniform sample (operators/sampling.py exact_k_sample): the "
    "100 smallest salted-md5 digests — the fixed-budget companion to the "
    "hash-threshold sample (whose size is binomial).  ORDER BY hash LIMIT k "
    "plans as TakeOrderedAndProject: per-partition k-row heaps + one merge of "
    "k x partitions rows, never a full sort — the eval-slice / human-review "
    "draw a curation pipeline makes at fixed budget",
)
def q_exact_k_sample_docs(spark, sf_dir):
    from .operators.sampling import exact_k_sample

    d = _t(spark, sf_dir, "documents")
    return (
        exact_k_sample(d, k=100)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "stratified_sample_docs",
    """
    WITH h AS (
      SELECT doc_id, lang,
             substr(md5('strata:' || CAST(doc_id AS VARCHAR)), 1, 4) AS hk
      FROM documents),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM h)
    SELECT doc_id, lang FROM r WHERE rk <= ceil(n * 0.2) ORDER BY doc_id
    """,
    note="exact-count stratified sample, ceil(0.2 x |stratum|) docs per lang chosen "
    "by hash order (operators/sampling.py stratified_exact_sample; one window shuffle)",
)
def q_stratified_sample_docs(spark, sf_dir):
    from .operators.sampling import stratified_exact_sample

    d = _t(spark, sf_dir, "documents")
    return (
        stratified_exact_sample(d, strata_col="lang", fraction=0.2)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "mixture_sample_docs",
    """
    WITH c AS (
      SELECT doc_id, lang,
             CASE lang
               WHEN 'en' THEN 0 + CASE WHEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4)
                                            < '8000' THEN 1 ELSE 0 END
               WHEN 'zh' THEN 2 + CASE WHEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4)
                                            < '4000' THEN 1 ELSE 0 END
               ELSE 1
             END AS n_copies
      FROM documents)
    SELECT doc_id, lang,
           CAST(unnest(range(0, n_copies)) AS INT) AS copy_idx
    FROM c ORDER BY doc_id, copy_idx
    """,
    note="per-language mixture resampling (operators/sampling.py mixture_sample): "
    "en x0.5 (hash-threshold downsample), zh x2.25 (explode upsample with a "
    "deterministic fractional third copy), other langs x1 — the domain re-weighting "
    "step of a training-data mix; zero shuffle, rates quantized to 1/65536",
)
def q_mixture_sample_docs(spark, sf_dir):
    from .operators.sampling import mixture_sample

    d = _t(spark, sf_dir, "documents")
    return (
        mixture_sample(d, "lang", {"en": 0.5, "zh": 2.25})
        .select("doc_id", "lang", "copy_idx")
        .orderBy("doc_id", "copy_idx")
    )


@register(
    "pack_token_bins_docs",
    r"""
    WITH RECURSIVE t AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents),
    p AS (
      SELECT lang, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS bin_idx, n_tokens AS bin_fill
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.lang, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN p.bin_fill + t.n_tokens > 256
                  THEN p.bin_idx + 1 ELSE p.bin_idx END,
             CASE WHEN p.bin_fill + t.n_tokens > 256
                  THEN t.n_tokens ELSE p.bin_fill + t.n_tokens END
      FROM p JOIN t ON t.lang = p.lang AND t.rn = p.rn + 1)
    SELECT doc_id, lang, n_tokens, bin_idx, bin_fill
    FROM p ORDER BY doc_id
    """,
    note="greedy sequential token-bin packing per language, capacity 256 ws-tokens "
    "(operators/packing.py pack_token_bins): the sequence-packing step before "
    "tokenized-shard writing. One shuffle on the group key, Arrow-batched linear "
    "scan per group; oracle reproduces the greedy rule with a recursive CTE, so "
    "the full per-doc bin assignment is hash-checked",
)
def q_pack_token_bins_docs(spark, sf_dir):
    from .operators.packing import pack_token_bins

    d = _t(spark, sf_dir, "documents")
    toks = d.withColumn(
        "n_tokens",
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
        ).cast("long"),
    )
    return pack_token_bins(toks, "n_tokens", 256, "lang").orderBy("doc_id")


@register(
    "kmeans_clusters",
    """
    WITH init AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)),
    dims AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS pos
      FROM (SELECT embedding FROM embeddings LIMIT 1)),
    c0 AS (
      SELECT i.cid, d.pos, round(i.embedding[d.pos]::DOUBLE, 6) AS v
      FROM init i CROSS JOIN dims d),
    a1 AS (
      SELECT e.vec_id, c.cid,
             round(sum((e.embedding[c.pos]::DOUBLE - c.v)
                       * (e.embedding[c.pos]::DOUBLE - c.v)), 6) AS d
      FROM embeddings e CROSS JOIN c0 c
      GROUP BY e.vec_id, c.cid),
    s1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM a1) WHERE rn = 1),
    upd AS (
      SELECT s1.cid, d.pos, avg(e.embedding[d.pos]::DOUBLE) AS v
      FROM s1 JOIN embeddings e USING (vec_id) CROSS JOIN dims d
      GROUP BY s1.cid, d.pos),
    c1 AS (
      SELECT c0.cid, c0.pos, round(coalesce(u.v, c0.v), 6) AS v
      FROM c0 LEFT JOIN upd u ON u.cid = c0.cid AND u.pos = c0.pos),
    a2 AS (
      SELECT e.vec_id, c.cid,
             round(sum((e.embedding[c.pos]::DOUBLE - c.v)
                       * (e.embedding[c.pos]::DOUBLE - c.v)), 6) AS d
      FROM embeddings e CROSS JOIN c1 c
      GROUP BY e.vec_id, c.cid)
    SELECT vec_id, CAST(cid AS INT) AS cluster FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM a2) WHERE rn = 1
    ORDER BY vec_id
    """,
    note="distributed k-means, k=8, one Lloyd iteration + final assignment "
    "(operators/clustering.py kmeans_fit_predict) — the IVF coarse-quantizer "
    "trainer behind knn_blocked_lsh. Assignment = broadcast centroids into an "
    "Arrow argmin kernel (zero shuffle); update = posexplode + per-(cluster,pos) "
    "mean (map-side partials, k x dim collected = the model). Deterministic "
    "contract (round-before-argmin, lowest-cid ties, first-k init) lets the "
    "oracle unroll both iterations in SQL — full per-vector assignment hash-checked",
)
def q_kmeans_clusters(spark, sf_dir):
    from .operators.clustering import kmeans_fit_predict

    e = _t(spark, sf_dir, "embeddings")
    out, _cents = kmeans_fit_predict(e, k=8, n_iter=1, round_dp=6)
    return out.select("vec_id", "cluster").orderBy("vec_id")


# --------------------------------------------------------------------- #
# deduplication over `documents` (operators/dedup.py)
#
# The driver corpus has no exact duplicates, so the exact-dedup queries
# run over a self-union with shifted ids — every text occurs exactly
# twice with a known keeper (min id), making the operator's effect
# observable and oracle-checkable rather than a vacuous identity.


def _docs_self_union(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionAll(
        d.select((F.col("doc_id") + DOC_SHIFT).alias("doc_id"), "text")
    )


@register(
    "exact_dedup_keep",
    rf"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DOC_SHIFT}, text FROM documents)
    SELECT min(doc_id) AS doc_id
    FROM u GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
    ORDER BY doc_id
    """,
    note="exact dedup keep-min-id over a self-union (operators/dedup.py exact_dedup; one hash shuffle + semi-join)",
)
def q_exact_dedup_keep(spark, sf_dir):
    u = _docs_self_union(spark, sf_dir)
    return exact_dedup(u).select("doc_id").orderBy("doc_id")


@register(
    "exact_dedup_groups",
    rf"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DOC_SHIFT}, text FROM documents)
    SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
    FROM u GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
    HAVING count(*) > 1 ORDER BY keep_id
    """,
    note="duplicate groups: representative id + multiplicity (operators/dedup.py exact_dedup_pairs)",
)
def q_exact_dedup_groups(spark, sf_dir):
    u = _docs_self_union(spark, sf_dir)
    return exact_dedup_pairs(u).select("keep_id", "n_dups").orderBy("keep_id")


@register(
    "minhash_near_dup",
    f"""
    WITH {_DUCK_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.grams, b.grams))::DOUBLE
               / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard
    FROM pairs WHERE jaccard >= 0.7 ORDER BY id_a, id_b
    """,
    note="MinHash(64)+LSH(16 bands) near-dup pairs, exact-Jaccard verified; oracle is "
    "brute force — LSH at these parameters catches every pair with j>=0.7 deterministically "
    "(miss prob < 2% per pair, 0 on this corpus; operators/dedup.py minhash_near_dup_pairs)",
)
def q_minhash_near_dup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(d, threshold=0.7)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


@register(
    "ngram_jaccard_block_lang",
    f"""
    WITH {_DUCK_SHINGLES.replace("FROM documents", "FROM documents WHERE doc_id < 500")},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.grams, b.grams))::DOUBLE
               / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang)
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard
    FROM pairs WHERE jaccard >= 0.5 ORDER BY id_a, id_b
    """,
    note="exact n-gram Jaccard within lang blocks on a bounded 500-doc slice "
    "(operators/dedup.py ngram_jaccard_pairs) — the operator is a *verify stage*; "
    "its within-block self-join is near-quadratic, so the graded query bounds the input "
    "the way a candidate generator (MinHash/SimHash) would upstream",
)
def q_ngram_jaccard_block_lang(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = ngram_jaccard_pairs(d, block_col="lang", n=3, threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


# shingle CTE over the self-union (no lang blocking) for the
# connected-components oracles below
_DUCK_SHINGLES_U = rf"""
    u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DOC_SHIFT}, text FROM documents),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM u),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
                 range(0, greatest(len(toks) - 3, 0) + 1),
                 i -> array_to_string(toks[i+1:i+3], ' '))) AS grams
      FROM toks WHERE len(toks) > 0),
    e AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.7),
    reach(node, lab) AS (
      SELECT doc_id, doc_id FROM u
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
    comp AS (
      SELECT node AS doc_id, min(lab) AS component_id
      FROM reach GROUP BY node)
"""


@register(
    "dup_connected_components",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLES_U}
    SELECT doc_id, component_id FROM comp ORDER BY doc_id
    """,
    note="duplicate-cluster connected components over the MinHash near-dup pair "
    "graph (operators/components.py connected_components): iterative min-label "
    "propagation, one edge-join + one partial-agg shuffle per round, "
    "O(diameter) rounds, only a scalar changed-count per round on the driver; "
    "oracle recomputes the exact Jaccard>=0.7 edge set and closes it with a "
    "recursive CTE, certifying pair detection AND transitive clustering",
)
def q_dup_connected_components(spark, sf_dir):
    from .operators.components import connected_components

    u = _docs_self_union(spark, sf_dir)
    pairs = minhash_near_dup_pairs(u, threshold=0.7)
    comp = connected_components(
        u.select("doc_id"), pairs, id_col="doc_id"
    )
    return comp.orderBy("doc_id")


@register(
    "dup_cluster_sizes",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLES_U}
    SELECT component_id, CAST(count(*) AS BIGINT) AS n_members,
           min(doc_id) AS keeper_id
    FROM comp GROUP BY component_id
    HAVING count(*) > 1 ORDER BY component_id
    """,
    note="duplicate-cluster roll-up (operators/components.py component_summary): "
    "size + keeper per non-singleton component — the curation decision surface "
    "(keep one doc per cluster); one shuffle over the component labels",
)
def q_dup_cluster_sizes(spark, sf_dir):
    from .operators.components import component_summary, connected_components

    u = _docs_self_union(spark, sf_dir)
    pairs = minhash_near_dup_pairs(u, threshold=0.7)
    comp = connected_components(u.select("doc_id"), pairs, id_col="doc_id")
    return (
        component_summary(comp)
        .filter(F.col("n_members") > 1)
        .select("component_id", "n_members", "keeper_id")
        .orderBy("component_id")
    )


@register(
    "doc_length_stats",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_chars), 6) AS mean_chars,
           round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
           round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
           round(quantile_cont(n_chars, 0.99), 6) AS p99_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    note="per-language corpus length distribution via EXACT percentiles "
    "(Spark SQL percentile(), linear interpolation — same definition as "
    "DuckDB quantile_cont): the corpus-reporting companion to the "
    "approx_quantiles sketch queries; one partial-agged shuffle on lang. At "
    "100 TB the sketch flavor is the default and this exact flavor runs on "
    "sampled slices — both are registered so the trade-off is explicit",
)
def q_doc_length_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90_chars"),
            F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99_chars"),
        )
        .orderBy("lang")
    )


@register(
    "decontaminate_overlap",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
                 range(0, greatest(len(toks) - 5, 0) + 1),
                 i -> array_to_string(toks[i+1:i+5], ' '))) AS grams
      FROM toks WHERE len(toks) > 0),
    cg AS (SELECT doc_id AS corpus_id, unnest(grams) AS gram
           FROM sh WHERE doc_id % 50 <> 0),
    bg AS (SELECT doc_id AS bench_id, unnest(grams) AS gram
           FROM sh WHERE doc_id % 50 = 0)
    SELECT c.corpus_id, b.bench_id,
           CAST(count(DISTINCT c.gram) AS BIGINT) AS n_shared
    FROM cg c JOIN bg b USING (gram)
    GROUP BY corpus_id, bench_id
    ORDER BY corpus_id, bench_id
    """,
    note="benchmark decontamination (operators/dedup.py "
    "ngram_contamination_pairs): corpus docs sharing distinct word 5-grams with "
    "a held-out eval slice (doc_id % 50 == 0) — the n-gram collision check LLM "
    "pipelines run before training. Arrow shingle kernel row-local on both "
    "sides, inverted-index join on xxhash64(gram) with string-equality residual "
    "(collisions can't fabricate overlap), benchmark side broadcast, one "
    "partial-agged pair-key shuffle",
)
def q_decontaminate_overlap(spark, sf_dir):
    from .operators.dedup import ngram_contamination_pairs

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    out = ngram_contamination_pairs(corpus, bench, n=5)
    return out.orderBy("corpus_id", "bench_id")


@register(
    "decontaminated_corpus",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
                 range(0, greatest(len(toks) - 5, 0) + 1),
                 i -> array_to_string(toks[i+1:i+5], ' '))) AS grams
      FROM toks WHERE len(toks) > 0),
    cg AS (SELECT doc_id AS corpus_id, unnest(grams) AS gram
           FROM sh WHERE doc_id % 50 <> 0),
    bg AS (SELECT doc_id AS bench_id, unnest(grams) AS gram
           FROM sh WHERE doc_id % 50 = 0),
    contaminated AS (SELECT DISTINCT c.corpus_id FROM cg c JOIN bg b USING (gram))
    SELECT doc_id FROM documents
    WHERE doc_id % 50 <> 0
      AND doc_id NOT IN (SELECT corpus_id FROM contaminated)
    ORDER BY doc_id
    """,
    note="the actionable decontamination step: corpus minus every doc sharing a "
    "5-gram with the eval slice — contamination pair set (see "
    "decontaminate_overlap) distinct-projected to ids and LEFT ANTI joined "
    "against the corpus; the anti-join build side is the (small) contaminated "
    "id set, broadcast by AQE",
)
def q_decontaminated_corpus(spark, sf_dir):
    from .operators.dedup import ngram_contamination_pairs

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    dirty = (
        ngram_contamination_pairs(corpus, bench, n=5)
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    return (
        corpus.join(dirty, on="doc_id", how="left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


def _curation_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    scores = ",\n             ".join(
        f"len(list_intersect(toks, {_duck_list(LANG_MARKERS[lang])})) AS score_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    return rf"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DOC_SHIFT}, text FROM documents),
    toksed AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM u),
    feats AS (
      SELECT doc_id, text, toks,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             len(toks) AS n_words,
             {scores}
      FROM toksed),
    kept AS (
      SELECT doc_id, text, toks FROM feats
      WHERE {best} > 0
        AND n_words >= 10
        AND round(CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars
                       ELSE 0.0 END, 6) <= 0.2),
    uniq AS (
      SELECT min(doc_id) AS doc_id
      FROM kept GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))),
    sh AS (
      SELECT k.doc_id,
             list_distinct(list_transform(
                 range(0, greatest(len(k.toks) - 3, 0) + 1),
                 i -> array_to_string(k.toks[i+1:i+3], ' '))) AS grams
      FROM kept k JOIN uniq USING (doc_id)),
    neardup AS (
      SELECT b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.7)
    SELECT doc_id FROM uniq
    WHERE doc_id NOT IN (SELECT id_b FROM neardup)
    ORDER BY doc_id
    """


@register(
    "curation_pipeline",
    _curation_oracle(),
    note="end-to-end corpus curation: language-ID gate + quality gate (word count, "
    "punctuation ratio) + exact dedup (keep min id) + near-dup removal (trigram "
    "Jaccard >= 0.7 via the inverted-index join, drop the non-minimal side of every "
    "pair) — the composed pipeline an LLM-data user runs; each stage is the "
    "already-audited operator (operators/text.py, operators/dedup.py)",
)
def q_curation_pipeline(spark, sf_dir):
    from .scratch import scratch_dir

    u = _docs_self_union(spark, sf_dir)
    scored = with_quality_score(with_language_id(u))
    kept = scored.filter(
        (F.col("lang_id") != "und")
        & (F.col("n_words") >= 10)
        & (F.col("punct_ratio") <= 0.2)
    )
    uniq = exact_dedup(kept).select(
        "doc_id", shingles_udf(3)(F.col("text")).alias("grams")
    )
    # stage materialization: the near-dup self-join + the survivor
    # anti-join would otherwise re-execute the whole gate+dedup chain
    # 3x (once per join input) and the shingle UDF twice.  Checkpointing
    # the surviving (doc_id, grams) slice to parquet runs both once —
    # the production pattern at 100 TB too: each curation stage
    # persists, downstream stages scan the materialized table.
    tmp = scratch_dir("curation_uniq_")
    uniq.write.mode("overwrite").parquet(tmp)
    uniq = spark.read.parquet(tmp)
    pairs = ngram_jaccard_pairs_from_grams(uniq, block_col=None, threshold=0.7)
    survivors = uniq.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        on="doc_id",
        how="left_anti",
    )
    return survivors.select("doc_id").orderBy("doc_id")


def _simhash_md5_oracle_sql() -> str:
    """Generate the DuckDB spelling of the md5-SimHash pair set.

    Mirrors operators/dedup.py simhash_md5_signatures expression by
    expression (same tokenizer regex, same md5-prefix hashes, same
    ±1 bit votes), then checks the BLOCKED Spark pair set against the
    exact O(n²) pair set — certifying both the signature math and the
    pigeonhole blocking's zero-miss guarantee in one hash compare.
    """
    sums = ",\n           ".join(
        f"sum(CASE WHEN ({col} & {1 << b}) <> 0 THEN 1 ELSE -1 END) AS s_{half}_{b}"
        for half, col in (("hi", "h_hi"), ("lo", "h_lo"))
        for b in range(32)
    )

    def pack(half: str) -> str:
        return " + ".join(
            f"CASE WHEN s_{half}_{b} > 0 THEN {1 << b} ELSE 0 END"
            for b in range(32)
        )

    return f"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DOC_SHIFT}, text FROM documents),
    toks AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
      FROM u),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_hi,
             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_lo
      FROM toks),
    s AS (
      SELECT doc_id,
           {sums}
      FROM h GROUP BY doc_id),
    sig AS (
      SELECT doc_id,
             CAST({pack("hi")} AS BIGINT) AS sig_hi,
             CAST({pack("lo")} AS BIGINT) AS sig_lo
      FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.sig_hi, b.sig_hi))
                  + bit_count(xor(a.sig_lo, b.sig_lo)) AS INT) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    ORDER BY id_a, id_b
    """


@register(
    "simhash_near_dup",
    _simhash_md5_oracle_sql(),
    note="SimHash(64) near-dup pairs, hash-certified end-to-end: md5-prefix token "
    "hashes via the Arrow signature kernel (operators/dedup.py "
    "_simhash_md5_kernel — bit-identical to the engine-portable 65-aggregate JVM "
    "expression flavor, parity-pinned in tests/test_dedup.py, and ~1.5 s less "
    "fresh-plan latency), 16-bit pigeonhole blocking + bit_count verify; the "
    "oracle recomputes signatures in SQL and takes the exact O(n^2) pair set, so "
    "the hash compare certifies signature math AND proves the blocking misses "
    "nothing. The FNV-kernel flavor (simhash_near_dup_pairs) stays available, "
    "bit-pinned by tests/test_dedup.py",
)
def q_simhash_near_dup(spark, sf_dir):
    # self-union: identical texts have identical signatures (hamming 0),
    # so the pair set is non-empty and deterministic
    u = _docs_self_union(spark, sf_dir)
    pairs = simhash_md5_near_dup_pairs(u, max_hamming=3)
    return pairs.select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")


# --------------------------------------------------------------------- #
# similarity search over `embeddings` (operators/similarity.py)

_DUCK_COSINE = """
      list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
         * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))
"""


@register(
    "cosine_topk",
    f"""
    SELECT b.vec_id, round({_DUCK_COSINE}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id = 0
    ORDER BY cosine DESC, b.vec_id LIMIT 10
    """,
    note="exact cosine top-k against the vec_id=0 query (operators/similarity.py "
    "cosine_topk_bruteforce; zip_with/aggregate score, TakeOrdered — no full sort)",
)
def q_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    # round_dp=6: rank the rounded score so a boundary tie resolves by
    # vec_id exactly like the oracle (which orders by its rounded alias)
    topk = cosine_topk_bruteforce(e, qvec, k=10, round_dp=6)
    return topk.select("vec_id", "cosine").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )


def _lsh_topk_oracle(bits: int = 6, seed: int = 42, dim: int = 64) -> str:
    """DuckDB oracle reproducing the sign-LSH multiprobe exactly: the
    hyperplanes are the same deterministic numpy draw embedded as
    literal arrays, the query bucket comes from vec_id=0 in SQL, and
    the probe set is the bucket plus its hamming-1 neighbors."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]" for p in planes
    ]

    def bucket(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({col}, {lits[b]}) >= 0 "
            f"THEN {1 << b} ELSE 0 END)"
            for b in range(bits)
        )

    probes = ["b.bkt = q.qb"] + [
        f"b.bkt = xor(q.qb, {1 << i})" for i in range(bits)
    ]
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    q AS (SELECT emb AS qemb, {bucket('emb')} AS qb FROM v WHERE vec_id = 0),
    b AS (SELECT vec_id, emb, {bucket('emb')} AS bkt FROM v),
    cand AS (
      SELECT b.vec_id, b.emb, q.qemb FROM b, q WHERE {' OR '.join(probes)}),
    scored AS (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(emb, emb))
                       * sqrt(list_dot_product(qemb, qemb)) > 0
                  THEN list_dot_product(emb, qemb)
                       / (sqrt(list_dot_product(emb, emb))
                          * sqrt(list_dot_product(qemb, qemb)))
                  ELSE 0.0 END AS cosine
      FROM cand)
    SELECT vec_id, round(cosine, 6) AS cosine
    FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
    """


@register(
    "cosine_topk_lsh",
    _lsh_topk_oracle(),
    note="sign-LSH bucketed ANN top-k with hamming-1 multiprobe (operators/similarity.py "
    "cosine_topk_lsh); oracle reproduces bucket + probe set from the same deterministic "
    "hyperplane draw (hash-checked, was rows-only through r2); recall vs brute force "
    "also asserted in tests/test_similarity.py",
)
def q_cosine_topk_lsh(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    # round_dp=6: rank the rounded score so a boundary tie resolves by
    # vec_id exactly like the oracle (advisor-flagged r3 tiebreak gap)
    topk = cosine_topk_lsh(e, qvec, k=10, bits=6, round_dp=6)
    return topk.select("vec_id", "cosine").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )


@register(
    "knn_allpairs_small",
    f"""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    pairs AS (
      SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
             {_DUCK_COSINE.replace("a.embedding", "a.embedding").replace("b.embedding", "b.embedding")} AS cosine
      FROM sub a JOIN sub b ON a.vec_id <> b.vec_id),
    ranked AS (
      SELECT src_id, nbr_id, cosine,
             CAST(row_number() OVER (PARTITION BY src_id
                                     ORDER BY cosine DESC, nbr_id) AS INT) AS rank
      FROM pairs)
    SELECT src_id, nbr_id, round(cosine, 6) AS cosine, rank
    FROM ranked WHERE rank <= 5 ORDER BY src_id, rank
    """,
    note="RECALL-ORACLE ONLY, input-bounded by contract: exact k-NN all-pairs on a "
    "<=100-vector slice (operators/similarity.py knn_all_pairs_bruteforce). The "
    "operator is deliberately O(n^2) within a block — it exists to measure ANN "
    "recall; the production-scale registered form is knn_blocked_lsh (per-bucket "
    "Arrow kernel, no global self-join)",
)
def q_knn_allpairs_small(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    knn = knn_all_pairs_bruteforce(e, k=5)
    return knn.select(
        "src_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("src_id", "rank")


def _knn_blocked_oracle(bits: int = 4, seed: int = 42, dim: int = 64, k: int = 5) -> str:
    """DuckDB oracle for the LSH-blocked k-NN: buckets from the same
    deterministic hyperplane draw embedded as literals, within-bucket
    pairs, rank by the 6-dp-rounded cosine with nbr_id tiebreak (the
    Spark kernel rounds before ranking too, so the orders coincide)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {lits[b]}) >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    b AS (SELECT vec_id, emb, {bucket} AS bkt FROM v),
    pairs AS (
      SELECT a.vec_id AS src_id, c.vec_id AS nbr_id,
             round(CASE WHEN sqrt(list_dot_product(a.emb, a.emb))
                             * sqrt(list_dot_product(c.emb, c.emb)) > 0
                        THEN list_dot_product(a.emb, c.emb)
                             / (sqrt(list_dot_product(a.emb, a.emb))
                                * sqrt(list_dot_product(c.emb, c.emb)))
                        ELSE 0.0 END, 6) AS cosine
      FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id <> c.vec_id),
    ranked AS (
      SELECT src_id, nbr_id, cosine,
             CAST(row_number() OVER (PARTITION BY src_id
                                     ORDER BY cosine DESC, nbr_id) AS INT) AS rank
      FROM pairs)
    SELECT src_id, nbr_id, cosine, rank
    FROM ranked WHERE rank <= {k} ORDER BY src_id, rank
    """


@register(
    "knn_blocked_lsh",
    _knn_blocked_oracle(),
    note="LSH-blocked k-NN over the whole embeddings table — the scale path "
    "knn_allpairs_small is the recall oracle for: sign-LSH(4 bits) coarse "
    "partition, then one Arrow numpy matmul per bucket emits only top-5 per "
    "source (operators/similarity.py knn_within_blocks). O(b^2) per bucket, "
    "single shuffle on the bucket key, no global self-join; the IVF pattern "
    "at 100 TB with a learned coarse quantizer in place of LSH",
)
def q_knn_blocked_lsh(spark, sf_dir):
    from .operators.similarity import knn_within_blocks, lsh_bucket_batched

    # Arrow-batched bucket kernel: same hyperplane draw as the JVM
    # lsh_bucket (pytest-pinned agreement) but one numpy matmul per
    # Arrow batch instead of `bits` interpreted HOF folds per row
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "block", lsh_bucket_batched(F.col("embedding"), dim=64, bits=4, seed=42)
    )
    knn = knn_within_blocks(e, k=5, block_col="block")
    return knn.select("src_id", "nbr_id", "cosine", "rank").orderBy(
        "src_id", "rank"
    )


def _hard_negatives_oracle(
    bits: int = 4, seed: int = 42, dim: int = 64, k: int = 5,
    ceiling: float = 0.95,
) -> str:
    """Same hyperplane-literal bucketing as `_knn_blocked_oracle`, with
    the hard-negative constraints: different label, 6-dp cosine at or
    below the near-dup ceiling."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]" for p in planes
    ]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {lits[b]}) >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
    b AS (SELECT vec_id, label, emb, {bucket} AS bkt FROM v),
    pairs AS (
      SELECT a.vec_id AS src_id, c.vec_id AS nbr_id,
             round(CASE WHEN sqrt(list_dot_product(a.emb, a.emb))
                             * sqrt(list_dot_product(c.emb, c.emb)) > 0
                        THEN list_dot_product(a.emb, c.emb)
                             / (sqrt(list_dot_product(a.emb, a.emb))
                                * sqrt(list_dot_product(c.emb, c.emb)))
                        ELSE 0.0 END, 6) AS cosine
      FROM b a JOIN b c
        ON a.bkt = c.bkt AND a.vec_id <> c.vec_id AND a.label <> c.label),
    ranked AS (
      SELECT src_id, nbr_id, cosine,
             CAST(row_number() OVER (PARTITION BY src_id
                                     ORDER BY cosine DESC, nbr_id) AS INT) AS rank
      FROM pairs WHERE cosine <= {ceiling})
    SELECT src_id, nbr_id, cosine, rank
    FROM ranked WHERE rank <= {k} ORDER BY src_id, rank
    """


@register(
    "hard_negatives_topk",
    _hard_negatives_oracle(),
    note="hard-negative mining for contrastive training (operators/"
    "similarity.py hard_negatives_within_blocks): per vector, the top-5 "
    "most-similar OTHER-labeled vectors with 6-dp cosine <= 0.95 — "
    "same-label candidates are false negatives for the loss, and "
    "above-ceiling pairs are near-dups that would teach the model to "
    "split duplicates. Same scale shape as knn_blocked_lsh: sign-LSH "
    "coarse blocks, one Arrow matmul per block, top-k per source, one "
    "shuffle — the constraint masks run inside the kernel on the "
    "rounded cosine so the ceiling compares identically to the oracle",
)
def q_hard_negatives_topk(spark, sf_dir):
    from .operators.similarity import (
        hard_negatives_within_blocks,
        lsh_bucket_batched,
    )

    e = _t(spark, sf_dir, "embeddings").withColumn(
        "block", lsh_bucket_batched(F.col("embedding"), dim=64, bits=4, seed=42)
    )
    mined = hard_negatives_within_blocks(e, k=5, block_col="block")
    return mined.select("src_id", "nbr_id", "cosine", "rank").orderBy(
        "src_id", "rank"
    )


@register(
    "embedding_norm_stats",
    """
    WITH n AS (
      SELECT label,
             sqrt(list_dot_product(
               list_transform(embedding, x -> x::DOUBLE),
               list_transform(embedding, x -> x::DOUBLE))) AS nrm
      FROM embeddings)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(nrm), 6) AS avg_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM n GROUP BY label ORDER BY label
    """,
    note="embedding L2-norm distribution per label — the vector sanity "
    "gate before ANN/dedup (zero or wild norms break cosine). Exercises "
    "the Catalyst higher-order-function surface (aggregate() fold for the "
    "dot product) on an O(rows) pass; HOFs are interpreted (~100 us/eval "
    "at dim 64) so this shape is for reporting volumes — candidate-verify "
    "volumes use the Arrow kernels (see _cosine_pairs_udf), the split the "
    "repo applies everywhere",
)
def q_embedding_norm_stats(spark, sf_dir):
    from .operators.similarity import _norm

    e = _t(spark, sf_dir, "embeddings")
    n = e.select("label", _norm(F.col("embedding")).alias("nrm"))
    return (
        n.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


@register(
    "embedding_dup_pairs",
    f"""
    WITH u AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {VEC_SHIFT}, embedding FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_DUCK_COSINE} AS cosine
      FROM u a JOIN u b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, round(cosine, 6) AS cosine
    FROM pairs WHERE cosine >= 0.95 ORDER BY id_a, id_b
    """,
    note="embedding near-dup pairs at cosine>=0.95 with multi-table sign-LSH blocking "
    "(operators/dedup.py embedding_cosine_dup_pairs; 8 bits x 12 tables -> recall 0.999 "
    "at c=0.95, exact for true dups; recall-vs-bruteforce on perturbed vectors asserted "
    "in tests/test_dedup.py) over a self-union fixture",
)
def q_embedding_dup_pairs(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    u = e.unionAll(
        e.select((F.col("vec_id") + VEC_SHIFT).alias("vec_id"), "embedding")
    )
    pairs = embedding_cosine_dup_pairs(u, threshold=0.95, dim=64)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


@register(
    "semantic_dedup_clusters",
    f"""
    WITH RECURSIVE u AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {VEC_SHIFT}, embedding FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM u a JOIN u b ON a.vec_id < b.vec_id
      WHERE {_DUCK_COSINE} >= 0.95),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
    reach(node, lab) AS (
      SELECT vec_id, vec_id FROM u
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
    comp AS (SELECT node AS vec_id, min(lab) AS component_id
             FROM reach GROUP BY node)
    SELECT component_id, CAST(count(*) AS BIGINT) AS n_members,
           min(vec_id) AS keeper_id
    FROM comp GROUP BY component_id
    HAVING count(*) > 1 ORDER BY component_id
    """,
    note="SemDeDup-style semantic deduplication (Abbas et al. 2023, "
    "public method): cosine>=0.95 neighbor pairs from the certified "
    "multi-table sign-LSH generator (operators/dedup.py "
    "embedding_cosine_dup_pairs) closed into clusters by min-label "
    "propagation (operators/components.py) — one keeper per semantic "
    "cluster is the curation decision.  Same scale shape as the text "
    "CC query: LSH-blocked candidate generation, per-round edge join + "
    "partial-agg shuffle, scalar-only driver traffic; oracle recomputes "
    "exact cosine pairs and closes them with a recursive CTE, "
    "certifying neighbor detection AND transitive clustering",
)
def q_semantic_dedup_clusters(spark, sf_dir):
    from .operators.components import component_summary, connected_components

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    u = e.unionAll(
        e.select((F.col("vec_id") + VEC_SHIFT).alias("vec_id"), "embedding")
    )
    pairs = embedding_cosine_dup_pairs(u, threshold=0.95, dim=64)
    comp = connected_components(
        u.select("vec_id"), pairs, id_col="vec_id"
    )
    return (
        component_summary(comp, id_col="vec_id")
        .filter(F.col("n_members") > 1)
        .select("component_id", "n_members", "keeper_id")
        .orderBy("component_id")
    )


@register(
    "quantization_error_by_label",
    """
    WITH s AS (
      SELECT vec_id, label, embedding,
             greatest(list_max(list_transform(embedding,
                                              x -> abs(CAST(x AS DOUBLE))))
                        / 127.0, 1e-12) AS scale
      FROM embeddings),
    e AS (
      SELECT vec_id, label,
             list_transform(embedding,
                 x -> CAST(x AS DOUBLE)
                      - round(CAST(x AS DOUBLE) / scale) * scale) AS errs,
             len(embedding) AS dim,
             len(list_filter(list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)),
                 q -> abs(q) >= 127)) AS n_sat
      FROM s),
    v AS (
      SELECT label,
             sqrt(list_sum(list_transform(errs, x -> x * x)) / dim) AS rmse,
             list_max(list_transform(errs, x -> abs(x))) AS maxerr,
             n_sat
      FROM e)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(rmse), 6) AS mean_rmse,
           round(max(maxerr), 6) AS max_abs_err,
           CAST(sum(n_sat) AS BIGINT) AS n_saturated
    FROM v GROUP BY label ORDER BY label
    """,
    note="int8 quantization-error audit per label — the quality gate on "
    "the 4x ANN-index compression (operators/quantize.py contract: "
    "scale = max|x|/127, q = round(x/scale)): per-vector reconstruction "
    "RMSE, worst elementwise error, and saturation counts, rolled up "
    "per label.  Row-local HOFs on reporting volume (the established "
    "split), one partial-agged shuffle; round-half parity between "
    "engines is the same contract the quantize query already "
    "hash-certifies",
)
def q_quantization_error_by_label(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(xd, F.abs)) / 127.0, F.lit(1e-12)
    )
    s = emb.select("vec_id", "label", xd.alias("x"), scale.alias("scale"))
    errs = F.transform(
        F.col("x"),
        lambda x: x - F.round(x / F.col("scale")) * F.col("scale"),
    )
    qv = F.transform(
        F.col("x"), lambda x: F.round(x / F.col("scale")).cast("long")
    )
    e = s.select(
        "label",
        errs.alias("errs"),
        F.size("x").alias("dim"),
        F.size(F.filter(qv, lambda q: F.abs(q) >= 127)).alias("n_sat"),
    )
    v = e.select(
        "label",
        F.sqrt(
            F.aggregate(
                F.col("errs"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
            / F.col("dim")
        ).alias("rmse"),
        F.array_max(F.transform(F.col("errs"), F.abs)).alias("maxerr"),
        "n_sat",
    )
    return (
        v.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.avg("rmse"), 6).alias("mean_rmse"),
            F.round(F.max("maxerr"), 6).alias("max_abs_err"),
            F.sum("n_sat").cast("long").alias("n_saturated"),
        )
        .orderBy("label")
    )


@register(
    "dedup_rate_by_source",
    r"""
    WITH n AS (
      SELECT source,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT norm) AS BIGINT) AS n_distinct,
           round(1.0 - count(DISTINCT norm) / CAST(count(*) AS DOUBLE), 6)
             AS dup_rate
    FROM n GROUP BY source ORDER BY source
    """,
    note="per-source exact-duplicate rate under the canonical "
    "normalization (operators/dedup.py normalized_text) — the "
    "source-quality signal that drives crawl prioritization and the "
    "domain-cap policy: a source shipping 40% duplicates gets capped "
    "harder.  One count-distinct aggregation per source (at volume: "
    "the HLL flavor, registered separately, replaces the exact "
    "distinct)",
)
def q_dedup_rate_by_source(spark, sf_dir):
    from .operators.dedup import normalized_text

    d = _t(spark, sf_dir, "documents")
    n = d.select("source", normalized_text(F.col("text")).alias("norm"))
    return (
        n.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("norm").cast("long").alias("n_distinct"),
            F.round(
                1.0
                - F.countDistinct("norm")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "peak_load_1h",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts))
    SELECT event_type,
           max(n) AS peak_hourly,
           min(h) FILTER (WHERE n = m) AS peak_hour,
           round(avg(n), 6) AS mean_hourly,
           round(max(n) / avg(n), 6) AS burst_ratio
    FROM (SELECT *, max(n) OVER (PARTITION BY event_type) AS m
          FROM hourly)
    GROUP BY event_type ORDER BY event_type
    """,
    note="peak-load detection per series: the busiest hour (earliest on "
    "ties so both engines agree), its count, and the burst ratio vs "
    "the hourly mean — the capacity-planning number behind shuffle "
    "partition and state-store sizing.  Hourly partial-agg first; the "
    "argmax window runs over ~720 rows per type",
)
def q_peak_load_1h(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wm = Window.partitionBy("event_type")
    h2 = hourly.withColumn("m", F.max("n").over(wm))
    return (
        h2.groupBy("event_type")
        .agg(
            F.max("n").alias("peak_hourly"),
            F.min(F.when(F.col("n") == F.col("m"), F.col("h"))).alias(
                "peak_hour"
            ),
            F.round(F.avg("n"), 6).alias("mean_hourly"),
            F.round(F.max("n") / F.avg("n"), 6).alias("burst_ratio"),
        )
        .orderBy("event_type")
    )


@register(
    "fk_orphan_audit",
    """
    SELECT 'lineitem->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    ORDER BY fk
    """,
    note="cross-table referential-integrity audit — the data-quality "
    "check the single-table constraint suite can't express: orphan "
    "counts per foreign-key edge via LEFT ANTI joins (child minus "
    "parents), the standard pre-publication warehouse gate.  Each edge "
    "is one anti join with the parent side reduced to its DISTINCT "
    "key column (broadcast-sized here; bucketed co-location at volume)",
)
def q_fk_orphan_audit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def edge(name, child, key_child, parent, key_parent):
        orphans = child.join(
            parent.select(key_parent).distinct(),
            child[key_child] == F.col(key_parent),
            "left_anti",
        )
        return (
            child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
            .crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_orphans")
                )
            )
            .select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )

    return (
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
        .orderBy("fk")
    )


@register(
    "zipf_slope_words",
    r"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(
          lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
          '[^a-z0-9]+'), x -> x <> '')) AS w
      FROM documents),
    freq AS (SELECT w, CAST(count(*) AS DOUBLE) AS f FROM toks GROUP BY w),
    ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY f DESC, w) AS DOUBLE)) AS x,
             ln(f) AS y
      FROM freq),
    fit AS (
      SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS vocab_size,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS zipf_slope
    FROM fit
    """,
    note="Zipf's-law fit over the corpus word-frequency distribution: "
    "log-log OLS slope of frequency vs rank (rank ties broken by word "
    "so both engines order identically).  Natural text sits near "
    "slope -1; strong deviation flags synthetic/spam/boilerplate "
    "corpora — a corpus-level curation diagnostic beside the per-doc "
    "quality gates.  The frequency table is vocabulary-sized, so the "
    "rank window and the closed-form fit run on post-aggregation "
    "volume; one shuffle over tokens.  ln() under the repo's 6-dp "
    "libm-portability contract",
)
def q_zipf_slope_words(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))),
                    r"[^a-z0-9]+",
                ),
                lambda x: x != "",
            )
        ).alias("w")
    )
    freq = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    wr = Window.orderBy(F.desc("f"), "w")
    ranked = freq.select(
        F.log(F.row_number().over(wr).cast("double")).alias("x"),
        F.log("f").alias("y"),
    )
    fit = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return fit.select(
        F.col("n").cast("long").alias("vocab_size"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


@register(
    "gains_table_embedding",
    """
    WITH s AS (
      SELECT vec_id,
             round(sqrt(list_dot_product(
                 list_transform(embedding, x -> x::DOUBLE),
                 list_transform(embedding, x -> x::DOUBLE))), 6) AS score,
             CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
      FROM embeddings),
    d AS (
      SELECT pos,
             ntile(10) OVER (ORDER BY score DESC, vec_id) AS decile
      FROM s),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS n_pos
      FROM d GROUP BY decile),
    t AS (SELECT sum(n_pos)::DOUBLE AS tp, sum(n)::DOUBLE AS tn FROM g)
    SELECT decile, n, n_pos,
           round(sum(n_pos) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) / t.tp, 6) AS cum_pos_share,
           round((n_pos / CAST(n AS DOUBLE)) / (t.tp / t.tn), 6) AS lift
    FROM g CROSS JOIN t ORDER BY decile
    """,
    note="gains/lift table — AUC's operational companion: score deciles "
    "(ntile with vec_id tie-break so both engines cut identically), "
    "per-decile positive counts, cumulative capture share, and lift vs "
    "the base rate — the 'top decile captures X% of positives' readout "
    "targeting/triage uses.  Aggregate-first: the decile window runs "
    "over scored rows once, everything after is 10 rows",
)
def q_gains_table_embedding(spark, sf_dir):
    from .operators.similarity import _norm

    e = _t(spark, sf_dir, "embeddings")
    s = e.select(
        "vec_id",
        F.round(_norm(F.col("embedding")), 6).alias("score"),
        F.when(F.col("label") % 2 == 0, 1).otherwise(0).alias("pos"),
    )
    wd = Window.orderBy(F.desc("score"), "vec_id")
    d = s.select("pos", F.ntile(10).over(wd).alias("decile"))
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    t = g.agg(
        F.sum("n_pos").cast("double").alias("tp"),
        F.sum("n").cast("double").alias("tn"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n",
            "n_pos",
            F.round(
                F.sum("n_pos").over(wc) / F.col("tp"), 6
            ).alias("cum_pos_share"),
            F.round(
                (F.col("n_pos") / F.col("n").cast("double"))
                / (F.col("tp") / F.col("tn")),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "jackknife_mean_se",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             avg(value) AS m
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             sum(m) AS s, avg(m) AS theta
      FROM daily GROUP BY event_type),
    loo AS (
      SELECT d.event_type,
             (a.s - d.m) / (a.n_days - 1) AS theta_i,
             a.theta AS theta, a.n_days AS n
      FROM daily d JOIN agg a ON a.event_type = d.event_type)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
           round(max(theta), 6) AS mean_of_daily,
           round(sqrt((max(n) - 1.0) / max(n)
                 * sum((theta_i - theta) * (theta_i - theta))), 6)
             AS jackknife_se
    FROM loo GROUP BY event_type ORDER BY event_type
    """,
    note="jackknife standard error of the per-series daily-mean "
    "statistic — deterministic resampling uncertainty at scale: "
    "leave-one-out replicates computed in CLOSED FORM from the sums "
    "(theta_i = (S - x_i)/(n-1) — no N re-aggregations, no RNG), one "
    "partial-agged daily pass + one broadcast join over ~30 rows per "
    "series.  The pattern generalizes to any plug-in statistic whose "
    "LOO form is algebraic; for non-algebraic ones the salted-hash "
    "Poisson bootstrap is the scale path (documented, not registered — "
    "its SQL oracle would need an inverse Poisson CDF)",
)
def q_jackknife_mean_se(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.avg("value").alias("m"))
    agg = daily.groupBy(F.col("event_type").alias("a_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("m").alias("s"),
        F.avg("m").alias("theta"),
    )
    loo = daily.join(
        F.broadcast(agg), daily.event_type == F.col("a_type")
    ).select(
        "event_type",
        ((F.col("s") - F.col("m")) / (F.col("n_days") - 1)).alias("theta_i"),
        "theta",
        F.col("n_days").alias("n"),
    )
    return (
        loo.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.round(F.max("theta"), 6).alias("mean_of_daily"),
            F.round(
                F.sqrt(
                    (F.max("n") - 1.0)
                    / F.max("n")
                    * F.sum(
                        (F.col("theta_i") - F.col("theta"))
                        * (F.col("theta_i") - F.col("theta"))
                    )
                ),
                6,
            ).alias("jackknife_se"),
        )
        .orderBy("event_type")
    )


@register(
    "label_separation_stats",
    """
    WITH x AS (
      SELECT vec_id, label, i, embedding[i]::DOUBLE AS v
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) r),
    lc AS (SELECT label, i, avg(v) AS c FROM x GROUP BY label, i),
    gc AS (SELECT i, avg(v) AS g FROM x GROUP BY i),
    intra AS (
      SELECT x.vec_id, x.label,
             sqrt(sum((x.v - lc.c) * (x.v - lc.c))) AS d
      FROM x JOIN lc ON lc.label = x.label AND lc.i = x.i
      GROUP BY x.vec_id, x.label),
    ia AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                  avg(d) AS intra_mean FROM intra GROUP BY label),
    cd AS (
      SELECT lc.label, sqrt(sum((lc.c - gc.g) * (lc.c - gc.g))) AS cdist
      FROM lc JOIN gc ON gc.i = lc.i GROUP BY lc.label)
    SELECT ia.label, ia.n_vecs,
           round(ia.intra_mean, 6) AS intra_mean_dist,
           round(cd.cdist, 6) AS centroid_dist,
           round(cd.cdist / ia.intra_mean, 6) AS separation_ratio
    FROM ia JOIN cd ON cd.label = ia.label
    ORDER BY ia.label
    """,
    note="embedding label-separation diagnostic (Fisher-style): per "
    "label the mean intra-class distance to the label centroid, the "
    "label-to-global centroid distance, and their ratio — the "
    "cluster-separability check run before training a classifier on "
    "an embedding space (ratio -> 0 means labels are not separable). "
    "Scale shape: centroids are per-(label, dim) partial-agged "
    "averages (|labels| x dim rows, broadcast back); the per-vector "
    "distance pass is row-local after the broadcast; nothing "
    "quadratic.  Sum-of-64-squares per row is order-stable at 6 dp",
)
def q_label_separation_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i", "v"
        ),
    )
    lc = x.groupBy("label", "i").agg(F.avg("v").alias("c"))
    gc = x.groupBy(F.col("i").alias("g_i")).agg(F.avg("v").alias("g"))
    intra = (
        x.join(F.broadcast(lc), on=["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(F.sum((F.col("v") - F.col("c")) ** 2)).alias("d")
        )
    )
    ia = intra.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.avg("d").alias("intra_mean"),
    )
    cd = (
        lc.join(F.broadcast(gc), lc.i == F.col("g_i"))
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.sqrt(F.sum((F.col("c") - F.col("g")) ** 2)).alias("cdist")
        )
    )
    return (
        ia.join(cd, ia.label == F.col("c_label"))
        .select(
            "label",
            "n_vecs",
            F.round("intra_mean", 6).alias("intra_mean_dist"),
            F.round("cdist", 6).alias("centroid_dist"),
            F.round(F.col("cdist") / F.col("intra_mean"), 6).alias(
                "separation_ratio"
            ),
        )
        .orderBy("label")
    )


@register(
    "weekday_seasonality",
    """
    WITH d AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow, value FROM events),
    per AS (
      SELECT event_type, dow,
             CAST(count(*) AS BIGINT) AS n_events,
             avg(value) AS dow_avg
      FROM d GROUP BY event_type, dow),
    tot AS (SELECT event_type, avg(value) AS overall_avg FROM d
            GROUP BY event_type)
    SELECT p.event_type, CAST(p.dow AS INT) AS dow, p.n_events,
           round(p.dow_avg, 6) AS dow_avg,
           round(p.dow_avg / t.overall_avg, 6) AS seasonality_idx
    FROM per p JOIN tot t ON t.event_type = p.event_type
    ORDER BY p.event_type, dow
    """,
    note="weekly seasonality indices — the classical-decomposition "
    "seasonal component (dow mean / overall mean per series): two "
    "partial-agged aggregations + a broadcast join of the |types|-row "
    "totals; index > 1 marks the hot weekdays the capacity planner "
    "cares about.  Numbering pinned explicitly: Spark dayofweek is "
    "1-based (1 = Sunday), DuckDB 0-based — the oracle carries the +1",
)
def q_weekday_seasonality(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    d = ev.select("event_type", F.dayofweek("ts").alias("dow"), "value")
    per = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.avg("value").alias("dow_avg"),
    )
    tot = d.groupBy(F.col("event_type").alias("t_type")).agg(
        F.avg("value").alias("overall_avg")
    )
    return (
        per.join(F.broadcast(tot), per.event_type == F.col("t_type"))
        .select(
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            "n_events",
            F.round("dow_avg", 6).alias("dow_avg"),
            F.round(F.col("dow_avg") / F.col("overall_avg"), 6).alias(
                "seasonality_idx"
            ),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "kfold_assignment_docs",
    """
    WITH f AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT % 5 AS BIGINT) AS fold
      FROM documents)
    SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM f GROUP BY fold, lang ORDER BY fold, lang
    """,
    note="k-fold cross-validation assignment (k=5) under the "
    "engine-portable salted-md5 contract: fold = first-8-hex-digits "
    "mod k — deterministic across runs/engines/partitionings, stable "
    "under corpus growth (a doc's fold never changes), uniform in "
    "expectation.  Output is the fold x lang audit the CV harness "
    "checks before training; row-local expression + one partial-agged "
    "shuffle.  Generalizes hash_split's train/val to k ways",
)
def q_kfold_assignment_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    fold = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(5),
    ).cast("long")
    return (
        d.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("fold", "lang")
    )


@register(
    "rolling_slope_7d",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(CAST(date_trunc('day', ts) AS DATE)
                  - DATE '2024-01-01' AS DOUBLE) AS x,
             round(avg(value), 6) AS y
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    w AS (
      SELECT event_type, day,
             count(*) OVER win AS n,
             sum(x) OVER win AS sx,
             sum(y) OVER win AS sy,
             sum(x * y) OVER win AS sxy,
             sum(x * x) OVER win AS sxx
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, day,
           CAST(n AS BIGINT) AS n_days,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
    FROM w WHERE n >= 2
    ORDER BY event_type, day
    """,
    note="rolling 7-day OLS slope per metric series — the trend-change "
    "detector between the global regr_trend fit and the EWMA smoother: "
    "daily partial-agg first, then ONE window pass accumulating the "
    "closed-form co-moments (n, Σx, Σy, Σxy, Σx²) over ROWS 6 "
    "PRECEDING, slope from the normal equation.  x is day-since-epoch "
    "(exact integer-valued doubles, so both engines' sums are "
    "bit-comparable before the final rounding); windows run over ~30 "
    "rows per type.  The same co-moment trick spark.ml's regr_* family "
    "uses, here made trailing",
)
def q_rolling_slope_7d(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("y"))
    daily = daily.withColumn(
        "x", F.datediff("day", F.lit("2024-01-01")).cast("double")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    w = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
    )
    return (
        w.filter(F.col("n") >= 2)
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n_days"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            ).alias("slope"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "rfm_user_segments",
    """
    WITH ref AS (SELECT CAST(max(ts) AS DATE) AS ref_day FROM events),
    p AS (
      SELECT user_id,
             CAST(max(ts) AS DATE) AS last_day,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(value), 6) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    m AS (
      SELECT user_id,
             CAST(ref.ref_day - p.last_day AS BIGINT) AS recency_days,
             frequency, monetary
      FROM p CROSS JOIN ref),
    s AS (
      SELECT user_id, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days, user_id) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
      FROM m)
    SELECT user_id, recency_days, frequency, monetary,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm
    FROM s ORDER BY user_id
    """,
    note="RFM user segmentation (recency/frequency/monetary, the "
    "classic CRM scoring): per-user purchase rollup (one partial-agged "
    "shuffle over the type-pruned scan), scalar reference day "
    "broadcast, three ntile(5) quintile scores with user_id tie-breaks "
    "so both engines bucket identically, concatenated to the segment "
    "code.  The quintile windows run over one row per PURCHASING user "
    "— cardinality-bounded, same aggregate-first shape as the AUC and "
    "histogram queries",
)
def q_rfm_user_segments(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.col("ts").cast("date")).alias("ref_day"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(F.sum("value"), 6).alias("monetary"),
        )
    )
    m = p.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.datediff("ref_day", "last_day").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    wr = Window.orderBy("recency_days", "user_id")
    wf = Window.orderBy(F.desc("frequency"), "user_id")
    wm = Window.orderBy(F.desc("monetary"), "user_id")
    s = m.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(wr).alias("r_score"),
        F.ntile(5).over(wf).alias("f_score"),
        F.ntile(5).over(wm).alias("m_score"),
    )
    return s.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.concat_ws("", "r_score", "f_score", "m_score").alias("rfm"),
    ).orderBy("user_id")


@register(
    "sql_recursive_calendar",
    """
    WITH RECURSIVE days(d, dmax) AS (
      SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM events
      UNION ALL
      SELECT d + 1, dmax FROM days WHERE d < dmax
    ),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(daily.n) AS BIGINT) AS n_active_days,
           CAST(count(*) - count(daily.n) AS BIGINT) AS n_zero_days
    FROM types t CROSS JOIN days
    LEFT JOIN daily ON daily.event_type = t.event_type
                   AND daily.d = days.d
    GROUP BY t.event_type ORDER BY t.event_type
    """,
    note="Spark 4 RECURSIVE CTE executed end-to-end (spark.sql literal "
    "text, the iterative-in-SQL entry path): the calendar dimension is "
    "GENERATED by acyclic date recursion (anchor = (min day, max day), "
    "step = +1 day — the termination bound is CARRIED through the "
    "recursion as a column: a scalar subquery in the step re-scans the "
    "table once per iteration, measured 6.5 s -> 1.25 s at sf0.1; "
    "UNION ALL recursion only — Spark does not yet support dedup-UNION "
    "recursion, so cyclic closures stay with operators/components.py) "
    "and outer-joined against daily activity for the zero-activity "
    "audit — the recursive complement of the sequence()-based gapfill. "
    "DuckDB recomputes the identical recursion; the types x days cross "
    "join is bounded by two dimension cardinalities",
)
def q_sql_recursive_calendar(spark, sf_dir):
    from .sources.registry import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE days(d, dmax) AS (
          SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM events
          UNION ALL
          SELECT date_add(d, 1), dmax FROM days WHERE d < dmax
        ),
        daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
          FROM events GROUP BY event_type, CAST(ts AS DATE)),
        types AS (SELECT DISTINCT event_type FROM events)
        SELECT t.event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(count(daily.n) AS BIGINT) AS n_active_days,
               CAST(count(*) - count(daily.n) AS BIGINT) AS n_zero_days
        FROM types t CROSS JOIN days
        LEFT JOIN daily ON daily.event_type = t.event_type
                       AND daily.d = days.d
        GROUP BY t.event_type ORDER BY t.event_type
        """
    )


@register(
    "auc_rank_embedding",
    """
    WITH s AS (
      SELECT round(sqrt(list_dot_product(
                 list_transform(embedding, x -> x::DOUBLE),
                 list_transform(embedding, x -> x::DOUBLE))), 6) AS score,
             CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
      FROM embeddings),
    g AS (
      SELECT score, CAST(count(*) AS DOUBLE) AS n_g,
             CAST(sum(pos) AS DOUBLE) AS pos_g
      FROM s GROUP BY score),
    r AS (
      SELECT pos_g, n_g,
             sum(n_g) OVER (ORDER BY score
                            ROWS UNBOUNDED PRECEDING) - n_g AS cum_before
      FROM g),
    tot AS (
      SELECT sum(pos_g) AS np, sum(n_g) - sum(pos_g) AS nn,
             sum(pos_g * (cum_before + (n_g + 1) / 2)) AS usum
      FROM r)
    SELECT round((usum - np * (np + 1) / 2) / (np * nn), 6) AS auc,
           CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
    FROM tot
    """,
    note="distributed AUC (Mann-Whitney U with tie correction): ranks "
    "the even-label class by embedding L2 norm — the model-eval metric "
    "computed WITHOUT sorting the data: scores aggregate to "
    "(score, n, n_pos) groups first (partial-agged; 6-dp rounding "
    "defines tie groups identically in both engines), the rank window "
    "then runs over the aggregated distinct-score rows only, and "
    "avg-rank-per-group feeds the closed-form U.  At 100 TB the full "
    "pass is one hash aggregation; the single-partition window touches "
    "distinct-score cardinality, bounded by the 6-dp score grid — the "
    "same aggregate-first shape as the histogram/ntile queries",
)
def q_auc_rank_embedding(spark, sf_dir):
    from .operators.similarity import _norm

    e = _t(spark, sf_dir, "embeddings")
    s = e.select(
        F.round(_norm(F.col("embedding")), 6).alias("score"),
        F.when(F.col("label") % 2 == 0, 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("double").alias("n_g"),
        F.sum("pos").cast("double").alias("pos_g"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.select(
        "pos_g",
        "n_g",
        (F.sum("n_g").over(w) - F.col("n_g")).alias("cum_before"),
    )
    tot = r.agg(
        F.sum("pos_g").alias("np"),
        (F.sum("n_g") - F.sum("pos_g")).alias("nn"),
        F.sum(
            F.col("pos_g") * (F.col("cum_before") + (F.col("n_g") + 1) / 2)
        ).alias("usum"),
    )
    return tot.select(
        F.round(
            (F.col("usum") - F.col("np") * (F.col("np") + 1) / 2)
            / (F.col("np") * F.col("nn")),
            6,
        ).alias("auc"),
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
    )


@register(
    "multimodal_byte_entropy",
    """
    WITH chars AS (
      SELECT doc_id,
             ord(substring(text, CAST(i AS INT), 1)) AS b
      FROM documents,
           unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS t(i)),
    freq AS (
      SELECT doc_id, b, count(*)::DOUBLE AS c FROM chars GROUP BY doc_id, b),
    tot AS (
      SELECT doc_id, sum(c) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct_bytes
      FROM freq GROUP BY doc_id)
    SELECT f.doc_id AS asset_id,
           CAST(t.n AS BIGINT) AS n_bytes,
           t.n_distinct_bytes,
           round(-sum((f.c / t.n) * log2(f.c / t.n)), 6) AS byte_entropy
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id, t.n, t.n_distinct_bytes
    ORDER BY asset_id
    """,
    note="per-asset byte histogram entropy through mapInArrow "
    "(operators/multimodal.py byte_entropy_arrow) — the LOWEST-overhead "
    "Python path: raw pyarrow RecordBatches in and out, no Arrow→pandas "
    "conversion (which buys nothing for opaque binary payloads and "
    "costs a copy); per-payload numpy bincount reduction, row-local, "
    "zero shuffle.  Entropy is the compressed/encrypted-vs-text triage "
    "signal a media ingest runs first.  The oracle recomputes the byte "
    "histogram with ord() over characters (ASCII fixture, the "
    "multimodal_decode_fake contract) — hash-certifies the third and "
    "last Python-kernel API flavor (pandas_udf / mapInPandas / "
    "mapInArrow all now carry full value-hash oracles)",
)
def q_multimodal_byte_entropy(spark, sf_dir):
    from .operators.multimodal import byte_entropy_arrow

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = byte_entropy_arrow(d)
    return out.select(
        "asset_id",
        "n_bytes",
        "n_distinct_bytes",
        F.round("byte_entropy", 6).alias("byte_entropy"),
    ).orderBy("asset_id")


_BLOCKLIST_TERMS = ("leak", "spill", "crash")


@register(
    "doc_blocklist_filter",
    rf"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    flagged AS (
      SELECT doc_id, source,
             len(list_intersect(toks,
                 {list(_BLOCKLIST_TERMS)})) > 0 AS blocked
      FROM toks)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE blocked) AS BIGINT) AS n_blocked,
           CAST(count(*) FILTER (WHERE NOT blocked) AS BIGINT) AS n_kept
    FROM flagged GROUP BY source ORDER BY source
    """,
    note="blocklist curation gate — the standard term-filter step beside "
    "the language/quality/PII gates: token-set intersection against a "
    "blocklist (word-boundary-true by construction — 'crash' matches "
    "the token 'crash', never a substring of 'crashes'), with "
    "per-source audit counts of blocked vs kept.  Row-local "
    "array_intersect on the tokenized column + one partial-agged "
    "shuffle on source; at 100 TB a large blocklist broadcasts as a "
    "lookup semi-join instead of an in-expression literal — same shape",
)
def q_doc_blocklist_filter(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))),
            r"[^a-z0-9]+",
        ),
        lambda x: x != "",
    )
    blocked = (
        F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(t) for t in _BLOCKLIST_TERMS])
            )
        )
        > 0
    )
    return (
        d.select("source", blocked.alias("blocked"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("blocked"), 1).otherwise(0))
            .cast("long")
            .alias("n_blocked"),
            F.sum(F.when(~F.col("blocked"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "cdc_apply_user_state",
    """
    WITH log AS (
      SELECT user_id, event_type, value, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type AS last_type,
           round(value, 6) AS last_value, ts AS last_ts
    FROM log WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    note="CDC changelog application (the Debezium-log -> table "
    "materialization semantic): the events feed is read as a keyed "
    "change log — every event upserts its user's state, 'error' acts "
    "as the DELETE tombstone — and compacted to current state: "
    "last-writer-wins per key by (ts, event_id), key absent when the "
    "final op is a tombstone.  One window shuffle on the key (at "
    "100 TB: max_by partial aggregation when only the final row is "
    "needed, or incremental foreachBatch merge — both registered "
    "elsewhere; the window form is the one whose tie-break the oracle "
    "pins exactly).  The batch twin of streaming_upsert_latest, plus "
    "delete semantics",
)
def q_cdc_apply_user_state(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    log = ev.withColumn("rn", F.row_number().over(w))
    return (
        log.filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.round("value", 6).alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


@register(
    "chi2_independence_lang_source",
    """
    WITH c AS (
      SELECT lang, source, count(*)::DOUBLE AS o
      FROM documents GROUP BY lang, source),
    r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY lang),
    s AS (SELECT source, sum(o) AS ct FROM c GROUP BY source),
    n AS (SELECT sum(o) AS n FROM c),
    t AS (
      SELECT sum(c.o * c.o / (r.rt * s.ct)) AS q
      FROM c JOIN r USING (lang) JOIN s USING (source))
    SELECT round(n.n * t.q - n.n, 6) AS chi2,
           CAST((SELECT count(*) - 1 FROM r)
                * (SELECT count(*) - 1 FROM s) AS BIGINT) AS dof,
           round(sqrt((n.n * t.q - n.n) / (n.n *
                 least((SELECT count(*) - 1 FROM r),
                       (SELECT count(*) - 1 FROM s)))), 6) AS cramers_v,
           CAST(n.n AS BIGINT) AS n_docs
    FROM n CROSS JOIN t
    """,
    note="chi-square test of independence (lang x source contingency) + "
    "Cramer's V effect size — the categorical-association companion to "
    "the Welch mean test.  Uses the zero-cell-safe identity "
    "chi2 = N * sum(o^2/(rowT*colT)) - N, so only OBSERVED cells are "
    "touched (empty cells contribute nothing and need no cross join of "
    "the margins): one groupBy over cells, two margin rollups of the "
    "aggregated ~|langs x sources| rows, broadcast joins back, 1-row "
    "scalar combine.  At 100 TB the full pass is the single cell "
    "aggregation; everything after runs on cardinality-sized data",
)
def q_chi2_independence_lang_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    r = c.groupBy("lang").agg(F.sum("o").alias("rt"))
    s = c.groupBy("source").agg(F.sum("o").alias("ct"))
    joined = c.join(F.broadcast(r), on="lang").join(
        F.broadcast(s), on="source"
    )
    t = joined.agg(
        F.sum(F.col("o") * F.col("o") / (F.col("rt") * F.col("ct"))).alias(
            "q"
        )
    )
    n = c.agg(F.sum("o").alias("n"))
    dims = c.agg(
        (F.count_distinct("lang") - 1).alias("rdof"),
        (F.count_distinct("source") - 1).alias("cdof"),
    )
    out = n.crossJoin(t).crossJoin(dims)
    chi2 = F.col("n") * F.col("q") - F.col("n")
    return out.select(
        F.round(chi2, 6).alias("chi2"),
        (F.col("rdof") * F.col("cdof")).cast("long").alias("dof"),
        F.round(
            F.sqrt(chi2 / (F.col("n") * F.least("rdof", "cdof"))), 6
        ).alias("cramers_v"),
        F.col("n").cast("long").alias("n_docs"),
    )


@register(
    "heavy_hitters_users",
    """
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           CAST(count(*) AS BIGINT) AS est
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    note="distributed Misra-Gries summary (operators/heavyhitters.py "
    "misra_gries_summary) run in its provably-EXACT regime: k=200 "
    "counters over ~150 distinct users means no prune ever fires "
    "(per-partition distinct < 4k, merged size < k), so est == exact "
    "for every key and the full Arrow fold -> merge shuffle -> final "
    "prune machinery is driver-hash-certified against the plain "
    "groupBy.  The sketch's n/(k+1) guarantees in the PRUNING regime "
    "are pytest-pinned on a synthetic Zipf stream "
    "(tests/test_heavyhitters.py) — the graded fixtures are "
    "near-uniform, where any sketch bound is vacuous; the two "
    "certifications split exactly where each bites",
)
def q_heavy_hitters_users(spark, sf_dir):
    from .operators.heavyhitters import misra_gries_summary

    ev = _t(spark, sf_dir, "events")
    return misra_gries_summary(ev, "user_id", k=200).orderBy("user_id")


@register(
    "incremental_agg_merge",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(sum(value) / count(*), 6) AS avg_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="incremental-aggregation contract: the events feed is split "
    "into a base slice and a new increment (ts < / >= 2024-01-15), each "
    "aggregated to mergeable partials (count/sum/min/max — avg is "
    "DERIVED from sum/count, never merged directly), then the partials "
    "are merged and certified equal to the full recompute.  This is the "
    "maintenance loop of every 100 TB warehouse: each day aggregates "
    "only its increment and folds it into the running table instead of "
    "rescanning history — the query proves the merge algebra is exact",
)
def q_incremental_agg_merge(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    merged = (
        partial(ev.filter(F.col("ts") < cutoff))
        .unionByName(partial(ev.filter(F.col("ts") >= cutoff)))
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    ).orderBy("event_type")


# --------------------------------------------------------------------- #
# multimodal plumbing over `documents` (operators/multimodal.py)
#
# The driver schema carries no binary column, so the graded queries
# derive an opaque payload from the text bytes (encode utf-8) — the
# binary/metadata plumbing (schema, byte lengths, digests, Arrow batch
# shape through mapInPandas) is exactly what it would be for real
# image/audio payloads; only the decode kernel is a deterministic fake.


@register(
    "multimodal_metadata",
    """
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents ORDER BY asset_id
    """,
    note="typed metadata over an opaque binary payload column (operators/multimodal.py "
    "attach_binary_metadata; pure JVM byte-length + sha2-256)",
)
def q_multimodal_metadata(spark, sf_dir):
    from .operators.multimodal import attach_binary_metadata

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return (
        attach_binary_metadata(d)
        .select("asset_id", "n_bytes", "sha")
        .orderBy("asset_id")
    )


@register(
    "multimodal_decode_fake",
    """
    WITH b AS (
      SELECT doc_id AS asset_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents),
    sums AS (
      SELECT asset_id,
             sum(ord(substring(text, CAST(i AS INT), 1))) AS byte_sum
      FROM b, unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS t(i)
      GROUP BY asset_id)
    SELECT b.asset_id, b.n_bytes,
           CAST(greatest(1, b.n_bytes % 64) AS INT) AS width,
           CAST(greatest(1, (b.n_bytes // 64) % 64 + 1) AS INT) AS height,
           round(CASE WHEN b.n_bytes > 0
                      THEN coalesce(s.byte_sum, 0) / b.n_bytes
                      ELSE 0.0 END, 6) AS mean_intensity
    FROM b LEFT JOIN sums s ON s.asset_id = b.asset_id
    ORDER BY b.asset_id
    """,
    note="binary decode via mapInPandas (operators/multimodal.py "
    "decode_image_batch, deterministic fake kernel — no media libs in this "
    "environment). HASH-CERTIFIED since r5b: the fake is pure byte math "
    "(dims from length, intensity = byte mean) and the documents fixture is "
    "ASCII (verified: octet_length(encode(text)) == length(text) corpus-"
    "wide), so the oracle recomputes it with ord() over characters — "
    "integer sums divide exactly in both engines. The mapInPandas Arrow "
    "contract (columnar in/out, no shuffle) is exactly what a real "
    "PIL/libvips kernel would keep",
)
def q_multimodal_decode_fake(spark, sf_dir):
    from .operators.multimodal import decode_image_batch

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/fake").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )
    decoded = decode_image_batch(d, fake=True)
    return decoded.select(
        "asset_id",
        "n_bytes",
        "width",
        "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    ).orderBy("asset_id")


@register(
    "multimodal_features_fake",
    """
    WITH docs AS (SELECT doc_id AS asset_id, text FROM documents),
    pos AS (SELECT unnest(range(0, 8)) AS p),
    sums AS (
      SELECT asset_id, CAST((i - 1) % 8 AS BIGINT) AS p,
             sum(ord(substring(text, CAST(i AS INT), 1))) AS s
      FROM docs, unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS t(i)
      GROUP BY 1, 2),
    buckets AS (
      SELECT d.asset_id, pos.p, coalesce(s.s, 0) / 255.0 AS v
      FROM docs d CROSS JOIN pos
      LEFT JOIN sums s ON s.asset_id = d.asset_id AND s.p = pos.p),
    norms AS (SELECT asset_id, sqrt(sum(v * v)) AS nrm
              FROM buckets GROUP BY asset_id)
    SELECT b.asset_id, CAST(b.p AS INT) AS pos,
           round(CASE WHEN n.nrm > 0 THEN b.v / n.nrm ELSE 0.0 END, 6)
             AS feat
    FROM buckets b JOIN norms n ON n.asset_id = b.asset_id
    ORDER BY b.asset_id, pos
    """,
    note="feature-extraction stub via mapInPandas (operators/multimodal.py "
    "extract_features, deterministic byte-bucket kernel — no model runtime "
    "in this environment); Arrow batch in/out, unit-norm pinned by pytest. "
    "HASH-CERTIFIED since r5b: the kernel accumulates INTEGER bucket sums "
    "and divides once (bit-reproducible pre-normalization from any "
    "engine), the fixture is ASCII so the oracle rebuilds the buckets with "
    "ord() over character positions, and the vector is exploded to "
    "(asset_id, pos, feat) rows at 6-dp — numeric rows hash cleanly where "
    "the earlier to_json form depended on float formatting",
)
def q_multimodal_features_fake(spark, sf_dir):
    from .operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_features(d, dim=8, fake=True)
    return (
        feats.select("asset_id", F.posexplode("feature").alias("pos", "feat"))
        .select("asset_id", "pos", F.round("feat", 6).alias("feat"))
        .orderBy("asset_id", "pos")
    )


# --------------------------------------------------------------------- #
# r5c additions: global ID assignment, span dedup, quantization,
# profiling/constraints, SCD2, time-series features.


@register(
    "assign_global_ids_docs",
    """
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
             AS global_id
    FROM documents
    """,
    note="contiguous global ID assignment by (n_chars DESC, doc_id) — the "
    "length-sorted corpus numbering a packing stage consumes.  The naive "
    "plan (empty-PARTITION row_number) funnels 100 TB through ONE task; "
    "operators/ids.py assign_global_ids does the two-phase range-bucketed "
    "rank instead: approxQuantile boundaries, per-bucket counts prefix-"
    "summed on the driver (<= B scalars), rank WITHIN each bucket in "
    "parallel + offset.  Output ids equal the global rank exactly, so the "
    "approximate boundaries never affect the result",
)
def q_assign_global_ids_docs(spark, sf_dir):
    from .operators.ids import assign_global_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return assign_global_ids(
        docs,
        ["n_chars", "doc_id"],
        range_col="n_chars",
        descending=True,
        num_buckets=8,
    ).select("doc_id", "n_chars", "global_id")


@register(
    "doc_segment_dedup",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, w, CAST(ceil(len(w) / 8.0) AS BIGINT) AS n_segs
      FROM toks
    ),
    segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
             array_to_string(w[CAST(i * 8 + 1 AS INT) : CAST(i * 8 + 8 AS INT)],
                             ' ') AS seg
      FROM base, unnest(range(0, n_segs)) AS t(i)
    ),
    keep AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx)
               AS rn
      FROM segs
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM keep WHERE rn = 1 GROUP BY doc_id
    )
    SELECT b.doc_id, coalesce(r.clean_text, '') AS clean_text,
           b.n_segs, coalesce(r.n_kept, 0) AS n_kept
    FROM base b LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
    """,
    note="C4/RefinedWeb-style corpus-wide duplicate-span removal "
    "(operators/text.py segment_dedup): non-overlapping 8-token segments, "
    "keep only the globally-first occurrence of each repeated span, "
    "reassemble in order.  One partial-agged groupBy on the segment (the "
    "min-struct keeper row carries everything — no join-back), one "
    "reassembly groupBy, one doc-keyed left join to restore fully-deduped "
    "docs.  At scale the group key becomes xxhash64(seg) + string residual",
)
def q_doc_segment_dedup(spark, sf_dir):
    from .operators.text import segment_dedup

    return segment_dedup(_t(spark, sf_dir, "documents"), seg_len=8)


@register(
    "embedding_int8_quantize",
    """
    WITH s AS (
      SELECT vec_id, label, embedding,
             greatest(list_max(list_transform(embedding,
                                              x -> abs(CAST(x AS DOUBLE))))
                        / 127.0, 1e-12) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, label, scale,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) / scale)
                                      AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id, label, round(scale, 6) AS scale6,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(len(list_filter(qv, x -> abs(x) >= 127)) AS BIGINT) AS n_sat
    FROM q
    """,
    note="symmetric per-vector int8 scalar quantization (operators/"
    "quantize.py) — the 4x ANN-index compression step.  Pure Catalyst HOFs "
    "(transform/aggregate/filter), row-local, zero shuffle.  Certification "
    "columns are integer-exact (code sums/L1/saturation count) so the "
    "oracle needs no float tolerance beyond one 6-dp round on the scale; "
    "float->double widening and order-independent max make both engines "
    "bit-identical",
)
def q_embedding_int8_quantize(spark, sf_dir):
    from .operators.quantize import quantize_int8_arrow

    # Arrow kernel flavor — bit-identical to the HOF documentation
    # form (pytest-pinned), and the volume path per the repo-wide
    # HOF-for-reporting / Arrow-for-volume split
    return quantize_int8_arrow(_t(spark, sf_dir, "embeddings"))


@register(
    "profile_orders_columns",
    """
    SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 6) AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 6) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(CAST(min(o_custkey) AS DOUBLE), 6),
           round(CAST(max(o_custkey) AS DOUBLE), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(CAST(min(o_totalprice) AS DOUBLE), 6),
           round(CAST(max(o_totalprice) AS DOUBLE), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           round(epoch(min(o_orderdate)), 6),
           round(epoch(max(o_orderdate)), 6), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           NULL, NULL, min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
    note="deequ-style one-scan column profiler (operators/profile.py "
    "profile_columns): rows/nulls/distincts/min/max for all six orders "
    "columns in a single aggregate pass (multi-column exact distinct "
    "plans via one Expand — the one-pass tradeoff; approximate=True "
    "switches to HLL with no Expand for very wide tables, the 100 TB "
    "default).  Timestamps profile as epoch seconds; the oracle is one "
    "UNION ALL per column",
)
def q_profile_orders_columns(spark, sf_dir):
    from .operators.profile import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


@register(
    "check_constraints_orders",
    """
    SELECT 'o_orderkey_not_null' AS check_name,
           CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
           coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'o_custkey_not_null',
           CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
           count(o_orderkey) - count(DISTINCT o_orderkey) = 0
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_positive',
           CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_domain',
           CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT),
           coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'o_custkey_references',
           CAST((SELECT count(*) FROM orders o
                 LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                 WHERE c.c_custkey IS NULL) AS BIGINT),
           (SELECT count(*) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL) = 0
    """,
    note="declarative data-quality constraint suite (operators/profile.py "
    "check_constraints): not-null / uniqueness / positivity / domain "
    "checks fold into ONE conditional-aggregate scan; the referential "
    "check is a broadcast LEFT ANTI against the customer keys.  The "
    "per-batch monitoring gate of a production ingest (deequ shape)",
)
def q_check_constraints_orders(spark, sf_dir):
    from .operators.profile import check_constraints

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return check_constraints(
        orders,
        not_null=["o_orderkey", "o_custkey"],
        unique=["o_orderkey"],
        positive=["o_totalprice"],
        domain={"o_orderstatus": ["O", "F", "P"]},
        references={"o_custkey": customer},
    )


@register(
    "scd2_user_event_type",
    """
    WITH o AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_id
      FROM events
    ),
    r AS (
      SELECT user_id, event_type, ts,
             sum(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM o
    ),
    g AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             min(ts) AS effective_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM r GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, effective_from,
           lead(effective_from) OVER (PARTITION BY user_id ORDER BY version)
             AS effective_to,
           lead(effective_from) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current,
           n_events
    FROM g
    """,
    note="SCD type-2 dimension build from the event log (operators/scd.py "
    "scd2_collapse): consecutive same-attribute runs collapse into "
    "versioned rows with effective_from/effective_to validity and an "
    "is_current flag.  One key-partitioned window for change detection "
    "(lag + running sum), a partial-agged groupBy reusing the same "
    "partitioning, one more key window for the effective_to carry — no "
    "self-join, O(1) driver traffic.  Deterministic under timestamp ties "
    "via the event_id tiebreak",
)
def q_scd2_user_event_type(spark, sf_dir):
    from .operators.scd import scd2_collapse

    return scd2_collapse(
        _t(spark, sf_dir, "events"), "user_id", "event_type", "ts", "event_id"
    )


@register(
    "events_daily_ewma",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             round(sum(value), 6) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT d1.day, d1.event_type, d1.x,
           round(sum(d2.x * (1 << (13 - (d1.day - d2.day))))
                 / sum(1 << (13 - (d1.day - d2.day))), 6) AS ewma
    FROM daily d1
    JOIN daily d2
      ON d2.event_type = d1.event_type
     AND d1.day - d2.day BETWEEN 0 AND 13
    GROUP BY d1.day, d1.event_type, d1.x
    """,
    note="exponentially-weighted trailing 14-day average of daily event "
    "value per type (half-life decay).  The heavy reduce is the daily "
    "pre-aggregation (partial-agged, one shuffle); the EWMA then runs on "
    "the tiny (days x types) series via an equi-join on type with a "
    "day-range residual — a hash join, NOT a nested loop.  Weights are "
    "integer powers of two (shiftleft), bit-exact in any engine; no libm "
    "pow in the certified path",
)
def q_events_daily_ewma(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("x"))
    )
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    diff = F.datediff(F.col("d1.day"), F.col("d2.day"))
    # SQL shiftleft accepts an expression shift count; the PySpark
    # wrapper restricts it to a literal int, so go through expr()
    w = F.expr("shiftleft(1, 13 - datediff(d1.day, d2.day))")
    return (
        d1.join(d2, F.col("d2.event_type") == F.col("d1.event_type"))
        .filter((diff >= 0) & (diff <= 13))
        .groupBy(
            F.col("d1.day").alias("day"),
            F.col("d1.event_type").alias("event_type"),
            F.col("d1.x").alias("x"),
        )
        .agg(
            F.round(
                F.sum(F.col("d2.x") * w) / F.sum(w), 6
            ).alias("ewma")
        )
    )


@register(
    "events_daily_anomaly",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             round(sum(value), 6) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT day, event_type, x,
             avg(x) OVER w AS mu,
             stddev_samp(x) OVER w AS sd,
             CAST(count(x) OVER w AS BIGINT) AS n_prev
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, event_type, x, n_prev,
           CASE WHEN n_prev >= 3 AND sd > 1e-9
                THEN round((x - mu) / sd, 6) END AS z,
           coalesce(CASE WHEN n_prev >= 3 AND sd > 1e-9
                         THEN abs((x - mu) / sd) > 2 END, false) AS is_anomaly
    FROM stats
    """,
    note="trailing-window anomaly detection on the daily event series: "
    "z-score of each day's total against the previous 7 days' mean/"
    "stddev per type, flagged at |z| > 2.  Daily reduce is the only "
    "big-data shuffle; the scoring window runs over the small series.  "
    "Warm-up rows (fewer than 3 prior days) and degenerate stddev emit "
    "NULL z / false flag in both engines",
)
def q_events_daily_anomaly(spark, sf_dir):
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.round(F.sum("value"), 6).alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "day",
        "event_type",
        "x",
        F.avg("x").over(w).alias("mu"),
        F.stddev_samp("x").over(w).alias("sd"),
        F.count("x").over(w).cast("long").alias("n_prev"),
    )
    ok = (F.col("n_prev") >= 3) & (F.col("sd") > 1e-9)
    z = (F.col("x") - F.col("mu")) / F.col("sd")
    return stats.select(
        "day",
        "event_type",
        "x",
        "n_prev",
        F.when(ok, F.round(z, 6)).alias("z"),
        F.coalesce(F.when(ok, F.abs(z) > 2), F.lit(False)).alias("is_anomaly"),
    )


@register(
    "window_range_1h_user",
    """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 6) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(epoch(ts) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    note="value-based (RANGE) window frame over event time — the "
    "trailing-1-hour per-user activity feature (SURVEY §2.6 extension): "
    "frame membership is decided by the epoch-second VALUE, not row "
    "position, so simultaneous events share a frame deterministically.  "
    "One shuffle on user_id; both engines order by the same truncated "
    "epoch so the frames agree exactly",
)
def q_window_range_1h_user(spark, sf_dir):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_1h"),
    )


@register(
    "orders_price_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 6) AS lo,
           round(max(o_totalprice), 6) AS hi
    FROM orders
    GROUP BY 1
    """,
    note="fixed-width histogram of order totals (floor-division "
    "bucketing — engine-portable, no width_bucket dependency): the "
    "distribution-profiling companion to profile_orders_columns.  "
    "Partial-agged single shuffle on the bucket key",
)
def q_orders_price_histogram(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
    )


@register(
    "agg_median_acctbal",
    """
    SELECT c_mktsegment,
           round(median(c_acctbal), 6) AS med_acctbal,
           round(quantile_cont(c_acctbal, 0.9), 6) AS p90_acctbal,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
    note="exact interpolated median / p90 per segment: Spark median() "
    "and percentile() match DuckDB median()/quantile_cont() "
    "(linear-interpolation contract).  Exact percentiles buffer the "
    "group's values; the sketch flavor for 100 TB volumes is "
    "approx_quantiles_value — this is the small-group reporting shape",
)
def q_agg_median_acctbal(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.median("c_acctbal"), 6).alias("med_acctbal"),
            F.round(F.percentile("c_acctbal", 0.9), 6).alias("p90_acctbal"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


# --------------------------------------------------------------------- #
# TPC-H breadth completion: Q11 / Q12 / Q20 adaptations.  With these the
# registry covers every TPC-H query shape adaptable to the driver's
# star schema (no partsupp / shipmode / commitdate columns — each note
# documents the mapping), completing the 22-query sweep.


@register(
    "q11_important_parts",
    """
    WITH val AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_regionkey = 0
      GROUP BY 1),
    tot AS (SELECT CAST(sum(v) AS DECIMAL(38,2)) AS t FROM val)
    SELECT val.l_partkey AS partkey,
           CAST(val.v AS DOUBLE) AS part_value
    FROM val, tot
    WHERE val.v * 1000 > tot.t
    ORDER BY part_value DESC, partkey
    """,
    note="TPC-H-style Q11 (important stock identification): the driver "
    "schema has no partsupp, so 'stock value' per part derives from "
    "lineitem supplied by region-0 suppliers (supply value = realized "
    "extendedprice).  The structural essence is preserved: group-level "
    "HAVING against a scalar fraction-of-global-total subquery over the "
    "SAME aggregate.  The global total reuses the per-part aggregate "
    "(tiny — one row per part) instead of re-scanning the fact; the "
    "threshold compares v*1000 > total in exact decimal so no float "
    "epsilon can diverge across engines; supplier/nation broadcast "
    "prunes the fact before the shuffle agg",
)
def q_q11_important_parts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    val = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("v")
        )
    )
    tot = val.agg(F.sum("v").cast("decimal(38,2)").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("v") * 1000 > F.col("t"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q12_priority_by_returnflag",
    """
    SELECT l.l_returnflag, l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag, l.l_linestatus
    ORDER BY l.l_returnflag, l.l_linestatus
    """,
    note="TPC-H-style Q12 (shipping modes and order priority): no "
    "l_shipmode/commitdate/receiptdate columns, so the category is "
    "(returnflag, linestatus) and the date predicate is the 1997 "
    "shipdate year.  The Q12 essence — fact-to-fact join with "
    "priority-class conditional counts — is intact.  The shipdate range "
    "pushes to the lineitem scan (PushedFilters) so the join sees only "
    "the year's rows; both counts come from ONE pass (conditional agg, "
    "no second join or union), partial-aggregated map-side",
)
def q_q12_priority_by_returnflag(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q20_dominant_promo_supplier",
    """
    WITH pp AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    q AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS qty
      FROM lineitem l JOIN pp ON pp.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
        AND l.l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY 1, 2),
    pt AS (SELECT l_partkey, CAST(sum(qty) AS DECIMAL(38,2)) AS part_qty
           FROM q GROUP BY 1),
    dom AS (
      SELECT DISTINCT q.l_suppkey
      FROM q JOIN pt ON pt.l_partkey = q.l_partkey
      WHERE q.qty * 5 > pt.part_qty)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom)
    ORDER BY s.s_name
    """,
    note="TPC-H-style Q20 (potential part promotion): no partsupp "
    "availqty, so 'excess stock' becomes 'dominant supplier' — a "
    "supplier qualifies when its 1998 shipped quantity of some PROMO "
    "part exceeds 20%% of that part's total 1998 volume (qty*5 > total "
    "in exact decimal).  Preserves Q20's nested-IN chain: part "
    "name/type filter -> correlated per-part aggregate threshold -> "
    "supplier LEFT SEMI.  The promo part list broadcasts into the "
    "date-pruned fact scan; the per-part total reuses the pair "
    "aggregate (no second fact scan); only DISTINCT suppkeys reach the "
    "semi join",
)
def q_q20_dominant_promo_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    pp = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    q = (
        li.join(F.broadcast(pp), pp.p_partkey == li.l_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("qty")
        )
    )
    pt = q.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").cast("decimal(38,2)").alias("part_qty")
    )
    dom = (
        q.join(
            pt,
            (F.col("pt_partkey") == q.l_partkey)
            & (F.col("qty") * 5 > F.col("part_qty")),
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dom, dom.l_suppkey == s.s_suppkey, "left_semi")
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "full_outer_reconcile_users",
    """
    WITH p AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_purchase,
             round(sum(value), 6) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_signup
      FROM events WHERE event_type = 'signup' GROUP BY 1)
    SELECT coalesce(p.user_id, s.user_id) AS user_id,
           coalesce(p.n_purchase, 0) AS n_purchase,
           coalesce(p.purchase_value, 0.0) AS purchase_value,
           coalesce(s.n_signup, 0) AS n_signup,
           CASE WHEN p.user_id IS NULL THEN 'signup_only'
                WHEN s.user_id IS NULL THEN 'purchase_only'
                ELSE 'both' END AS presence
    FROM p FULL OUTER JOIN s ON s.user_id = p.user_id
    ORDER BY user_id
    """,
    note="FULL OUTER reconciliation — the one join family the registry "
    "didn't yet exercise: per-user purchase activity vs signup activity "
    "with null-side coalescing and a presence flag (the data-quality "
    "'which side is missing' report shape).  Both sides partial-agg "
    "BEFORE the join so the full-outer shuffle moves one row per user "
    "per side, not raw events; at 100 TB both inputs arrive "
    "hash-partitioned on user_id from their aggregations so the join "
    "reuses the exchange",
)
def q_full_outer_reconcile_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchase"),
            F.round(F.sum("value"), 6).alias("purchase_value"),
        )
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").alias("s_user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_signup"))
    )
    j = p.join(s, s.s_user_id == p.user_id, "full_outer")
    return (
        j.select(
            F.coalesce(p.user_id, s.s_user_id).alias("user_id"),
            F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
            F.coalesce("n_signup", F.lit(0)).alias("n_signup"),
            F.when(p.user_id.isNull(), F.lit("signup_only"))
            .when(s.s_user_id.isNull(), F.lit("purchase_only"))
            .otherwise(F.lit("both"))
            .alias("presence"),
        )
        .orderBy("user_id")
    )


@register(
    "window_rank_family",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist() OVER w, 6) AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    note="the full ranking-function family in ONE window pass (one "
    "shuffle on the partition key, one sort): row_number / rank / "
    "dense_rank / percent_rank / cume_dist / ntile share a single "
    "WindowExec.  The order key carries a c_custkey tiebreak so the "
    "tie-sensitive functions (row_number, ntile) are deterministic "
    "cross-engine; the value-based ones agree on ties by definition",
)
def q_window_rank_family(spark, sf_dir):
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "events_gapfill_locf",
    """
    WITH d AS (
      SELECT event_type, user_id % 50 AS ub, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n, round(avg(value), 6) AS v
      FROM events GROUP BY 1, 2, 3),
    spans AS (
      SELECT event_type, ub, min(day) AS d0, max(day) AS d1
      FROM d GROUP BY 1, 2),
    cal AS (
      SELECT s.event_type, s.ub, CAST(g.day AS DATE) AS day
      FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.d0, s.d1,
                                      INTERVAL 1 DAY))::DATE AS day) g)
    SELECT c.event_type, c.ub, c.day,
           coalesce(d.n, 0) AS n,
           last_value(d.v IGNORE NULLS) OVER (
             PARTITION BY c.event_type, c.ub ORDER BY c.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_locf,
           CAST(d.n IS NULL AS BOOLEAN) AS filled
    FROM cal c LEFT JOIN d
      ON d.event_type = c.event_type AND d.ub = c.ub AND d.day = c.day
    ORDER BY c.event_type, c.ub, c.day
    """,
    note="time-series gap filling + LOCF interpolation (the hypertable "
    "rollup / time_bucket_gapfill shape): per-(type, user-bucket) daily "
    "series densified to a complete calendar via sequence()+explode of "
    "each series' own [min, max] span, missing days filled with "
    "count=0 and last-observation-carried-forward value (one "
    "ignoreNulls window pass).  The calendar derives from the per-group "
    "aggregate (tiny) and joins back on the grouped daily rows, so "
    "nothing re-scans raw events; generation is per-group (no global "
    "calendar broadcast blow-up at 100 TB)",
)
def q_events_gapfill_locf(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type",
            F.pmod(F.col("user_id"), F.lit(50)).cast("long").alias("ub"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("value"), 6).alias("v"),
        )
    )
    cal = (
        d.groupBy(
            F.col("event_type").alias("c_type"), F.col("ub").alias("c_ub")
        )
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "c_type",
            "c_ub",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("c_day"),
        )
    )
    j = cal.join(
        d,
        (d.event_type == cal.c_type)
        & (d.ub == cal.c_ub)
        & (d.day == cal.c_day),
        "left",
    )
    w = (
        Window.partitionBy("c_type", "c_ub")
        .orderBy("c_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        j.select(
            F.col("c_type").alias("event_type"),
            F.col("c_ub").alias("ub"),
            F.col("c_day").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("v", ignorenulls=True).over(w).alias("v_locf"),
            F.col("n").isNull().alias("filled"),
        )
        .orderBy("event_type", "ub", "day")
    )


@register(
    "regr_trend_daily_value",
    """
    WITH x AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE) AS d,
             value
      FROM events)
    SELECT event_type,
           round(regr_slope(value, d), 6) AS slope,
           round(regr_intercept(value, d), 6) AS intercept,
           round(regr_r2(value, d), 6) AS r2,
           round(corr(d, value), 6) AS corr_dv,
           CAST(count(*) AS BIGINT) AS n
    FROM x GROUP BY event_type ORDER BY event_type
    """,
    note="per-group OLS trend detection with the SQL regression "
    "aggregate family (regr_slope/intercept/r2 + corr) — drift "
    "monitoring over a metric stream in ONE partial-aggregable pass "
    "(each regr_* is sums/co-moments, so map-side combine applies; no "
    "window, no second scan).  The regressor is days-since-epoch-start "
    "(small magnitude) so the co-moment cancellation stays far from "
    "double precision limits and 6-dp rounding is stable cross-engine",
)
def q_regr_trend_daily_value(spark, sf_dir):
    d = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("double")
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", d.alias("d"), "value")
        .groupBy("event_type")
        .agg(
            F.round(F.regr_slope("value", "d"), 6).alias("slope"),
            F.round(F.regr_intercept("value", "d"), 6).alias("intercept"),
            F.round(F.regr_r2("value", "d"), 6).alias("r2"),
            F.round(F.corr("d", "value"), 6).alias("corr_dv"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "hll_sketch_union_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="re-aggregatable distinct-count sketches — THE 100 TB "
    "pre-aggregation pattern: per-(type, day) HLL sketches built once "
    "(hll_sketch_agg), then merged across days with hll_union_agg and "
    "estimated — the daily sketch table is what a warehouse would "
    "persist so weekly/monthly rollups never re-touch raw events.  "
    "Hash-certified via an in-plan accuracy gate: the merged estimate "
    "must sit within 5%% of the exact distinct (far beyond HLL's "
    "lgConfigK=12 error of ~1.6%%); the driver-visible columns are the "
    "exact count and the gate boolean, both engine-portable",
)
def q_hll_sketch_union_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy(F.col("event_type").alias("e_type")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_users")
    )
    return (
        merged.join(exact, F.col("e_type") == merged.event_type)
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("est_within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "fuzzy_blocked_match_docs",
    """
    WITH d AS (
      SELECT doc_id, lang, n_chars // 16 AS lb, substr(text, 1, 40) AS h
      FROM documents)
    SELECT least(a.doc_id, b.doc_id) AS doc_lo,
           greatest(a.doc_id, b.doc_id) AS doc_hi,
           CAST(levenshtein(a.h, b.h) AS BIGINT) AS dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND b.lb - a.lb IN (0, 1)
     AND ((a.lb = b.lb AND a.doc_id < b.doc_id) OR a.lb < b.lb)
    WHERE levenshtein(a.h, b.h) <= 8
    ORDER BY doc_lo, doc_hi
    """,
    note="record-linkage fuzzy matching with blocking: candidate pairs "
    "come only from (lang, length-bucket) blocks — never an all-pairs "
    "self-join — and each left row probes its own bucket plus the next "
    "(dual-probe via a 2-element explode, an equi hash join on the "
    "probed key) so near-boundary pairs aren't missed.  Bucket width "
    "16 = 2x the edit threshold (any pair within |delta n_chars| <= 16 "
    "shares a probed block) — the block-granularity-matches-threshold "
    "rule that keeps per-block population, and hence the Sum(b^2) "
    "candidate volume, bounded as the corpus grows; width 64 measured "
    "30x slower at sf0.1.  The residual is the THRESHOLD form "
    "levenshtein(a, h, 8) (banded O(n*k) early-exit, returns -1 past "
    "the bound) so each candidate costs O(prefix*threshold), not "
    "O(prefix^2).  Same-bucket pairs are id-ordered and cross-bucket "
    "pairs bucket-ordered, so each unordered pair emerges exactly once "
    "(no DISTINCT pass).  Levenshtein is the standard edit distance in "
    "both engines",
)
def q_fuzzy_blocked_match_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 16).cast("long").alias("lb"),
        F.substring("text", 1, 40).alias("h"),
    )
    probes = d.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("a_lang"),
        F.col("lb").alias("a_lb"),
        F.col("h").alias("a_h"),
        F.explode(F.array(F.col("lb"), F.col("lb") + 1)).alias("probe_lb"),
    )
    j = probes.join(
        d,
        (d.lang == probes.a_lang) & (d.lb == probes.probe_lb),
    ).filter(
        (
            (F.col("a_lb") == F.col("lb")) & (F.col("a_id") < F.col("doc_id"))
        )
        | (F.col("a_lb") < F.col("lb"))
    )
    dist = F.levenshtein(F.col("a_h"), F.col("h"), 8)
    return (
        j.filter((dist >= 0) & (dist <= 8))
        .select(
            F.least("a_id", "doc_id").alias("doc_lo"),
            F.greatest("a_id", "doc_id").alias("doc_hi"),
            dist.cast("long").alias("dist"),
        )
        .orderBy("doc_lo", "doc_hi")
    )


@register(
    "doc_bigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS prev, t[i + 1] AS w
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
      WHERE len(t) >= 2),
    tf AS (SELECT doc_id, prev, w, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
    c2 AS (SELECT prev, w, sum(tf) AS c2 FROM tf GROUP BY 1, 2),
    c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1)
    SELECT tf.doc_id,
           round(sum(tf.tf * -ln(c2.c2 / c1.c1)) / sum(tf.tf), 6)
             AS avg_bigram_nll,
           CAST(sum(tf.tf) AS BIGINT) AS n_bigrams
    FROM tf JOIN c2 USING (prev, w) JOIN c1 USING (prev)
    GROUP BY tf.doc_id ORDER BY tf.doc_id
    """,
    note="bigram conditional-NLL perplexity proxy (operators/text.py "
    "bigram_logprob) — the order-sensitive sibling of "
    "doc_unigram_logprob: penalizes scrambled word order that a "
    "unigram model can't see.  Bigrams are built ROW-LOCALLY (token "
    "array zipped against its own shift — no window shuffle); "
    "per-(doc, bigram) counts first so vocabulary-join skew stays "
    "bounded by document frequency; p = c2/c1 is a ratio of integers "
    "under the 6-dp ln() contract",
)
def q_doc_bigram_logprob(spark, sf_dir):
    from .operators.text import bigram_logprob

    d = _t(spark, sf_dir, "documents")
    return bigram_logprob(d).orderBy("doc_id")


@register(
    "skew_report_events",
    """
    WITH pu AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_users,
           round(max(n) * 1.0 / sum(n), 6) AS top1_share,
           round(quantile_cont(n, 0.99) /
                 greatest(quantile_cont(n, 0.50), 1.0), 6) AS p99_over_p50
    FROM pu GROUP BY event_type ORDER BY event_type
    """,
    note="partition-skew diagnosis report — the query you run BEFORE "
    "choosing a salting factor: per grouping key, the hottest "
    "sub-key's share of rows and the p99/p50 ratio of per-sub-key "
    "counts.  Two partial-aggregable passes (per-(type,user) counts, "
    "then per-type stats over the count distribution); at 100 TB this "
    "is exactly the evidence `salted_agg_events` / `skew_join_segment` "
    "act on.  Exact percentiles run over one row per (type,user) — "
    "already reduced volume",
)
def q_skew_report_events(spark, sf_dir):
    pu = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        pu.groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.max("n") / F.sum("n"), 6).alias("top1_share"),
            F.round(
                F.percentile("n", 0.99)
                / F.greatest(F.percentile("n", 0.50), F.lit(1.0)),
                6,
            ).alias("p99_over_p50"),
        )
        .orderBy("event_type")
    )


@register(
    "assoc_rules_event_types",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
    marg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS na
             FROM ut GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_ab,
           round(p.n_ab * 1.0 / nu.n, 6) AS support,
           round(p.n_ab * 1.0 / ma.na, 6) AS conf_a_to_b,
           round(p.n_ab * 1.0 / mb.na, 6) AS conf_b_to_a,
           round(p.n_ab * 1.0 * nu.n / (ma.na * mb.na), 6) AS lift
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.type_a
    JOIN marg mb ON mb.event_type = p.type_b, nu
    ORDER BY p.type_a, p.type_b
    """,
    note="association-rule mining (market-basket co-occurrence): "
    "support / confidence / lift for every event-type pair "
    "co-occurring in a user's history.  The pair self-join runs over "
    "the DISTINCT (user, type) set — per-user pair fan-out is bounded "
    "by the type-domain size squared, never by event volume — and both "
    "marginal joins broadcast (one row per type).  All measures are "
    "integer ratios at 6 dp",
)
def q_assoc_rules_event_types(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nu = ev.agg(F.count_distinct("user_id").cast("long").alias("n"))
    marg = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("na")
    )
    b = ut.select(
        F.col("user_id").alias("b_user"), F.col("event_type").alias("type_b")
    )
    pairs = (
        ut.join(
            b,
            (b.b_user == ut.user_id) & (ut.event_type < b.type_b),
        )
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("na").alias("na_a"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("na").alias("na_b"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("na_a"), 6).alias("conf_a_to_b"),
            F.round(F.col("n_ab") / F.col("na_b"), 6).alias("conf_b_to_a"),
            F.round(
                F.col("n_ab") * F.col("n") / (F.col("na_a") * F.col("na_b")), 6
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "multi_touch_attribution",
    """
    WITH j AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             p.value AS purchase_value
      FROM events c JOIN events p
        ON p.user_id = c.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 6 HOUR)
    SELECT purchase_id, click_id,
           CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
             AS n_touches,
           round(1.0 / count(*) OVER (PARTITION BY purchase_id), 6)
             AS weight,
           round(purchase_value / count(*) OVER (PARTITION BY purchase_id),
                 6) AS credited_value
    FROM j ORDER BY purchase_id, click_id
    """,
    note="linear multi-touch attribution: every click within 6 h before "
    "a purchase shares the credit equally (weight = 1/n_touches, "
    "credited value = purchase value / n).  The candidate join is the "
    "bucketed interval join (operators/rangejoin.py — equi hash join "
    "on (user, bucket) + residual, never a nested loop); the credit "
    "normalization is ONE unordered window over the matched pairs, "
    "partitioned by purchase — no second join back to purchases",
)
def q_multi_touch_attribution(spark, sf_dir):
    from .operators.rangejoin import bucketed_interval_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "ts",
        F.col("value").alias("purchase_value"),
    )
    j = bucketed_interval_join(
        clicks, purchases, keys=["user_id"],
        left_ts="ts", right_ts="ts", interval_seconds=6 * 3600,
    )
    w = Window.partitionBy("purchase_id")
    n = F.count(F.lit(1)).over(w)
    return (
        j.select(
            F.col("r_purchase_id").alias("purchase_id"),
            F.col("l_click_id").alias("click_id"),
            F.col("r_purchase_value").alias("purchase_value"),
        )
        .select(
            "purchase_id",
            "click_id",
            n.cast("long").alias("n_touches"),
            F.round(F.lit(1.0) / n, 6).alias("weight"),
            F.round(F.col("purchase_value") / n, 6).alias("credited_value"),
        )
        .orderBy("purchase_id", "click_id")
    )


@register(
    "revenue_share_window",
    """
    WITH rev AS (
      SELECT n.n_name, r.r_name,
             CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2)
    SELECT n_name, r_name, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY r_name), 6)
             AS region_share,
           round(revenue / sum(revenue) OVER (), 6) AS global_share
    FROM rev ORDER BY r_name, n_name
    """,
    note="percent-of-total via unordered window aggregates (the "
    "ratio_to_report shape): per-nation revenue with its share of the "
    "region and of the world.  The windows run over the ALREADY "
    "AGGREGATED 25-row result — zero full-volume window cost; the "
    "denominator sums the same exact-decimal revenue both engines "
    "computed, so the 6-dp shares agree.  Dimension joins broadcast; "
    "the empty-frame global window is a 1-row exchange, not a "
    "single-partition sort of the fact",
)
def q_revenue_share_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("revenue")
        )
    )
    wr = Window.partitionBy("r_name")
    wg = Window.partitionBy()
    return rev.select(
        "n_name",
        "r_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(wr), 6).alias(
            "region_share"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(wg), 6).alias(
            "global_share"
        ),
    ).orderBy("r_name", "n_name")


@register(
    "mad_outliers_value",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS d, m.med
      FROM events e JOIN med m ON m.event_type = e.event_type),
    mad AS (
      SELECT event_type, median(d) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type,
           round(max(d.med), 6) AS med,
           round(max(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    note="robust outlier detection via median absolute deviation — the "
    "3-sigma rule without the mean's outlier sensitivity.  Two "
    "broadcast-joined passes (per-type median, then median of absolute "
    "deviations, then the threshold count); the interpolated medians "
    "are bit-identical cross-engine ((a+b)/2 on identical doubles) so "
    "the UNROUNDED 3*mad comparison is exact — no epsilon.  At volume "
    "the exact medians swap for the percentile sketch "
    "(approx_quantiles_value) with the same topology",
)
def q_mad_outliers_value(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("d"), "med"
    )
    mad = dev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.median("d").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), F.col("m_type") == dev.event_type)
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "rolling_7d_unique_users",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS uniq_7d
    FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
    note="trailing-7-day distinct users per day — the rolling-distinct "
    "problem, which no windowed aggregate solves scalably (collect_set "
    "over a RANGE frame buffers every window's members per row).  "
    "Scale shape: reduce to DISTINCT (day, user) pairs first, then "
    "each pair REPLICATES to the 7 anchor days it can influence "
    "(explode of a 7-day sequence) and one distinct-agg per anchor "
    "finishes it — linear 7× replication of the already-reduced "
    "day-user volume, fully partial-aggregable, no per-row set state.  "
    "Anchors restrict to observed event days (semi join with the "
    "distinct-day list).  The HLL-sketch variant "
    "(hll_sketch_union_users) is the same topology with mergeable "
    "state for when day-user pairs themselves are too many",
)
def q_rolling_7d_unique_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    anchors = du.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), 6),
                F.expr("interval 1 day"),
            )
        ).alias("anchor"),
    )
    return (
        anchors.join(
            days, days.day == anchors.anchor, "left_semi"
        )
        .groupBy(F.col("anchor").alias("day"))
        .agg(F.count_distinct("user_id").cast("long").alias("uniq_7d"))
        .orderBy("day")
    )


@register(
    "markov_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    cnt AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT cur, nxt, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY cur), 6) AS p
    FROM cnt ORDER BY cur, nxt
    """,
    note="first-order Markov transition matrix over per-user event "
    "sequences — the sequence-modeling summary behind next-action "
    "prediction and anomalous-flow detection.  One lead() window pass "
    "(shuffle on user_id, tie-broken by event_id for cross-engine "
    "determinism), one partial-aggregable pair count, and the row "
    "normalization runs over the aggregated ≤|types|² rows.  Integer "
    "ratio at 6 dp",
)
def q_markov_transition_matrix(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wc = Window.partitionBy("cur")
    return cnt.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n") / F.sum("n").over(wc), 6).alias("p"),
    ).orderBy("cur", "nxt")


@register(
    "conversion_latency_percentiles",
    """
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    delta AS (
      SELECT su.user_id,
             date_diff('second', su.signup_ts, min(e.ts)) * 1.0 AS secs
      FROM su JOIN events e
        ON e.user_id = su.user_id
       AND e.event_type = 'purchase' AND e.ts >= su.signup_ts
      GROUP BY su.user_id, su.signup_ts)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(secs, 0.5), 4) AS p50_s,
           round(quantile_cont(secs, 0.9), 4) AS p90_s,
           round(max(secs), 4) AS max_s
    FROM delta
    """,
    note="signup→purchase conversion latency distribution: first "
    "signup per user (partial-agged), purchases after it equi-joined "
    "on user_id (both sides already reduced/filtered — no broadcast "
    "assumption about user cardinality), first qualifying purchase per "
    "user, then exact interpolated percentiles over the per-user "
    "latency (one row per converted user — reporting volume).  "
    "Integer-second deltas keep the quantile interpolation exact "
    "cross-engine",
)
def q_conversion_latency_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    delta = (
        su.join(
            pu,
            (pu.p_user == su.user_id) & (pu.p_ts >= su.signup_ts),
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
        .select(
            (
                F.unix_timestamp("first_purchase_ts")
                - F.unix_timestamp("signup_ts")
            ).cast("double").alias("secs")
        )
    )
    return delta.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("secs", 0.5), 4).alias("p50_s"),
        F.round(F.percentile("secs", 0.9), 4).alias("p90_s"),
        F.round(F.max("secs"), 4).alias("max_s"),
    )


@register(
    "embedding_covariance",
    """
    WITH x AS (
      SELECT vec_id, i, embedding[i]::DOUBLE AS xi
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) r),
    n AS (SELECT count(*) AS n FROM embeddings)
    SELECT CAST(a.i - 1 AS INTEGER) AS i, CAST(b.i - 1 AS INTEGER) AS j,
           round(sum(a.xi * b.xi) / max(n.n)
                 - (sum(a.xi) / max(n.n)) * (sum(b.xi) / max(n.n)), 6)
             AS cov
    FROM x a JOIN x b USING (vec_id), n
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    note="distributed covariance matrix of the embedding column "
    "(operators/pca.py embedding_covariance) — the data-parallel half "
    "of PCA: an Arrow kernel folds each partition into per-batch "
    "moment sums (n, Σx, ΣxxT — one numpy matmul per batch), emits "
    "dim² tiny rows per batch, and ONE shuffle on (i,j) finishes the "
    "reduction; no vector crosses the network, traffic is "
    "O(partitions·dim²).  The driver-side eigh over the 64×64 result "
    "(pca_top_components) is model-sized math, pytest-pinned.  Oracle "
    "rebuilds the same moments from an exploded self-join",
)
def q_embedding_covariance(spark, sf_dir):
    from .operators.pca import embedding_covariance

    return embedding_covariance(
        _t(spark, sf_dir, "embeddings"), dim=64
    ).orderBy("i", "j")


@register(
    "null_safe_join_nation",
    """
    WITH c AS (
      SELECT c_custkey, nullif(c_nationkey, 3) AS nk FROM customer),
    n AS (
      SELECT nullif(n_nationkey, 3) AS nk, n_name FROM nation)
    SELECT c.c_custkey,
           coalesce(n.n_name, '<unknown>') AS n_name,
           CAST(c.nk IS NULL AS BOOLEAN) AS key_was_null
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    ORDER BY c.c_custkey, n_name
    """,
    note="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "keys MATCH each other instead of silently dropping — the "
    "unknown-dimension-member pattern (here nation 3 is nulled on both "
    "sides to model unresolved keys; real feeds arrive with them).  "
    "Spark plans eqNullSafe as a HASH-JOINABLE key (coalesce+isnull "
    "rewrite), so this stays a broadcast/shuffled hash join — pinned "
    "by the plan guard, never a nested loop; a naive "
    "`(a=b) OR (a IS NULL AND b IS NULL)` predicate would lose the "
    "equi-join planning entirely",
)
def q_null_safe_join_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk")
    )
    n = _t(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey"), F.lit(3)).alias("n_nk"), "n_name"
    )
    return (
        c.join(F.broadcast(n), c.nk.eqNullSafe(n.n_nk))
        .select(
            "c_custkey",
            F.coalesce("n_name", F.lit("<unknown>")).alias("n_name"),
            F.col("nk").isNull().alias("key_was_null"),
        )
        .orderBy("c_custkey", "n_name")
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH o AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_id
      FROM events),
    r AS (
      SELECT user_id, event_type, ts,
             sum(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM o),
    g AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             min(ts) AS effective_from
      FROM r GROUP BY user_id, version, event_type),
    dim AS (
      SELECT user_id, version, event_type AS dim_state, effective_from,
             lead(effective_from) OVER (PARTITION BY user_id
                                        ORDER BY version) AS effective_to
      FROM g)
    SELECT e.event_id, e.user_id, d.version, d.dim_state
    FROM events e JOIN dim d
      ON d.user_id = e.user_id
     AND e.ts >= d.effective_from
     AND (d.effective_to IS NULL OR e.ts < d.effective_to)
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
    note="point-in-time (temporal) join against the SCD2 dimension: "
    "each purchase picks the dimension version whose "
    "[effective_from, effective_to) interval contains its timestamp — "
    "the as-reported-then lookup every audit/ML-feature pipeline needs "
    "(joining is_current instead leaks the future).  Plan shape: equi "
    "join on the dimension KEY with the interval check as a residual — "
    "version fan-out per key is small and interval-partitioned, so "
    "each probe matches exactly one build row; no range blow-up, no "
    "nested loop.  The dimension derives in-plan from scd2_collapse",
)
def q_scd2_point_in_time_join(spark, sf_dir):
    from .operators.scd import scd2_collapse

    ev = _t(spark, sf_dir, "events")
    dim = scd2_collapse(ev, "user_id", "event_type", "ts", "event_id").select(
        F.col("user_id").alias("d_user"),
        "version",
        F.col("event_type").alias("dim_state"),
        "effective_from",
        "effective_to",
    )
    e = ev.filter(F.col("event_type") == "purchase")
    return (
        e.join(
            dim,
            (dim.d_user == e.user_id)
            & (e.ts >= dim.effective_from)
            & (dim.effective_to.isNull() | (e.ts < dim.effective_to)),
        )
        .select("event_id", "user_id", "version", "dim_state")
        .orderBy("event_id")
    )


@register(
    "embedding_hof_flags",
    """
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN len(list_filter(embedding,
                                              x -> x::DOUBLE > 0.5)) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_any_gt_half,
           CAST(sum(CASE WHEN len(list_filter(embedding,
                                              x -> abs(x::DOUBLE) >= 1.0)) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_all_abs_lt1,
           round(avg(len(list_filter(embedding, x -> x::DOUBLE > 0))), 6)
             AS avg_n_pos
    FROM embeddings GROUP BY label ORDER BY label
    """,
    note="higher-order array-function breadth (exists / forall / "
    "filter+size) as per-label vector hygiene flags: any-coordinate "
    "spike, all-coordinates-bounded, positive-coordinate count.  "
    "exists() maps to len(list_filter)>0 and forall() to its negated "
    "complement in the oracle — identical float→double promotion both "
    "engines.  Catalyst HOFs are interpreted, so this shape belongs on "
    "REPORTING volumes; candidate-verify volumes use the Arrow kernels "
    "(the repo-wide split embedding_norm_stats documents)",
)
def q_embedding_hof_flags(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(
                F.when(
                    F.exists(x, lambda v: v.cast("double") > 0.5), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_any_gt_half"),
            F.sum(
                F.when(
                    F.forall(x, lambda v: F.abs(v.cast("double")) < 1.0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_all_abs_lt1"),
            F.round(
                F.avg(F.size(F.filter(x, lambda v: v.cast("double") > 0))), 6
            ).alias("avg_n_pos"),
        )
        .orderBy("label")
    )


@register(
    "feature_hashing_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS w
      FROM documents WHERE doc_id < 100),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5('fh:' || w), 1, 2))::BIGINT AS hv
      FROM toks)
    SELECT doc_id, CAST(hv % 64 AS BIGINT) AS dim,
           CAST(sum(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS val
    FROM h GROUP BY 1, 2 HAVING sum(CASE WHEN (hv // 64) % 2 = 0
                                         THEN 1 ELSE -1 END) <> 0
    ORDER BY doc_id, dim
    """,
    note="the hashing trick (Weinberger et al. 2009, public method): "
    "tokens map to a fixed 64-dim signed sparse feature space with no "
    "vocabulary table and no fit step — the streaming-friendly text "
    "featurizer.  dim = 6 low bits and sign = the 7th bit of the "
    "engine-portable salted-md5 contract (the same uniform the "
    "sampling operators certify), so the oracle reproduces features "
    "bit-for-bit; the sign bit keeps collision contributions unbiased "
    "(E = 0).  One explode + one partial-agged shuffle; zero entries "
    "dropped as a real sparse encoder would.  Restricted to 100 docs "
    "for a bounded certified output — the shape is volume-independent "
    "(at volume the md5 salt swaps for xxhash64, the repo's internal "
    "join-key hash, without changing the topology)",
)
def q_feature_hashing_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    from .operators.text import _tokens as _toks

    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("fh:"), F.col("w"))), 1, 2), 16, 10
    ).cast("long")
    return (
        d.select("doc_id", F.explode(_toks(F.col("text"))).alias("w"))
        .select(
            "doc_id",
            F.pmod(hv, F.lit(64)).cast("long").alias("dim"),
            F.when(
                F.pmod(F.floor(hv / 64), F.lit(2)) == 0, F.lit(1)
            ).otherwise(F.lit(-1)).alias("sgn"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("long").alias("val"))
        .filter(F.col("val") != 0)
        .orderBy("doc_id", "dim")
    )


@register(
    "variant_props_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    note="the Spark 4 VARIANT type for semi-structured data: "
    "parse_json() ingests props into the binary variant encoding ONCE "
    "and variant_get extracts typed paths from it — unlike "
    "get_json_object (props_json_extract, which re-parses the JSON "
    "text per path), variant parses once and serves any number of "
    "typed extractions, the open-format answer to string-JSON scans "
    "at 100 TB.  try_variant_get's null-on-missing contract matches "
    "the oracle's json_extract_string NULL semantics",
)
def q_variant_props_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("k").isNull().cast("long"))
            .cast("long")
            .alias("n_missing_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "fuzzy_entity_clusters",
    """
    WITH RECURSIVE d AS (
      SELECT doc_id, lang, n_chars // 16 AS lb, substr(text, 1, 40) AS h
      FROM documents),
    e AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM d a JOIN d b
        ON a.lang = b.lang AND abs(b.lb - a.lb) <= 1
       AND a.doc_id <> b.doc_id
      WHERE levenshtein(a.h, b.h) <= 8),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    reach(node, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
    SELECT node AS doc_id, min(lab) AS entity_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
    note="entity resolution end-to-end: the fuzzy blocked matcher's "
    "pair graph closed into entity clusters by the distributed "
    "connected-components operator — match → cluster is the step that "
    "turns pairwise linkage into dedup/merge decisions.  Output "
    "restricted to docs that matched anything (singletons carry no "
    "decision).  The oracle recomputes the blocked fuzzy edge set and "
    "closes it with a recursive CTE, certifying candidate generation, "
    "residual scoring AND transitive clustering in one hash",
)
def q_fuzzy_entity_clusters(spark, sf_dir):
    from .operators.components import connected_components

    pairs = q_fuzzy_blocked_match_docs(spark, sf_dir).select(
        "doc_lo", "doc_hi"
    )
    # the blocked match feeds the node derivation AND every propagation
    # round — materialize the (tiny) pair set once instead of
    # re-running the candidate join per consumer
    pairs = pairs.localCheckpoint(eager=False)
    nodes = (
        pairs.select(F.col("doc_lo").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_hi").alias("doc_id")))
        .distinct()
    )
    comp = connected_components(
        nodes, pairs, id_col="doc_id", src_col="doc_lo", dst_col="doc_hi"
    )
    return comp.select(
        "doc_id", F.col("component_id").alias("entity_id")
    ).orderBy("doc_id")


@register(
    "naive_bayes_lang_confusion",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_DUCK_TOKS}) AS w FROM documents),
    tf AS (SELECT doc_id, lang, w, count(*) AS tf
           FROM toks GROUP BY 1, 2, 3),
    cc AS (SELECT lang AS c, w, sum(tf) AS cwc FROM tf GROUP BY 1, 2),
    tc AS (SELECT c, sum(cwc) AS t FROM cc GROUP BY 1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM cc),
    prior AS (
      SELECT lang AS c, count(*) AS nd FROM documents GROUP BY 1),
    ndoc AS (SELECT count(*) AS n FROM documents),
    grid AS (
      SELECT tf.doc_id, tf.lang AS actual, p.c, tf.w, tf.tf
      FROM tf CROSS JOIN (SELECT DISTINCT c FROM prior) p),
    lik AS (
      SELECT g.doc_id, g.actual, g.c,
             sum(g.tf * ln((coalesce(cc.cwc, 0) + 1.0)
                           / (tc.t + vocab.v))) AS ll
      FROM grid g
      LEFT JOIN cc ON cc.c = g.c AND cc.w = g.w
      JOIN tc ON tc.c = g.c, vocab
      GROUP BY 1, 2, 3),
    scored AS (
      SELECT l.doc_id, l.actual, l.c,
             round(l.ll + ln(prior.nd * 1.0 / ndoc.n), 6) AS score
      FROM lik l JOIN prior ON prior.c = l.c, ndoc),
    mx AS (SELECT doc_id, max(score) AS ms FROM scored GROUP BY 1),
    pred AS (
      SELECT s.doc_id, s.actual, min(s.c) AS predicted
      FROM scored s JOIN mx ON mx.doc_id = s.doc_id AND s.score = mx.ms
      GROUP BY 1, 2)
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """,
    note="trainable multinomial Naive Bayes, certified END-TO-END: "
    "train = ONE partial-aggregable pass (per-(class, token) counts + "
    "class totals + vocab + priors — all integer), score = the "
    "per-(doc, token) tf rows crossed with the tiny class list and "
    "LEFT-joined to the likelihood table (absent pairs take the "
    "add-one smoothing default), argmax per doc on the 6-dp-rounded "
    "log posterior with a class-name tiebreak so both engines pick "
    "identical labels.  Output is the language confusion matrix — "
    "train AND inference verified in one hash.  Join skew is bounded "
    "by document frequency (the unigram_logprob shape); the class "
    "grid multiplies rows by |classes| (5), not by vocabulary",
)
def q_naive_bayes_lang_confusion(spark, sf_dir):
    from .operators.text import _tokens as _toks

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(_toks(F.col("text"))).alias("w")
    )
    tf = toks.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).alias("tf")
    )
    cc = tf.groupBy(F.col("lang").alias("c"), "w").agg(
        F.sum("tf").alias("cwc")
    )
    tc = cc.groupBy("c").agg(F.sum("cwc").alias("t"))
    vocab = cc.agg(F.count_distinct("w").alias("v"))
    prior = d.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    ndoc = d.agg(F.count(F.lit(1)).alias("n"))
    classes = prior.select("c")
    grid = tf.select(
        "doc_id", F.col("lang").alias("actual"), "w", "tf"
    ).crossJoin(F.broadcast(classes))
    lik = (
        grid.join(
            cc.withColumnRenamed("c", "cc_c"),
            (F.col("cc_c") == grid.c) & (cc.w == grid.w),
            "left",
        )
        .join(F.broadcast(tc.withColumnRenamed("c", "tc_c")),
              F.col("tc_c") == grid.c)
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "actual", "c")
        .agg(
            F.sum(
                F.col("tf")
                * F.log(
                    (F.coalesce(F.col("cwc"), F.lit(0)) + 1.0)
                    / (F.col("t") + F.col("v"))
                )
            ).alias("ll")
        )
    )
    scored = (
        lik.join(
            F.broadcast(prior.withColumnRenamed("c", "p_c")),
            F.col("p_c") == lik.c,
        )
        .crossJoin(F.broadcast(ndoc))
        .select(
            "doc_id",
            "actual",
            "c",
            F.round(
                F.col("ll") + F.log(F.col("nd") / F.col("n")), 6
            ).alias("score"),
        )
    )
    mx = scored.groupBy(F.col("doc_id").alias("m_doc")).agg(
        F.max("score").alias("ms")
    )
    pred = (
        scored.join(
            mx,
            (mx.m_doc == scored.doc_id) & (scored.score == mx.ms),
        )
        .groupBy("doc_id", "actual")
        .agg(F.min("c").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@register(
    "winsorize_values",
    """
    WITH th AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p1,
             quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value < th.p1 OR e.value > th.p99
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           round(avg(e.value), 6) AS mean_raw,
           round(avg(greatest(th.p1, least(th.p99, e.value))), 6)
             AS mean_winsorized
    FROM events e JOIN th ON th.event_type = e.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    note="percentile winsorization — the outlier-robust cleaning "
    "transform: per-group p1/p99 thresholds (exact interpolated "
    "quantiles over the reporting-volume groups) broadcast back and "
    "applied as clamp(greatest/least); reports raw vs winsorized "
    "means and the clip count.  Two passes, threshold side tiny; at "
    "volume the threshold pass swaps for the percentile sketch with "
    "the same topology.  Clamped values are EXACT copies of inputs "
    "or thresholds, so 6-dp rounding is engine-stable",
)
def q_winsorize_values(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    th = ev.groupBy(F.col("event_type").alias("t_type")).agg(
        F.percentile("value", 0.01).alias("p1"),
        F.percentile("value", 0.99).alias("p99"),
    )
    j = ev.join(F.broadcast(th), F.col("t_type") == ev.event_type)
    clamped = F.greatest("p1", F.least("p99", F.col("value")))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (
                    (F.col("value") < F.col("p1"))
                    | (F.col("value") > F.col("p99"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_clipped"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg(clamped), 6).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


@register(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    obs AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM obs)
    SELECT obs.digit,
           CAST(obs.n AS BIGINT) AS n,
           round(obs.n * 1.0 / tot.t, 6) AS observed_p,
           round(ln(1.0 + 1.0 / obs.digit) / ln(10.0), 6) AS benford_p,
           round((obs.n * 1.0 / tot.t
                  - ln(1.0 + 1.0 / obs.digit) / ln(10.0))
                 * (obs.n * 1.0 / tot.t
                    - ln(1.0 + 1.0 / obs.digit) / ln(10.0))
                 / (ln(1.0 + 1.0 / obs.digit) / ln(10.0)), 6)
             AS chi2_term
    FROM obs, tot ORDER BY obs.digit
    """,
    note="Benford's-law first-digit audit — the forensic-accounting "
    "anomaly test: observed leading-digit frequencies of order totals "
    "vs the log10(1+1/d) expectation, with per-digit chi-square "
    "contributions (synthetic uniform-ish prices will and should "
    "deviate — the query certifies the audit computation, the "
    "deviation IS the signal).  One digit-extraction pass + a 9-row "
    "reduction; digit via integer/string math so both engines agree "
    "exactly, expectation under the 6-dp ln() contract",
)
def q_benford_first_digit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").alias("t"))
    p_obs = F.col("n") / F.col("t")
    p_ben = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(p_obs, 6).alias("observed_p"),
            F.round(p_ben, 6).alias("benford_p"),
            F.round((p_obs - p_ben) * (p_obs - p_ben) / p_ben, 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )


@register(
    "events_cusum_drift",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(avg(value), 6) AS v
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT event_type, avg(v) AS mu,
             greatest(stddev_samp(v), 1e-9) AS sd
      FROM daily GROUP BY 1),
    z AS (
      SELECT d.event_type, d.day, (d.v - st.mu) / st.sd AS z
      FROM daily d JOIN st ON st.event_type = d.event_type),
    c AS (
      SELECT event_type, day,
             sum(z) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cusum
      FROM z)
    SELECT event_type,
           round(max(abs(cusum)), 6) AS max_abs_cusum,
           min(day) FILTER (WHERE round(abs(cusum), 6) = m) AS drift_day,
           CAST(count(*) AS BIGINT) AS n_days
    FROM (SELECT *, max(round(abs(cusum), 6)) OVER (PARTITION BY event_type)
                    AS m FROM c)
    GROUP BY event_type ORDER BY event_type
    """,
    note="CUSUM change-point detection (Page 1954, public method) on "
    "the daily metric series: standardized deviations accumulated per "
    "type, reporting the maximum |CUSUM| excursion and the first day "
    "it is attained — the classic drift detector that catches slow "
    "mean shifts EWMA smoothing hides.  Daily pre-aggregation first "
    "(the full pass is partial-aggregable), so the windows run over "
    "~30 rows per type; the argmax day is tie-broken by min(day) on "
    "the 6-dp-rounded excursion so both engines agree",
)
def q_events_cusum_drift(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    st = daily.groupBy(F.col("event_type").alias("s_type")).agg(
        F.avg("v").alias("mu"),
        F.greatest(F.stddev_samp("v"), F.lit(1e-9)).alias("sd"),
    )
    z = daily.join(F.broadcast(st), F.col("s_type") == daily.event_type).select(
        "event_type",
        "day",
        ((F.col("v") - F.col("mu")) / F.col("sd")).alias("z"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = z.select(
        "event_type", "day", F.sum("z").over(wc).alias("cusum")
    )
    wm = Window.partitionBy("event_type")
    c = c.withColumn("a", F.round(F.abs("cusum"), 6)).withColumn(
        "m", F.max("a").over(wm)
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.round(F.max(F.abs("cusum")), 6).alias("max_abs_cusum"),
            F.min(F.when(F.col("a") == F.col("m"), F.col("day"))).alias(
                "drift_day"
            ),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "dup_graph_triangles",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLES_U}
    , ed AS (SELECT src AS a, dst AS b FROM e WHERE src < dst)
    SELECT t.a, t.b, t.c
    FROM (
      SELECT e1.a, e1.b, e2.b AS c
      FROM ed e1 JOIN ed e2 ON e2.a = e1.b
      JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b) t
    ORDER BY t.a, t.b, t.c
    """,
    note="triangle enumeration over the near-dup pair graph — the "
    "graph-analytics step past connected components (triangle density "
    "separates true duplicate CLIQUES from chains of borderline "
    "matches that components alone conflate).  Standard distributed "
    "shape: orient every edge low-id→high-id (each triangle counted "
    "exactly once as a<b<c), one wedge join + one closing edge join — "
    "at scale the orientation is by DEGREE (each wedge enumerated at "
    "its lowest-degree vertex, the classic skew bound); id-orientation "
    "is the deterministic small-graph form the oracle mirrors.  The "
    "oracle reuses the certified Jaccard edge set",
)
def q_dup_graph_triangles(spark, sf_dir):
    u = _docs_self_union(spark, sf_dir)
    pairs = (
        minhash_near_dup_pairs(u, threshold=0.7)
        .select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = pairs
    e2 = pairs.select(F.col("a").alias("b2a"), F.col("b").alias("c"))
    e3 = pairs.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    return (
        e1.join(e2, F.col("b2a") == e1.b)
        .join(e3, (F.col("a3") == e1.a) & (F.col("c3") == F.col("c")))
        .select("a", "b", "c")
        .orderBy("a", "b", "c")
    )


@register(
    "user_activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    g AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
                 PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      FROM days),
    s AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
             min(day) AS streak_start
      FROM g GROUP BY user_id, grp)
    SELECT user_id, max(len) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           min(streak_start) AS first_day
    FROM s GROUP BY user_id ORDER BY user_id
    """,
    note="gaps-and-islands: per-user consecutive-active-day streaks via the "
    "classic day - row_number() group key (consecutive days share a "
    "constant difference).  One distinct shuffle on (user, day) — the "
    "window then runs over ~30 rows per user — plus two partial-agged "
    "groupBys; the engagement-streak shape every activity dashboard "
    "computes, and the same pattern that finds contiguous id ranges or "
    "sensor gaps at 100 TB",
)
def q_user_activity_streaks(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = days.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("streak_start"),
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.min("streak_start").alias("first_day"),
        )
        .orderBy("user_id")
    )


@register(
    "twap_value_by_type",
    """
    WITH o AS (
      SELECT event_type, value,
             epoch_us(lead(ts) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id))
               - epoch_us(ts) AS dur_us
      FROM events)
    SELECT event_type,
           round(sum(value * dur_us) / sum(dur_us), 6) AS twap,
           round(avg(value), 6) AS plain_avg,
           CAST(count(dur_us) AS BIGINT) AS n_intervals
    FROM o WHERE dur_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    note="time-weighted average (the TWAP/time_weight shape from "
    "time-series engines, public semantics): each observation weighted "
    "by its holding interval to the next same-type event (lead() with "
    "event_id tie-break; the open last interval is excluded), so "
    "irregular sampling doesn't bias the mean the way plain avg() does "
    "— both are emitted so the bias is visible.  Durations stay integer "
    "microseconds end-to-end (unit cancels in the ratio; no float time "
    "conversion to drift cross-engine).  One window shuffle on "
    "event_type + one partial-agged groupBy",
)
def q_twap_value_by_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        o.groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twap"),
            F.round(F.avg("value"), 6).alias("plain_avg"),
            F.count("dur_us").cast("long").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


_BM25_TERMS = ("join", "hash", "scan", "filter", "merge")


@register(
    "bm25_topk_docs",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(
                 lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                 '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
    stats AS (
      SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
      WHERE tok IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, tok),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                 * tf.tf * (1.2 + 1)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
               AS score
      FROM tf
      JOIN df ON df.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id LIMIT 20
    """,
    note="BM25 ranked retrieval (Robertson-Sparck Jones; the Lucene "
    "log(1 + (N-df+0.5)/(df+0.5)) idf flavor, k1=1.2 b=0.75) for a fixed "
    "query term set — the lexical side of a RAG retrieval stack next to "
    "the LSH vector path (examples/rag_pipeline.py).  Term filter is "
    "pushed BEFORE the tf groupBy so only query-term postings shuffle; "
    "df and the (N, avgdl) scalars are broadcast-sized; final ranking is "
    "TakeOrdered on the 6-dp-rounded score with doc_id tiebreak (exact "
    "cross-engine order).  ln() under the repo's 6-dp libm-portability "
    "contract",
)
def q_bm25_topk_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(
                F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))),
                r"[^a-z0-9]+",
            ),
            lambda x: x != "",
        ).alias("toks"),
    )
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").cast("double").alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_), on="term")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1
                )
                * F.col("tf")
                * F.lit(1.2 + 1)
                / (
                    F.col("tf")
                    + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@register(
    "clustering_coeff_dup_graph",
    f"""
    WITH {_DUCK_SHINGLES.replace("FROM documents", "FROM documents WHERE doc_id < 500")},
    pairs AS (
      SELECT a.doc_id AS s, b.doc_id AS t
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT s AS node FROM pairs UNION ALL SELECT t AS node FROM pairs)
      GROUP BY node),
    tri AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM pairs e1 JOIN pairs e2 ON e2.s = e1.t
      JOIN pairs e3 ON e3.s = e1.s AND e3.t = e2.t),
    tn AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri)
      GROUP BY node)
    SELECT d.node AS doc_id, d.degree,
           coalesce(tn.n_triangles, 0) AS n_triangles,
           round(CASE WHEN d.degree >= 2
                      THEN 2.0 * coalesce(tn.n_triangles, 0)
                           / (d.degree * (d.degree - 1))
                      ELSE 0 END, 6) AS clustering_coeff
    FROM deg d LEFT JOIN tn ON tn.node = d.node
    ORDER BY doc_id
    """,
    note="local clustering coefficient over the certified duplicate graph — "
    "completes the graph-analytics family (components -> triangles -> "
    "per-node coefficients): 2T(v) / (deg(v)(deg(v)-1)) flags how "
    "clique-like each node's duplicate neighborhood is (1.0 = true "
    "duplicate cluster, ->0 = hub of borderline matches).  Same low-id "
    "edge orientation + wedge/closing joins as dup_graph_triangles, one "
    "partial-agged groupBy each for degrees and per-node triangle "
    "counts; ANSI-safe guarded division",
)
def q_clustering_coeff_dup_graph(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = (
        ngram_jaccard_pairs(d, block_col="lang", n=3, threshold=0.5)
        .select(F.col("id_a").alias("s"), F.col("id_b").alias("t"))
        .localCheckpoint(eager=False)
    )
    deg = (
        pairs.select(F.col("s").alias("node"))
        .unionAll(pairs.select(F.col("t").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    e2 = pairs.select(F.col("s").alias("b2"), F.col("t").alias("c"))
    e3 = pairs.select(F.col("s").alias("a3"), F.col("t").alias("c3"))
    tri = (
        pairs.join(e2, F.col("b2") == pairs.t)
        .join(e3, (F.col("a3") == pairs.s) & (F.col("c3") == F.col("c")))
        .select(F.col("s").alias("a"), F.col("t").alias("b"), "c")
    )
    tn = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    out = deg.join(tn, on="node", how="left").select(
        F.col("node").alias("doc_id"),
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                F.lit(2.0)
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering_coeff"),
    )
    return out.orderBy("doc_id")


# unrolled power-iteration CTEs for the PageRank oracle: fixed
# iteration count => plain (non-recursive) SQL, bit-reproducible
_PR_ITERS = "".join(
    f"""
    m{k} AS (
      SELECT c.dst AS doc_id, sum(r.rank * c.w) AS mass
      FROM c JOIN r{k - 1} r ON r.doc_id = c.src GROUP BY c.dst),
    r{k} AS (
      SELECT v.doc_id,
             (1 - 0.85) / nn.n + 0.85 * coalesce(m{k}.mass, 0) AS rank
      FROM v CROSS JOIN nn LEFT JOIN m{k} USING (doc_id)),"""
    for k in range(1, 6)
)


@register(
    "pagerank_dup_graph",
    f"""
    WITH {_DUCK_SHINGLES.replace("FROM documents", "FROM documents WHERE doc_id < 500")},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
    deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src),
    c AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS w
          FROM e JOIN deg d ON d.src = e.src),
    v AS (SELECT doc_id FROM documents WHERE doc_id < 500),
    nn AS (SELECT count(*)::DOUBLE AS n FROM v),
    r0 AS (SELECT doc_id, 1.0 / nn.n AS rank FROM v CROSS JOIN nn),{_PR_ITERS}
    final AS (SELECT doc_id, rank FROM r5)
    SELECT doc_id, round(rank, 6) AS rank FROM final ORDER BY doc_id
    """,
    note="PageRank over the exact n-gram-Jaccard duplicate graph "
    "(operators/pagerank.py — power iteration, Brin & Page 1998): 5 "
    "fixed iterations at d=0.85 over the lang-blocked pair graph on the "
    "bounded 500-doc slice (the same certified edge set as "
    "ngram_jaccard_block_lang).  Per iteration: one join of the staged "
    "1/outdeg contribution edges with the rank vector + one "
    "partial-agged groupBy on dst; rank vector lineage-cut per round; "
    "driver sees one scalar (N) before the loop and nothing inside it. "
    "Fixed iterations make the result bit-reproducible, so the oracle "
    "unrolls the same 5 steps as plain CTEs and certifies every rank "
    "at 6 dp — iterative graph analytics under a full value-hash gate",
)
def q_pagerank_dup_graph(spark, sf_dir):
    from .operators.pagerank import pagerank

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = ngram_jaccard_pairs(d, block_col="lang", n=3, threshold=0.5)
    pr = pagerank(d.select("doc_id"), pairs, damping=0.85, n_iter=5)
    return pr.select(
        "doc_id", F.round("rank", 6).alias("rank")
    ).orderBy("doc_id")


# --------------------------------------------------------------------- #
# Registry certification-priority rotation.
#
# The driver's CORRECTNESS_r{N}.json records at most the FIRST 50
# registry entries (observed truncation in r2 and r3).  With more than
# 50 registered queries, iteration order therefore decides which
# operators get driver-certified each round.  Policy (pinned here, per
# round-3 verdict):
#
#   1. queries whose last driver row was broken (err/FAIL) or whose
#      output changed since their last row come first;
#   2. then queries NEW this round;
#   3. then queries rotated out LAST round (their newest driver row is
#      two rounds old after this one runs);
#   4. remaining head slots go to once-green queries for a second row;
#   5. the tail is everything green in the PREVIOUS round's driver run
#      — freshest evidence, safest to defer.
#
# Round-6 ordering (per the r5 verdict item 2: drain the driver-
# certification backlog).  The driver's CORRECTNESS gate records only
# the first 50 registry entries per round; after r1-r5, 88 of the 187
# registered queries have never had a driver-written correctness row
# (registry minus the union of CORRECTNESS_r1..r5 names).  This round:
#
#   head  (_CERT_EARLY): exactly the 50 OLDEST never-driver-certified
#          entries, in original registration order (r5b additions
#          first, then r5c, then r5d) — all are oracle-certified by the
#          local sweep; this gives them their first driver row.
#   middle (unlisted):   the remaining 38 never-certified entries, in
#          registration order — they lead r7's window automatically.
#   tail  (_CERT_LATE):  all 99 entries with at least one driver row,
#          least-recently-certified first after the cutoff so any
#          window wider than 50 re-certifies the stalest evidence.
#
# Lists are derived mechanically (tools/rotation_audit.py regenerates
# and checks them); do not hand-edit without re-running the audit.

_CERT_EARLY = [
    "q7_volume_shipping",
    "q8_market_share",
    "q9_nation_profit",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q16_supplier_diversity",
    "doc_concat_shards",
    "sql_api_running_revenue",
    "domain_cap_sample",
    "incremental_dedup_new_docs",
    "streaming_two_level_window",
    "streaming_sink_jsonl_events",
    "stream_attribution_outer",
    "doc_unigram_logprob",
    "corpus_health_by_source",
    "exact_k_sample_docs",
    "hard_negatives_topk",
    "embedding_norm_stats",
    "semantic_dedup_clusters",
    "quantization_error_by_label",
    "dedup_rate_by_source",
    "peak_load_1h",
    "fk_orphan_audit",
    "zipf_slope_words",
    "gains_table_embedding",
    "jackknife_mean_se",
    "label_separation_stats",
    "weekday_seasonality",
    "kfold_assignment_docs",
    "rolling_slope_7d",
    "rfm_user_segments",
    "sql_recursive_calendar",
    "auc_rank_embedding",
    "multimodal_byte_entropy",
    "doc_blocklist_filter",
    "cdc_apply_user_state",
    "chi2_independence_lang_source",
    "heavy_hitters_users",
    "incremental_agg_merge",
    "assign_global_ids_docs",
    "doc_segment_dedup",
    "embedding_int8_quantize",
    "profile_orders_columns",
    "check_constraints_orders",
    "scd2_user_event_type",
    "events_daily_ewma",
    "events_daily_anomaly",
]

_CERT_LATE = [
    "limit_head",
    "set_ops",
    "window_lag_delta",
    "window_moving_avg",
    "event_tumbling_daily",
    "event_sliding_2d",
    "sessionize_counts",
    "doc_fingerprint",
    "doc_token_counts",
    "doc_language_id",
    "word_frequencies",
    "agg_mean_ci_t",
    "agg_welch_pvalue",
    "agg_rollup",
    "agg_cube",
    "pivot_wide",
    "join_broadcast_dim",
    "join_semi",
    "join_anti",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q18_large_orders",
    "udf_country_flag",
    "streaming_dedup_events",
    "streaming_enrich_nation",
    "doc_repetition_stats",
    "doc_pii_scrub",
    "doc_chunk_windows",
    "split_counts",
    "det_sample_ids",
    "stratified_sample_docs",
    "mixture_sample_docs",
    "pack_token_bins_docs",
    "kmeans_clusters",
    "exact_dedup_keep",
    "exact_dedup_groups",
    "minhash_near_dup",
    "ngram_jaccard_block_lang",
    "curation_pipeline",
    "cosine_topk",
    "cosine_topk_lsh",
    "knn_allpairs_small",
    "knn_blocked_lsh",
    "embedding_dup_pairs",
    "multimodal_metadata",
    "multimodal_decode_fake",
    "filter_eq2",
    "dim_index",
    "agg_unique_vals",
    "filter_membership",
    "filter_range_year",
    "filter_window_range",
    "cast_coerce",
    "filter_dropna",
    "proj_prefix_rename",
    "unpivot_melt",
    "agg_mean",
    "agg_extremes",
    "agg_first_last",
    "agg_sem_ci",
    "agg_window_compare",
    "agg_welch_t",
    "agg_grouping_sets",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "event_path_topk",
    "cohort_retention",
    "q15_top_supplier",
    "funnel_conversion",
    "props_json_extract",
    "doc_length_ntile_bins",
    "window_topn_per_group",
    "streaming_tumbling_daily",
    "streaming_tumbling_append",
    "stream_click_attribution",
    "range_join_attribution",
    "streaming_upsert_latest",
    "approx_distinct_users",
    "approx_quantiles_value",
    "session_window_agg",
    "asof_join_last_purchase",
    "streaming_sessionize_state",
    "streaming_funnel_state",
    "doc_quality_score",
    "tfidf_top_terms",
    "weighted_sample_docs",
    "salted_agg_events",
    "skew_join_segment",
    "dup_connected_components",
    "dup_cluster_sizes",
    "doc_length_stats",
    "decontaminate_overlap",
    "decontaminated_corpus",
    "simhash_near_dup",
    "multimodal_features_fake",
]


def _rotated(registry: dict[str, QueryDef]) -> dict[str, QueryDef]:
    listed = set(_CERT_EARLY) | set(_CERT_LATE)
    for name in listed:
        if name not in registry:
            raise KeyError(f"rotation list references unknown query {name!r}")
    middle = [n for n in registry if n not in listed]
    return {n: registry[n] for n in (*_CERT_EARLY, *middle, *_CERT_LATE)}


REGISTRY = _rotated(REGISTRY)
