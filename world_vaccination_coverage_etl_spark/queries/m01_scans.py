"""SURVEY §2.1/2.2 scans, filters, projections; §2.3 unpivot.

Split from the former single-file queries.py (r5 verdict item 8);
registration order is preserved by the package __init__ import order.
"""

from ._core import *  # noqa: F401,F403

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


