"""Window functions (§2.6) and scalar functions / UDF (§2.9).

Split from the former single-file queries.py (r5 verdict item 8);
registration order is preserved by the package __init__ import order.
"""

from ._core import *  # noqa: F401,F403

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
    from ..functions.flags import _NAME_TO_ALPHA2, WHITE_FLAG, _alpha2_to_flag

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


