"""Joins + TPC-H core adaptations (SURVEY §2.4 note).

Split from the former single-file queries.py (r5 verdict item 8);
registration order is preserved by the package __init__ import order.
"""

from ._core import *  # noqa: F401,F403

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
        .join(c, o.o_custkey == c.c_custkey)
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
    "survivor set (~0.1% of orders) joins into the orders "
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
        o.join(big, o.o_orderkey == big.l_orderkey)
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
    "lineitem scan, the part side is left unhinted (AQE broadcast-converts at small SF, sort-merge at 100 TB where part grows with SF), conditional aggregation in "
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
        li.join(p, p.p_partkey == li.l_partkey)
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
    "disjunction after the join (AQE picks the strategy; part grows with SF so no forced hint) — scan-prunes without changing "
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
        li.join(p, p.p_partkey == li.l_partkey)
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
    "pattern with no driver round-trip; supplier join unhinted "
    "(SF-proportional). Equality on "
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
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
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
    "roles — both explicit broadcasts; supplier is unhinted (SF-proportional) — so the only "
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
        li.join(s, s.s_suppkey == li.l_suppkey)
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
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
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
    "predicate pushes to the part scan as a string filter, the part join "
    "prunes lineitem FIRST (part/supplier unhinted — SF-proportional; nation "
    "broadcast), one partial-agged "
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
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
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
    # aggregate BEFORE the outer join (guide §2.3): the per-custkey
    # order count partial-aggregates map-side and the join then carries
    # one row per customer-with-orders instead of one per order row;
    # count(o_orderkey) over the left join == coalesce(n, 0) here
    # because o_orderkey is never NULL on matched rows (r14 opt).
    per_cust = (
        c.join(
            o.groupBy("o_custkey").agg(
                F.count(F.lit(1)).alias("__n")
            ),
            c.c_custkey == F.col("o_custkey"),
            "left",
        )
        .select(F.coalesce("__n", F.lit(0)).alias("c_count"))
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
    "scan and the brand-filtered part join prunes lineitem before the threshold "
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
        li.join(p, p.p_partkey == li.l_partkey)
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
    "NOT EXISTS. Supplier join unhinted (SF-proportional), TakeOrdered top-k with name tiebreak",
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
        l1.join(s, s.s_suppkey == l1.l_suppkey)
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
    "decorrelates to a per-part aggregate joined back as an equi join "
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
        cost.join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select("l_partkey", "unit_cost", "s_name", "n_name")
    )
    # per-part min via a PARTITIONED window instead of the aggregate +
    # join-back: the join-back form consumed the expensive cost
    # exchange twice (profiled ~5.5 s executor time per consumer at
    # sf0.1 — the reduce-side aggregation re-ran per consumer even
    # though the exchange itself was reused); the window form
    # aggregates once and adds one small exchange on l_partkey.
    # Equality semantics are identical: unit_cost is rounded to 4 dp
    # before the comparison in both forms, and ALL suppliers tying at
    # the min survive (r13 optimization round, 1.85 -> 1.59 s).
    w_mc = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("_mc", F.min("unit_cost").over(w_mc))
        .filter(F.col("unit_cost") == F.col("_mc"))
        .drop("_mc")
        .join(p, p.p_partkey == F.col("l_partkey"))
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
        .join(p, p.p_partkey == F.col("l_partkey"))
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
    from ..operators.packing import concat_shards

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
    from ..operators.sampling import capped_per_group

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
    from ..operators.dedup import normalized_text

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
    note="quartile binning per language via exact NTILE semantics "
    "(curriculum/bucketing shape).  A window partitioned only by lang "
    "is a skew trap at 100 TB — one language is half the corpus "
    "through one reducer — so the cut uses the two-phase bucketed "
    "ntile (operators/ranks.py, r11 verdict item 4) in per-partition "
    "mode: per-lang n_chars range buckets (boundary-value ties "
    "sub-split by doc_id range) computed in one fused quantile job, "
    "per-(lang,bucket) exact offsets in one count job, then a "
    "(lang,bucket)-parallel window + the closed-form tile map; "
    "ntile's extra-rows-to-early-buckets rule is identical across "
    "engines",
)
def q_doc_length_ntile_bins(spark, sf_dir):
    from ..operators.ranks import RankSpec, two_phase_ntile

    # narrow projection BEFORE the rank: the bucket window shuffles
    # (lang, n_chars, doc_id), never the text payload
    d = _t(spark, sf_dir, "documents").select("lang", "n_chars", "doc_id")
    return (
        two_phase_ntile(
            d,
            4,
            RankSpec("n_chars", "doc_id"),
            partition_cols=["lang"],
            out_col="bin",
            num_buckets=8,
        )
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


