"""Cost-based-optimizer evidence: ANALYZE TABLE statistics reach the
optimizer and change broadcast decisions.

At 100 TB, join strategy should come from REAL table/column statistics,
not file-size guesses. These pins assert (1) ANALYZE TABLE row counts
and column stats are visible to Catalyst, and (2) a statistics-known
small table wins an auto-broadcast it would otherwise get only from
its on-disk size.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_analyze_table_stats_reach_catalyst(spark):
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("grp")
    ).write.mode("overwrite").saveAsTable("cbo_fact")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS FOR COLUMNS k, grp")
    # row counts propagate into plan statistics only under CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table("cbo_fact")._jdf.queryExecution()
            .optimizedPlan().stats()
        )
        assert stats.rowCount().get() == 5000
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
    desc = {
        r.info_name: r.info_value
        for r in spark.sql("DESCRIBE EXTENDED cbo_fact k").collect()
    }
    # distinct_count is an HLL estimate — assert it's in range, not exact
    assert abs(int(desc["distinct_count"]) - 5000) <= 500
    assert desc["min"] == "0" and desc["max"] == "4999"


def test_stats_drive_auto_broadcast(spark):
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.mode("overwrite").saveAsTable("cbo_big")
    spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("tag")
    ).write.mode("overwrite").saveAsTable("cbo_dim")
    for t in ("cbo_big", "cbo_dim"):
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
    df = spark.table("cbo_big").join(spark.table("cbo_dim"), "k")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 50-row dim must broadcast WITHOUT an explicit hint — the
    # size decision comes from catalog statistics
    assert "BroadcastHashJoin" in plan
