"""Runtime observability surfaces: observe() metrics and malformed-row
handling on ingest.

observe() is how a production pipeline gets row counts / null counts /
accuracy gates out of a job WITHOUT a second pass — the metrics ride
the same execution. Malformed-record capture is the ETL contract for
dirty feeds: quarantine, don't crash, don't silently drop.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observe_metrics_ride_the_single_pass(spark):
    obs = Observation("etl_gate")
    df = (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.col("id") * 2)
            .alias("v"),
        )
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").isNull().cast("long")).alias("n_nulls"),
            F.max("v").alias("max_v"),
        )
    )
    assert df.filter(F.col("v").isNotNull()).count() == 900
    m = obs.get
    assert m["n_rows"] == 1000 and m["n_nulls"] == 100 and m["max_v"] == 1998


def test_csv_permissive_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\nbroken\n4,40\n")
    schema = "id INT, qty INT, _corrupt_record STRING"
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema)
        .csv(str(p))
        .cache()  # corrupt-record column requires a materialized read
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert sorted(r.id for r in good.collect()) == [1, 3, 4]
    quarantined = {r._corrupt_record for r in bad.collect()}
    assert quarantined == {"2,notanumber", "broken"}


def test_csv_dropmalformed_keeps_only_clean_rows(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("id,qty\n1,10\nbroken\n3,30\n")
    df = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema("id INT, qty INT")
        .csv(str(p))
    )
    assert sorted(r.id for r in df.collect()) == [1, 3]
