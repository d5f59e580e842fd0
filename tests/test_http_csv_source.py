"""HTTP CSV Python DataSource (sources/http_csv_source.py)."""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.sources.http_csv_source import (
    register_http_csv,
)

DDL = "entity string, year int, coverage__bcg double"


@pytest.fixture()
def csv_urls(tmp_path):
    a = tmp_path / "a.csv"
    # mixed-case headers + an undeclared extra column: the reference's
    # case-insensitive resolution must apply and extras must drop
    a.write_text("Entity,Year,coverage__BCG,junk\nAland,1990,70.5,x\nAland,1991,71.0,y\n")
    b = tmp_path / "b.csv"
    b.write_text("entity,year,coverage__bcg,junk\nBorland,1990,60.0,z\n")
    return [a.as_uri(), b.as_uri()]


def test_http_csv_reads_multiple_urls_in_parallel(spark, csv_urls):
    register_http_csv(spark)
    df = (
        spark.read.format("http_csv")
        .schema(DDL)
        .option("urls", ",".join(csv_urls))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per URL
    rows = {(r.entity, r.year, r.coverage__bcg) for r in df.collect()}
    assert rows == {
        ("Aland", 1990, 70.5),
        ("Aland", 1991, 71.0),
        ("Borland", 1990, 60.0),
    }
    assert dict(df.dtypes) == {
        "entity": "string", "year": "int", "coverage__bcg": "double",
    }


def test_http_csv_missing_declared_column_is_typed_null(spark, tmp_path):
    register_http_csv(spark)
    p = tmp_path / "nocov.csv"
    p.write_text("entity,year\nAland,1990\n")
    df = (
        spark.read.format("http_csv")
        .schema(DDL)
        .option("urls", p.as_uri())
        .load()
    )
    row = df.collect()[0]
    assert row.entity == "Aland" and row.year == 1990
    assert row.coverage__bcg is None


def test_http_csv_requires_schema(spark, tmp_path):
    register_http_csv(spark)
    p = tmp_path / "x.csv"
    p.write_text("a\n1\n")
    with pytest.raises(Exception, match="explicit .schema"):
        spark.read.format("http_csv").option("urls", p.as_uri()).load().collect()


def test_http_csv_feeds_the_etl_unpivot(spark, csv_urls):
    """End-to-end: the custom source slots into the reference ETL's
    melt step exactly like the staged-file scan does."""
    from world_vaccination_coverage_etl_spark.operators.reshape import (
        unpivot_measures,
    )

    register_http_csv(spark)
    wide = (
        spark.read.format("http_csv")
        .schema(DDL)
        .option("urls", ",".join(csv_urls))
        .load()
    )
    tidy = unpivot_measures(
        wide,
        ids=["entity", "year"],
        values=[c for c in wide.columns if c.startswith("coverage__")],
        variable_col="antigen",
        value_col="coverage_pct",
    )
    assert tidy.count() == 3
    assert {r.antigen for r in tidy.collect()} == {"coverage__bcg"}


def test_http_csv_pushes_equality_filters(spark, csv_urls):
    register_http_csv(spark)
    df = (
        spark.read.format("http_csv")
        .schema(DDL)
        .option("urls", ",".join(csv_urls))
        .load()
        .filter("entity = 'Aland' AND year > 1989")
    )
    rows = {(r.entity, r.year) for r in df.collect()}
    assert rows == {("Aland", 1990), ("Aland", 1991)}
    # the equality filter is claimed by the source (absent from the
    # post-scan Filter), the range filter stays with Spark
    plan = df._jdf.queryExecution().executedPlan().toString()
    post = [ln for ln in plan.splitlines() if "Filter" in ln and "year" in ln]
    assert post, "range filter must remain a Spark post-scan filter"
    assert not any(
        "entity" in ln and "Aland" in ln for ln in post
    ), "pushed equality must not be re-evaluated by Spark"


def test_http_csv_stream_incremental_manifest(spark, tmp_path):
    """Streaming flavor: offsets = consumed manifest lines. Two
    AvailableNow runs over one checkpoint — the second must ingest ONLY
    the URL appended between runs (checkpointed offset resume)."""
    import uuid

    register_http_csv(spark)
    a = tmp_path / "a.csv"
    a.write_text("entity,year,coverage__bcg\nAland,1990,70.5\n")
    b = tmp_path / "b.csv"
    b.write_text("entity,year,coverage__bcg\nBorland,1991,60.0\n")
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(a.as_uri() + "\n")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("http_csv")
            .schema(DDL)
            .option("manifest", str(manifest))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = {(r.entity, r.year) for r in spark.read.parquet(out).collect()}
    assert first == {("Aland", 1990)}

    manifest.write_text(a.as_uri() + "\n" + b.as_uri() + "\n")
    run_once()
    both = [(r.entity, r.year) for r in spark.read.parquet(out).collect()]
    # a.csv must NOT be re-ingested: offset resumed past manifest line 1
    assert sorted(both) == [("Aland", 1990), ("Borland", 1991)]
