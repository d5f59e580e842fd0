"""Spark 4 API surfaces: Python UDTFs and string collations.

Pytest-pinned rather than registered: a Python UDTF is row-at-a-time
Python in the plan (the repo's hot paths stay JVM/Arrow), and
collation behavior is a comparison semantic, not a query shape — but
both belong to the engine's complete API surface, so their contracts
are pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_python_udtf_lateral_join(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram string, pos int")
    class ExplodeNgrams:
        def eval(self, text: str, n: int):
            toks = (text or "").split()
            for i in range(max(len(toks) - n + 1, 0)):
                yield " ".join(toks[i : i + n]), i

    spark.udtf.register("explode_ngrams", ExplodeNgrams)
    try:
        rows = spark.sql(
            "SELECT t.ngram, t.pos FROM VALUES ('a b c d') AS v(s), "
            "LATERAL explode_ngrams(v.s, 2) t ORDER BY t.pos"
        ).collect()
        assert [(r.ngram, r.pos) for r in rows] == [
            ("a b", 0),
            ("b c", 1),
            ("c d", 2),
        ]
    finally:
        spark.sql("DROP TEMPORARY FUNCTION IF EXISTS explode_ngrams")


def test_collation_case_insensitive_compare_and_group(spark):
    df = spark.createDataFrame(
        [("Alpha",), ("ALPHA",), ("alpha",), ("Beta",)], "s string"
    )
    ci = df.select(F.collate(F.col("s"), "UTF8_LCASE").alias("s"))
    # case-insensitive equality under the collation
    assert ci.filter(F.col("s") == "alpha").count() == 3
    # grouping merges case variants; min() picks a deterministic repr
    grouped = {
        r.n for r in ci.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert grouped == {3, 1}
    # the default binary collation keeps them distinct
    assert df.filter(F.col("s") == "alpha").count() == 1
    assert df.select("s").distinct().count() == 4


def test_parameterized_sql_named_args(spark):
    # parameterized spark.sql — typed substitution, no string splicing
    row = spark.sql(
        "SELECT :base * 2 AS v, upper(:name) AS s",
        args={"base": 21, "name": "spark"},
    ).collect()[0]
    assert row.v == 42 and row.s == "SPARK"
    # parameters reach filters over real tables too
    df = spark.range(0, 100)
    df.createOrReplaceTempView("param_t")
    n = spark.sql(
        "SELECT count(*) AS n FROM param_t WHERE id < :cut",
        args={"cut": 10},
    ).collect()[0].n
    assert n == 10
