"""Salted skew-join tests (operators/skewjoin.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.operators.skewjoin import (
    salted_skew_join,
)


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # one hot key (0) holding half the fact rows
    big = spark.range(0, 4000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 37).alias("k"),
    )
    small = spark.range(0, 37).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("attr")
    )
    return big, small


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_equals_plain(skewed_pair):
    big, small = skewed_pair
    plain = big.join(small, ["k"], "inner").select("k", "row_id", "attr")
    salted = salted_skew_join(big, small, ["k"], salt_parts=8).select(
        "k", "row_id", "attr"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_left_and_anti_equal_plain(spark, skewed_pair):
    big, small = skewed_pair
    # drop some dim keys so left/anti semantics are observable
    part_small = small.filter(F.col("k") < 20)
    for how in ("left", "left_anti"):
        plain = big.join(part_small, ["k"], how)
        salted = salted_skew_join(big, part_small, ["k"], salt_parts=4, how=how)
        assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_validation(skewed_pair):
    big, small = skewed_pair
    with pytest.raises(ValueError, match="preserves the big side"):
        salted_skew_join(big, small, ["k"], how="full_outer")
    with pytest.raises(ValueError, match="salt_parts"):
        salted_skew_join(big, small, ["k"], salt_parts=0)
