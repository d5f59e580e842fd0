"""Reshaping operators (SURVEY.md §2.3).

The reference's only reshape is the wide→long melt (etl_pipeline.py:68-73).
``unpivot_measures`` generalizes it for any table: id columns + a list of
measure columns → (variable, value) long format.  Spark's native
``unpivot`` lowers to a Catalyst Expand node — one pass over the scan,
zero shuffle, and column pruning still reaches the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_measures(
    df: DataFrame,
    ids: list[str],
    values: list[str],
    variable_col: str = "measure",
    value_col: str = "value",
    drop_nulls: bool = True,
) -> DataFrame:
    """Wide → long unpivot with pandas-melt null semantics.

    Measures of heterogeneous numeric types are cast to double first so
    the unpivoted value column has a single type (matching the oracle).
    """
    casted = df.select(
        *[F.col(c) for c in ids],
        *[F.col(c).cast("double").alias(c) for c in values],
    )
    out = casted.unpivot(
        ids=ids, values=values, variableColumnName=variable_col, valueColumnName=value_col
    )
    if drop_nulls:
        out = out.na.drop(subset=[value_col])
    return out
