"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in
``world_vaccination_coverage_etl_spark.queries.REGISTRY`` — every
SURVEY.md §2 operator plus the large-scale dedup / similarity / text
extension operators, each as a (Spark callable, DuckDB oracle SQL)
pair.  This module just adapts it to the driver's function signatures.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from world_vaccination_coverage_etl_spark.queries import REGISTRY
from world_vaccination_coverage_etl_spark.queries._core import resolve_oracle

SF0001_DIR = "/root/testdata/sf0.001"
# The driver certifies queries() against oracle_sql() at sf=0.01; a
# few oracles are data-adaptive callables (their SQL embeds a plan
# constant derived from the warehouse, e.g. the LSH bit count) and are
# resolved here against the driver's certification warehouse.
CERT_SF_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the Q1-style pricing summary
    (filter → grouped decimal-safe aggregation), per SURVEY.md §7.2 M0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI oracle per query; non-SQL-expressible ops
    (t-CDF p-values, the flag UDF, LSH internals) are omitted so the
    driver records its weaker rows-only check for them.

    Data-adaptive oracles resolve against the certification warehouse;
    if one cannot resolve on this host (warehouse missing, pyarrow
    absent), it degrades to a rows-only check for THAT query instead
    of aborting the whole dict (ADVICE r7)."""
    out: dict[str, str] = {}
    for name, qd in REGISTRY.items():
        if not qd.oracle:
            continue
        try:
            out[name] = resolve_oracle(qd, CERT_SF_DIR)
        except Exception:  # noqa: BLE001 - one bad resolve must not drop 188 oracles
            continue
    return out
