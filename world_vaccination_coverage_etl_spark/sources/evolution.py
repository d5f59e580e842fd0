"""Schema-evolution reads over a long-lived parquet warehouse.

A warehouse written over months drifts: new columns appear, old ones
disappear, integer widths widen.  Spark's default parquet read takes
one file's footer as the schema and silently drops columns other files
carry, and ``mergeSchema`` refuses type changes outright
(CANNOT_MERGE_SCHEMAS on INT vs BIGINT).  The robust conforming read
is an EXPLICIT user schema: ``spark.read.schema(target).parquet(dir)``
- columns a file lacks surface as typed NULLs,
- columns outside the contract are pruned at the scan,
- narrower physical types (int32 → long, float → double) up-cast in
  the vectorized reader.
That keeps every historical snapshot readable under today's contract
without rewriting old files — the read-side half of schema evolution
(the write side is additive-only appends).

``discover_drift`` is the audit companion: one cheap driver-side
footer pass (no data IO) reporting, per file, the columns added,
missing, or re-typed relative to the contract — the check a warehouse
maintenance job runs before tightening a schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_with_schema_evolution(
    spark: SparkSession, path: str, target_schema: T.StructType
) -> DataFrame:
    """Read a drifted parquet directory conformed to ``target_schema``.

    Missing columns → typed NULLs; extra columns → pruned; compatible
    narrower types → up-cast.  A genuinely incompatible physical type
    (e.g. string where the contract says long) fails loudly at scan
    time, which is the desired behavior for true schema breaks.
    """
    return spark.read.schema(target_schema).parquet(path)


def discover_drift(
    path: str, target_schema: T.StructType
) -> dict[str, dict[str, list[str]]]:
    """Per-file drift report vs the contract (footer reads only).

    Returns ``{file: {"added": [...], "missing": [...],
    "retyped": ["col: filetype -> targettype", ...]}}`` for files that
    drift; conforming files are omitted.
    """
    import pyarrow.parquet as pq

    # map Spark types to the pyarrow spellings a conforming file shows
    spark_to_arrow = {
        "long": {"int64"},
        "integer": {"int32"},
        "double": {"double"},
        "float": {"float"},
        "string": {"string", "large_string"},
        "timestamp": {"timestamp[us]", "timestamp[ms]", "timestamp[us, tz=UTC]"},
        "date": {"date32", "date32[day]"},
        "boolean": {"bool"},
    }
    target = {f.name: f.dataType.typeName() for f in target_schema.fields}
    out: dict[str, dict[str, list[str]]] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        schema = pq.read_schema(os.path.join(path, fname))
        file_types = {n: str(schema.field(n).type) for n in schema.names}
        added = [n for n in file_types if n not in target]
        missing = [n for n in target if n not in file_types]
        retyped = [
            f"{n}: {file_types[n]} -> {t}"
            for n, t in target.items()
            if n in file_types
            and file_types[n] not in spark_to_arrow.get(t, {t})
        ]
        if added or missing or retyped:
            out[fname] = {"added": added, "missing": missing, "retyped": retyped}
    return out
