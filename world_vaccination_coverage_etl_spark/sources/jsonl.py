"""JSONL (newline-delimited JSON) export / import.

The handoff format of LLM training pipelines: one JSON object per
line, schema carried in-band, consumable by any loader.  Spark's
native ``json`` source IS JSONL (one object per line, partition-
parallel both ways), so these are thin contracts over it:

- ``write_jsonl``: partition-parallel export (the 100 TB path), or a
  deterministic single file (coalesce(1) + optional sort) for handoff
  artifacts small enough to hand to a tokenizer driver;
- ``read_jsonl``: schema-EXPLICIT read — schema inference over 100 TB
  of JSON is a full extra scan and can silently widen/narrow types
  between runs, so the contract requires the caller to declare it.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    order_by: list[str] | None = None,
) -> str:
    """Write ``df`` as JSONL.  Default: a partition-parallel directory
    of ``part-*.json`` files.  ``single_file=True``: one ``.jsonl``
    file at exactly ``path`` (deterministic when ``order_by`` pins the
    line order) — the small-artifact handoff shape only.
    """
    if not single_file:
        df.write.mode("overwrite").json(path)
        return path
    staging = path + "._staging"
    out = df.orderBy(*order_by) if order_by else df
    out.coalesce(1).write.mode("overwrite").json(staging)
    part = glob.glob(os.path.join(staging, "part-*"))
    if len(part) != 1:  # pragma: no cover - coalesce(1) guarantees one
        raise RuntimeError(f"expected one part file, found {part}")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.move(part[0], path)
    shutil.rmtree(staging)
    return path


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSONL under an explicit schema (DDL string or StructType).

    Corrupt lines surface in the standard ``_corrupt_record`` column
    when the schema declares it; otherwise they become NULL rows —
    callers validating ingest should declare it and filter.
    """
    return spark.read.schema(schema).json(path)
