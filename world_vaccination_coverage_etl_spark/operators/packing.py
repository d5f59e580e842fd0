"""Sequence packing — greedy token-bin assignment for training batches.

LLM training consumes fixed-size context windows; feeding one short
document per window wastes most of the batch.  Packing concatenates
documents until a token budget is full, so the operator every training
pipeline runs between curation and tokenized-shard writing is: assign
each example to a *bin* such that each bin's token total stays within
the context budget.

This module implements the standard greedy sequential rule (the one
used by streaming packers): walk the group's examples in a
deterministic order, keep a running fill, and open a new bin whenever
adding the next example would overflow the capacity.  An example
longer than the capacity gets a bin of its own (downstream truncation
is a separate, explicit step — see `chunk_text_windows` for the
splitting alternative).

Scale design
------------

Packing is a sequential scan *per group* — there is no
order-independent formulation (bin N's contents depend on bins
0..N-1).  The scale lever is therefore the GROUPING, not the scan:

- group by a bounded-size key (here: language, optionally sub-sharded
  by a hash via ``shard_col``) so each group fits one task comfortably;
- one shuffle on the group key, then an Arrow-batched linear pass per
  group (`applyInPandas`) — O(n) per group, groups in parallel across
  executors;
- at 100 TB you pack within output shards anyway (a global pack would
  serialize the corpus); ``shard_col`` is that contract made explicit:
  pass e.g. ``pmod(xxhash64(id), 1024)`` and bins are scoped per
  (group, shard), each shard an independent, bounded scan.

Cross-engine determinism: examples are walked in ascending ``id_col``
order within each group, so any engine that implements the same rule
(the DuckDB oracle does, via a recursive CTE) produces the identical
assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_token_bins(
    df: DataFrame,
    tokens_col: str,
    capacity: int,
    group_col: str,
    id_col: str = "doc_id",
    shard_col: str | None = None,
    bin_col: str = "bin_idx",
) -> DataFrame:
    """Greedy sequential bin packing within each group.

    Returns one row per input example with its 0-based ``bin_col``
    assignment (scoped per group, or per (group, shard) when
    ``shard_col`` is given), plus the post-placement ``bin_fill`` —
    the running token total of the example's bin at the moment it was
    placed (the last example of a bin therefore carries the bin's
    final size, which is what the packing-efficiency audit reads).

    Invariants (pinned by tests and the oracle):
    - walking ids in ascending order, ``bin_col`` is non-decreasing
      and increments by at most 1;
    - a bin's final fill is <= capacity unless the bin holds a single
      over-long example.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    keys = [group_col] + ([shard_col] if shard_col else [])
    src = df.select(*keys, id_col, tokens_col)
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in src.dtypes]
        + [f"`{bin_col}` bigint", "`bin_fill` bigint"]
    )
    cap = int(capacity)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].to_numpy(dtype=np.int64)
        bins = np.empty(len(toks), dtype=np.int64)
        fills = np.empty(len(toks), dtype=np.int64)
        b = 0
        fill = 0
        for i in range(len(toks)):
            t = toks[i]
            if i > 0 and fill + t > cap:
                b += 1
                fill = 0
            fill += t
            bins[i] = b
            fills[i] = fill
        pdf[bin_col] = bins
        pdf["bin_fill"] = fills
        return pdf

    return src.groupBy(*keys).applyInPandas(_pack, schema=out_schema)


def concat_shards(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
    salt: str = "shard",
    hex_chars: int = 1,
    sep: str = "\n\n",
):
    """Assemble pretraining text shards: deterministic shard assignment
    plus an ordered, separator-joined concatenation per (group, shard).

    The step between curation and tokenization in a training-data
    pipeline is shard assembly — documents are concatenated (with a
    separator the tokenizer maps to a document boundary) into files of
    bounded size.  Two properties matter at scale:

    - *assignment is row-local and engine-portable*: shard =
      first ``hex_chars`` hex chars of md5(salt ':' id), the same
      salted-md5 contract as `hash_split` (operators/sampling.py), so
      membership is stable under corpus growth and reproducible from
      any engine — no ``monotonically_increasing_id``, no partition
      dependence;
    - *assembly is one shuffle, all JVM*: groupBy (group, shard) then
      ``array_sort(collect_list(struct(id, text)))`` — struct sort
      orders by the leading id field, giving a deterministic
      concatenation order — flattened via ``transform`` +
      ``array_join``.  Per-group state is bounded by the shard fanout
      (16^hex_chars shards x group cardinality), the same lever
      `pack_token_bins` documents: size hex_chars so a shard's text
      fits a task.

    Returns one row per (group..., shard) with ``n_docs``,
    ``total_chars`` (sum of ``length(text)``), and ``text_digest`` =
    md5 of the joined shard text — the digest certifies the exact
    ordered concatenation without materializing megabytes into the
    result set (the full text stays available via ``shard_text_col``
    if requested).
    """
    shard = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        1,
        hex_chars,
    )
    joined = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t"))
                )
            ),
            lambda s: s["t"],
        ),
        sep,
    )
    return (
        df.withColumn("shard", shard)
        .groupBy(*group_cols, "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length(text_col)).cast("long").alias("total_chars"),
            F.md5(joined).alias("text_digest"),
        )
    )
