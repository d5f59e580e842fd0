"""Embedding quantization for vector-index storage.

Symmetric per-vector int8 scalar quantization — the standard first
compression step of a large ANN index (4x smaller than float32, SIMD
int8 dot products at query time): ``scale = max|x| / 127``,
``q_i = round(x_i / scale)``.

Everything is built-in Catalyst HOF expressions (transform / filter /
aggregate) over the ``array<float>`` column — no Python in the path,
fully codegen'd, zero shuffle (row-local).  The certification columns
are chosen to be bit-exact across engines: the quantized codes are
INTEGERS (sums of them are exact, no float summation-order drift) and
``max|x|`` is order-independent, so the oracle comparison carries no
tolerance beyond the one 6-dp round on the scale itself.

At 100 TB the operator's shape is unchanged: a narrow row-local map
over the vector column; the quantized array would be written back as
``array<tinyint>`` next to (or instead of) the float column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", keep_cols: tuple = ("vec_id", "label")
) -> DataFrame:
    """Per-vector symmetric int8 quantization summary.

    Output per row: ``scale6`` (the quantizer step, 6 dp), ``q_sum`` /
    ``q_l1`` (exact integer sum and L1 norm of the int8 codes — the
    reproducibility certificate), ``n_sat`` (codes at the +/-127
    saturation boundary; always >= 1 for non-zero vectors since the max
    element maps to exactly 127).
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(emb, F.abs))
    scale = F.greatest(max_abs / F.lit(127.0), F.lit(1e-12))
    q = F.transform(emb, lambda x: F.round(x / scale).cast("long"))
    return df.select(
        *keep_cols,
        F.round(scale, 6).alias("scale6"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("q_l1"),
        F.size(F.filter(q, lambda x: F.abs(x) >= 127)).cast("long").alias("n_sat"),
    )


def quantize_int8_arrow(
    df: DataFrame, vec_col: str = "embedding", keep_cols: tuple = ("vec_id", "label")
) -> DataFrame:
    """Arrow fast path for :func:`quantize_int8` — identical outputs.

    The HOF flavor above is the oracle-parity/documentation form;
    its ``aggregate()`` folds are INTERPRETED (~100 µs each), which is
    ~0.5 ms/row at dim 64 — hours at 10⁹ vectors.  This kernel does
    the same math as one numpy pass per Arrow batch (the repo-wide
    candidate-volume split: HOFs for reporting, Arrow for volume).

    Rounding contract: codes use sign(x)·floor(|x|/scale + 0.5) —
    HALF-AWAY-FROM-ZERO, exactly Spark's round() and DuckDB's
    round(), so all three paths agree bit-for-bit on the integer
    certificates.
    """
    import pandas as pd
    from pyspark.sql import types as T

    fields = [df.schema[c] for c in keep_cols]
    out_schema = T.StructType(
        list(fields)
        + [
            T.StructField("scale6", T.DoubleType()),
            T.StructField("q_sum", T.LongType()),
            T.StructField("q_l1", T.LongType()),
            T.StructField("n_sat", T.LongType()),
        ]
    )

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            scale = np.maximum(np.abs(m).max(axis=1) / 127.0, 1e-12)
            q = np.sign(m) * np.floor(
                np.abs(m) / scale[:, None] + 0.5
            )
            out = pd.DataFrame({c: pdf[c].to_numpy() for c in keep_cols})
            out["scale6"] = np.round(scale, 6)
            out["q_sum"] = q.sum(axis=1).astype("int64")
            out["q_l1"] = np.abs(q).sum(axis=1).astype("int64")
            out["n_sat"] = (np.abs(q) >= 127).sum(axis=1).astype("int64")
            yield out

    return df.select(*keep_cols, vec_col).mapInPandas(kernel, out_schema)
