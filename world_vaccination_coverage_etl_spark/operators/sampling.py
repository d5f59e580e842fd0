"""Deterministic sampling & dataset-split operators.

A training-data pipeline needs reproducible, engine-portable splits:
the same document must land in the same split on every run, on every
engine, at any scale — which rules out ``rand()`` and Spark's
``sample()`` (seed- and partitioning-dependent).  Everything here keys
off the md5 hex digest of a salted id rendered as a string, so Spark
and any SQL oracle agree bit-for-bit, and adding/removing rows never
reshuffles other rows' assignments (the property that keeps train/val
membership stable as a corpus grows).

Scale notes:

- ``hash_split`` / ``deterministic_sample`` are pure row-local
  projections/filters — zero shuffle at any scale.
- ``stratified_exact_sample`` takes one window shuffle per call
  (partitioned by the strata column); use it when exact per-stratum
  counts matter, and the hash-threshold variants when approximate
  proportions are fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars of the digest


def _hash_hex4(id_col: str, salt: str) -> F.Column:
    """First 4 hex chars of md5(salt ':' id) — lowercase hex compares
    lexicographically = numerically, so thresholds are portable strings."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 4
    )


def _frac_threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    buckets = int(fraction * _BUCKETS)
    if buckets >= _BUCKETS:
        # fraction == 1.0: 'g' sorts after every 4-char hex digest, so
        # the `hash < threshold` predicate includes every row ('10000',
        # the naive 5-char encoding, would EXCLUDE digests >= '2')
        return "g"
    return format(buckets, "04x")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val assignment (row-local, no shuffle).

    A row is 'train' iff its 16-bit hash bucket falls below
    ``train_frac`` (quantized to 1/65536); otherwise 'val'.
    """
    thresh = _frac_threshold(train_frac)
    return df.withColumn(
        out_col,
        F.when(_hash_hex4(id_col, salt) < thresh, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Hash-threshold Bernoulli-style sample — row-local, no shuffle,
    reproducible across engines and runs; actual size is binomial
    around ``fraction``."""
    return df.filter(_hash_hex4(id_col, salt) < _frac_threshold(fraction))


def salted_agg_count(
    df: DataFrame,
    key_cols: list[str],
    salt_parts: int = 16,
    value_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation — the skew-mitigation pattern for
    hot keys.

    A plain ``groupBy(key)`` sends EVERY row of a hot key to one
    reducer; salting appends ``hash(row) % salt_parts`` to the key so
    phase 1 spreads each hot key over ``salt_parts`` partial
    aggregates, and phase 2 merges the (tiny) partials.  Counts (and
    any integer/decimal sum) are exactly associative, so those results
    are bit-identical to the unsalted aggregation at any
    ``salt_parts``.  A ``double`` sum is associative only up to FP
    reassociation — salting changes the summation grouping, so the last
    ulps can differ (as they already can between any two Spark
    partitionings); round or cast to DECIMAL before comparing across
    plans, which is what the oracle-checked query does.  (Spark's own
    partial aggregation already does this map-side within a partition;
    explicit salting is the lever when a single key exceeds what one
    reducer can hold.)
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_parts)
    ).alias("__salt")
    aggs1 = [F.count("*").alias("__n")]
    aggs2 = [F.sum("__n").cast("long").alias("n_rows")]
    if value_col:
        aggs1.append(F.sum(value_col).alias("__s"))
        aggs2.append(F.sum("__s").alias(f"sum_{value_col}"))
    partial = df.select(*df.columns, salt).groupBy(*key_cols, "__salt").agg(*aggs1)
    return partial.groupBy(*key_cols).agg(*aggs2)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Per-group mixture resampling — the domain/language re-weighting
    step of a training-data pipeline (e.g. ``{"en": 0.5, "fr": 2.5}``
    halves English and emits each French doc 2-3 times).

    Each row is emitted ``floor(rate)`` times unconditionally, plus one
    more copy iff its hash bucket falls below ``frac(rate)`` — so
    downsampling (rate < 1) is a deterministic hash-threshold filter
    and upsampling (rate > 1) is a row-local ``explode`` over
    ``sequence(0, n_copies-1)``; expected multiplicity is exactly the
    rate and membership is stable under corpus growth (same salted-md5
    contract as `hash_split`).  ``copy_col`` disambiguates the emitted
    copies (0-based) so downstream packing/shuffling treats them as
    distinct examples.

    Scale: zero shuffle.  The rates map becomes an inline CASE over
    ``group_col`` (a handful of literals, not a join), and the explode
    multiplies rows locally in the scan stage.  Rates are quantized to
    1/65536 like every hash threshold here.
    """
    for g, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {g!r} must be >= 0, got {r}")
    if default_rate < 0:
        raise ValueError(f"default_rate must be >= 0, got {default_rate}")

    def n_copies(rate: float) -> F.Column:
        whole = int(rate)
        thresh = _frac_threshold(rate - whole)
        return F.lit(whole) + F.when(
            _hash_hex4(id_col, salt) < thresh, F.lit(1)
        ).otherwise(F.lit(0))

    expr = n_copies(default_rate)
    for g, r in rates.items():
        expr = F.when(F.col(group_col) == g, n_copies(r)).otherwise(expr)
    return (
        df.withColumn("__n_copies", expr)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis–Spirakis exponential-race construction, "Weighted random
    sampling with a reservoir", IPL 2006 — public literature).

    Each row gets key = ln(u) / w with u hash-uniform in (0, 1); the k
    LARGEST keys win, which selects rows with probability proportional
    to weight.  u comes from the salted-md5 contract (first 8 digest
    hex chars as a 32-bit integer, +0.5, /2^32) instead of ``rand()``,
    so the sample is bit-stable across runs, partitionings, and engines
    — the property every other operator in this module guarantees.
    Ranking compares the key ROUNDED to 9 dp with the id as tiebreak so
    engines whose libm ln() differs in the last ulp still agree.

    Rows with weight <= 0 or NULL are excluded (never sampled).

    Scale: global flavor (``strata_col=None``) is TakeOrdered — top-k
    without a full sort, only k rows cross to the driver-side limit.
    Stratified flavor is one window shuffle partitioned by the stratum.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    key = F.round(F.log(u) / F.col(weight_col), 9)
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__key", key)
    if strata_col is None:
        return keyed.orderBy(F.desc("__key"), F.col(id_col)).limit(k).drop("__key")
    w = Window.partitionBy(strata_col).orderBy(F.desc("__key"), F.col(id_col))
    return (
        keyed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__key", "__rk")
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ksample",
) -> DataFrame:
    """Exactly-``k`` uniform sample: the k smallest salted-md5 digests.

    The fixed-budget companion to :func:`deterministic_sample` (whose
    output size is binomial around the fraction): hash order is a
    uniform random permutation of the rows, so its k-prefix is an
    exact-size uniform sample — deterministic across runs,
    partitionings, and engines, and stable under corpus growth in the
    sense that a surviving row only leaves when a new row hashes below
    the current k-th digest.

    Scale: ``ORDER BY hash LIMIT k`` plans as TakeOrderedAndProject —
    per-partition k-row heaps, then one merge of k × partitions rows;
    no full sort, no shuffle of the data.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    u = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return (
        df.withColumn("__u", u)
        .orderBy("__u", F.col(id_col))
        .limit(k)
        .drop("__u")
    )


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Exact-count stratified sample: ceil(fraction × |stratum|) rows
    per stratum, chosen by hash order (deterministic, unbiased by any
    input ordering).  One window shuffle on the strata column."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    order = Window.partitionBy(strata_col).orderBy(
        _hash_hex4(id_col, salt), F.col(id_col)
    )
    whole = Window.partitionBy(strata_col)
    return (
        df.withColumn("__rk", F.row_number().over(order))
        .withColumn("__n", F.count("*").over(whole))
        .filter(F.col("__rk") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rk", "__n")
    )


def capped_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    cap: int = 50,
    salt: str = "cap",
    salt_parts: int = 16,
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` rows per group, chosen by
    a deterministic salted-md5 order.

    The domain-cap step every web-scale corpus runs (bound how much any
    one source/domain contributes) — an unbiased, growth-stable random
    prefix per group: ordering by md5(salt ':' id) makes the kept
    subset (a) independent of ingestion order, (b) stable when other
    groups grow, and (c) reproducible from any engine.

    Scale design: a naive row_number() over (group) puts a hot domain's
    every row through ONE task.  This runs two phases — phase 1 ranks
    within (group, hash-part) so a hot group spreads over
    ``salt_parts`` tasks and each emits at most ``cap`` survivors;
    phase 2 re-ranks the <= cap x salt_parts survivors per group.  The
    result is provably identical to the single-window form (any row in
    the global top-cap is in its own part's top-cap), which is exactly
    what the DuckDB oracle computes.  The internal part key uses
    xxhash64 — engine-local is fine, it never reaches the output.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    u = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    part = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_parts))
    w1 = Window.partitionBy(group_col, "__part").orderBy("__u", id_col)
    w2 = Window.partitionBy(group_col).orderBy("__u", id_col)
    return (
        df.withColumn("__u", u)
        .withColumn("__part", part)
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= cap)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= cap)
        .drop("__u", "__part", "__rn1", "__rn")
    )
