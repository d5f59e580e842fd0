"""Query registry: every SURVEY.md §2 operator as a (Spark plan, DuckDB
oracle SQL) pair over the driver's star schema, plus the large-scale
extension operators (dedup / similarity / text / JSON / event-time).

Contract (driver, __spark_entry__.py): each entry's Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL must produce
identical column names, types, and values in DuckDB.  Determinism rules
applied throughout:

- every float-valued output is ``round()``-ed identically on both sides;
- money aggregates go through DECIMAL(18,2) casts so distributed vs
  single-node summation order cannot produce differing bits;
- every ordered/limited query carries a full tie-breaker key;
- timestamps are cast to DATE (or formatted) at the output edge so
  engine timestamp internals never reach the comparator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.flags import country_flag_udf
from ..functions.stats import (
    mean_ci_columns,
    normal_two_sided_p_udf,
    two_sided_p_udf,
    welch_t_columns,
)
from ..operators.dedup import (
    embedding_cosine_dup_pairs,
    exact_dedup,
    exact_dedup_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_from_grams,
    shingles_udf,
    simhash_md5_near_dup_pairs,
    substring_dup_spans,
)
from ..operators.reshape import unpivot_measures
from ..operators.similarity import (
    IVF_JVM_NLIST_MAX,
    adaptive_nlist,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_assign,
    ivf_assign_batched,
    knn_all_pairs_bruteforce,
    pq_adc_topk,
    pq_encode_batched,
    sampled_centroids,
)
from ..operators.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    STOPWORDS_EN,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_count,
    word_frequencies,
)
from ..sources.registry import load_table
from ..streaming.event_windows import (
    sessionize,
    sliding_event_counts,
    streaming_sessionize_state,
    tumbling_event_counts,
)

# --------------------------------------------------------------------- #
# constants shared by Spark plans and oracle SQL

REF_YEAR = 1998          # campaign-style reference year on orders
PRE_YEARS = 2            # before window: [1996, 1997]
POST_YEARS = 1           # after window:  [1998, 1999]
Q1_CUTOFF = "2001-09-01"


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    # None => not SQL-expressible; driver does rows-only.  A callable
    # receives the warehouse dir and returns the SQL — for oracles
    # whose text depends on a data-adaptive plan constant (e.g. the
    # LSH bit count scales with the embedding count), so the oracle
    # certifies the SAME regime the Spark plan runs at any SF.
    oracle: str | Callable[[str], str] | None
    note: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | Callable[[str], str] | None, note: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, note=note)
        return fn

    return deco


def resolve_oracle(qd: QueryDef, sf_dir: str) -> str | None:
    """Oracle SQL for `qd` at `sf_dir` (calls data-adaptive oracles)."""
    return qd.oracle(sf_dir) if callable(qd.oracle) else qd.oracle


def parquet_num_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no engine needed, so
    data-adaptive oracle callables stay cheap and Spark-free."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.ParquetFile(path).metadata.num_rows


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _conf_bytes(sess: SparkSession, key: str, default: int) -> int:
    """Parse a Spark size conf ("128MB", "134217728b", plain int)."""
    try:
        raw = str(sess.conf.get(key)).strip().lower()
    except Exception:  # noqa: BLE001 — conf missing => documented default
        return default
    mult = 1
    for suffix, m in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


_SPLIT_CACHE: dict[tuple, int] = {}


def _scan_split_estimate(sess: SparkSession, sf_dir: str, table: str) -> int:
    """Input-split count the file source will supply for `table`,
    estimated from on-disk file sizes + the session's split confs
    (the FilePartition formula: maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, bytesPerCore)), then size-packed bins).

    Spark-free per call after the first: file sizes come from the OS,
    not from materializing the scan's RDD (r10 ADVICE — the previous
    ``df.rdd.getNumPartitions()`` probe forced an extra plan
    translation on the driver per query construction).  Cached per
    (sf_dir, table, conf) tuple."""
    import glob
    import os

    max_pb = _conf_bytes(sess, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes(sess, "spark.sql.files.openCostInBytes", 4 << 20)
    par = sess.sparkContext.defaultParallelism
    key = (sf_dir, table, max_pb, open_cost, par)
    got = _SPLIT_CACHE.get(key)
    if got is not None:
        return got
    total = _scan_file_bytes(sf_dir, table, open_cost)
    bytes_per_core = max(total // max(par, 1), 1)
    max_split = min(max_pb, max(open_cost, bytes_per_core))
    est = max(1, -(-total // max_split))  # ceil division
    _SPLIT_CACHE[key] = est
    return est


_BYTES_CACHE: dict[tuple, int] = {}


def _scan_file_bytes(sf_dir: str, table: str, open_cost: int = 0) -> int:
    """Total on-disk bytes of a table's parquet file(s) + open costs."""
    import glob
    import os

    key = (sf_dir, table, open_cost)
    got = _BYTES_CACHE.get(key)
    if got is not None:
        return got
    path = os.path.join(sf_dir, f"{table}.parquet")
    files = (
        glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isdir(path)
        else [path]
    )
    total = sum(
        os.path.getsize(f) for f in files if os.path.exists(f)
    ) + open_cost * len(files)
    _BYTES_CACHE[key] = total
    return total


# --------------------------------------------------------------------- #
# Per-process materialization pool (r10 verdict item 5) — the batch
# analogue of m05's streaming _RESUME_POOL: an expensive DETERMINISTIC
# intermediate (the iterative connected-components assignment) is
# computed once per (kind, sf_dir, process), staged to scratch
# parquet, and re-read by every query that shares it.  This is
# exactly what a production pipeline does with a certified component
# assignment — materialize once, consume many times — so the pooled
# read is the honest steady-state cost.  The COLD cost stays
# observable: bench.py records each pooled query's first (cold) run
# separately and gates it against the baseline (r10 ADVICE), and the
# perturbation sweep clears the pool around every run so layout
# invariance is re-proven from scratch, never replayed from parquet.
_MATERIALIZE_POOL: dict[tuple, str] = {}

# queries whose bench best-of-2 minimum measures a pool hit; their
# regression gate is the COLD first run (bench.py "cold_norm"), not
# the min.  The two m05 file-sink streaming queries are pooled too
# (exactly-once resume semantics) — their fresh-checkpoint cost is
# gated by tools/streaming_scale_probe.py instead, per the r10
# ADVICE alternative.
POOLED_QUERIES = frozenset(
    {
        "dup_connected_components",
        "dup_cluster_sizes",
        "semantic_dedup_clusters",
        "fuzzy_entity_clusters",
        # r12 (r11 verdict item 2): the near-dup PAIR GRAPHS are pooled
        # too — these three consume them
        "dup_graph_triangles",
        "clustering_coeff_dup_graph",
        "pagerank_dup_graph",
        # r13 (r12 verdict item 2): the base corpus's banded MinHash
        # signature INDEX is pooled — the incremental ingest screen's
        # steady-state cost is batch-sized (pool-warm), index build is
        # its cold first run; ditto the sign-LSH vector index
        "incremental_neardup_new_docs",
        "incremental_embdup_new_vecs",
    }
)


def pooled_parquet(kind: str, spark: SparkSession, sf_dir: str, build) -> DataFrame:
    """Materialize ``build(spark, sf_dir)`` once per (kind, sf_dir,
    process) into scratch parquet and return a reader over it.

    Only for DETERMINISTIC intermediates (results independent of
    physical layout — e.g. min-id component labels), otherwise the
    pool would freeze one layout's answer.  The pooled queries'
    certification still covers the real computation: the driver's
    correctness gate runs each query once per process (cold), and
    ``clear_pools()`` makes sweeps that intentionally re-run (the
    perturbation sweep) recompute instead of re-read."""
    key = (kind, sf_dir)
    path = _MATERIALIZE_POOL.get(key)
    if path is None:
        from ..scratch import scratch_dir

        path = scratch_dir(f"pool_{kind}_")
        build(spark, sf_dir).write.mode("overwrite").parquet(path)
        _MATERIALIZE_POOL[key] = path
    return spark.read.parquet(path)


def clear_pools() -> None:
    """Drop every per-process result pool (materialized intermediates
    AND the m05 streaming resume pool) so the next invocation of any
    pooled query runs cold.  Used by the perturbation sweep."""
    _MATERIALIZE_POOL.clear()
    from . import m05_events_streaming as _m05

    _m05._RESUME_POOL.clear()


def fan_out(
    df: DataFrame,
    sf_dir: str,
    table: str = "documents",
    min_bytes: int = 0,
) -> DataFrame:
    """Spread a SMALL scan across the cluster before heavy row-local
    compute (media decode, PII regex, per-row codecs).

    A source that arrives as fewer splits than the cluster has slots —
    one flat parquet file with one row group is the limit case, and it
    is exactly how the sf0.1 warehouse ships `documents` — would pin
    an embarrassingly parallel compute stage to that split count (r10
    finding: the whole media cohort ran as ONE task on 32 cores).  The
    repartition is GATED on the scan's supplied split count (estimated
    from the table's file sizes — see ``_scan_split_estimate``), so at
    100 TB — where the source has thousands of natural splits — this
    is a no-op and never adds a full-data shuffle; when it does fire,
    the shuffled payload is whatever the caller projected first
    (media queries project just the id column, so the exchange moves
    a few KB to unlock a 32x compute fan-out).

    ``min_bytes``: additionally require the table to carry at least
    this many on-disk bytes before fanning out.  For per-row compute
    that is only MODERATELY expensive relative to the payload (text
    tokenize/n-gram passes, vs. the media decoders whose per-row cost
    dwarfs theirs), the exchange + stage barrier costs more than the
    parallelism gains when the whole table is under a few MB —
    measured at sf0.1: fanning the four steep text queries out made
    each 0.2-2.1 s SLOWER on a 0.6 MB scan, while the same queries
    are single-task-bound at sf10's ~60 MB.  Callers in that class
    pass a threshold (16 MiB) so the gate fires exactly where the
    fan-out pays."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    if min_bytes and _scan_file_bytes(sf_dir, table) < min_bytes:
        return df
    if _scan_split_estimate(sess, sf_dir, table) < target:
        return df.repartition(target)
    return df




# Explicit __all__ so topic modules can star-import the shared
# surface including underscore-prefixed helpers.
__all__ = [
    'annotations',
    'Callable',
    'dataclass',
    'DataFrame',
    'SparkSession',
    'Window',
    'F',
    'country_flag_udf',
    'mean_ci_columns',
    'normal_two_sided_p_udf',
    'two_sided_p_udf',
    'welch_t_columns',
    'embedding_cosine_dup_pairs',
    'exact_dedup',
    'exact_dedup_pairs',
    'minhash_near_dup_pairs',
    'ngram_jaccard_pairs',
    'ngram_jaccard_pairs_from_grams',
    'shingles_udf',
    'simhash_md5_near_dup_pairs',
    'substring_dup_spans',
    'unpivot_measures',
    'IVF_JVM_NLIST_MAX',
    'adaptive_nlist',
    'cosine_topk_bruteforce',
    'cosine_topk_ivf',
    'cosine_topk_lsh',
    'ivf_assign',
    'ivf_assign_batched',
    'knn_all_pairs_bruteforce',
    'pq_adc_topk',
    'pq_encode_batched',
    'sampled_centroids',
    'BPE_ISH_PATTERN',
    'LANG_MARKERS',
    'STOPWORDS_EN',
    'with_fingerprint',
    'with_language_id',
    'with_quality_score',
    'with_token_count',
    'word_frequencies',
    'load_table',
    'sessionize',
    'sliding_event_counts',
    'streaming_sessionize_state',
    'tumbling_event_counts',
    'REF_YEAR',
    'PRE_YEARS',
    'POST_YEARS',
    'Q1_CUTOFF',
    'QueryDef',
    'REGISTRY',
    'register',
    'fan_out',
    'POOLED_QUERIES',
    'pooled_parquet',
    'clear_pools',
    'resolve_oracle',
    'parquet_num_rows',
    '_t',
]
