"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring the brute-force/ANN split any vector workload needs:

- ``cosine_topk_bruteforce``: exact top-k for one query vector — the
  score is a row-local ``zip_with``/``aggregate`` expression (JVM-side,
  whole-stage codegen), then a global ``orderBy(desc).limit(k)`` which
  Spark executes as per-partition top-k + driver merge (TakeOrdered) —
  no full sort shuffle.
- ``cosine_topk_lsh``: sign-LSH (random hyperplanes, fixed seed)
  bucketing; at scale the query probes only its bucket so the scan is
  1/2^bits of the corpus per probe.  Recall grows with multi-probe
  (hamming-1 neighbors of the query bucket).

``knn_all_pairs_bruteforce`` gives exact k-NN for every row (blocked
self-join + window top-k) — the verification baseline for ANN recall.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_score(vec: F.Column, query: Sequence[float]) -> F.Column:
    """Cosine similarity of a vector column against a literal query."""
    q = np.asarray(list(query), dtype=np.float64)
    qn = float(np.linalg.norm(q))
    qcol = F.array(*[F.lit(float(x)) for x in q])
    v = vec.cast("array<double>")
    denom = _norm(v) * F.lit(qn)
    return F.when(denom > 0, _dot(v, qcol) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine against one query vector (id tiebreak).

    ``round_dp`` rounds the score BEFORE the order/limit so a
    rounding tie at the k boundary resolves by id identically in any
    engine that ranks the rounded value (the oracle does)."""
    score = cosine_score(F.col(vec_col), query)
    if round_dp is not None:
        score = F.round(score, round_dp)
    scored = df.select(F.col(id_col), score.alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def adaptive_lsh_bits(
    n_rows: int,
    target_occupancy: int = 1024,
    min_bits: int = 4,
    max_bits: int = 16,
) -> int:
    """Bucket-count dial for the blocked-kNN family.

    Fixed ``bits`` means fixed bucket COUNT, so expected occupancy —
    and the per-block O(b²) verify — grows linearly with the corpus:
    total work O(n²/2^bits), the classic fixed-coarse-quantizer failure
    (measured: 425x time on a 100x input with 4 bits).  Scaling bits
    with log2(n/target) keeps occupancy near ``target_occupancy``
    regardless of corpus size, so per-block work is O(target²) and
    total work O(n·target) — linear in n.  Floored at ``min_bits`` so
    small/certification corpora keep the documented 4-bit blocks the
    static oracles reproduce.
    """
    import math

    if n_rows <= target_occupancy:
        return min_bits
    return max(
        min_bits,
        min(max_bits, math.ceil(math.log2(n_rows / target_occupancy))),
    )


def lsh_bucket(
    vec: F.Column, dim: int, bits: int = 8, seed: int = 42
) -> F.Column:
    """Sign-LSH bucket id: ``bits`` random-hyperplane sign bits.

    Hyperplanes are a deterministic numpy RNG draw embedded as literal
    arrays — every executor evaluates the same JVM expression; no
    Python at run time.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("int")
    for b in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = F.when(_dot(v, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit, b)
    return bucket


def lsh_bucket_batched(
    vec: F.Column, dim: int, bits: int = 8, seed: int = 42
) -> F.Column:
    """Sign-LSH bucket id via one Arrow-batched numpy matmul.

    Same hyperplane draw (and therefore the same buckets) as
    ``lsh_bucket``, but the per-row cost is a slice of a BLAS matmul
    instead of ``bits`` interpreted Catalyst ``aggregate``/``zip_with``
    folds (~100 µs each) — the difference between hours and minutes
    when bucketing 10⁹ rows.  The only divergence channel is float
    summation order on a plane dot product within ~1 ulp of zero,
    which has negligible probability on real embeddings (and the JVM
    variant stays available where exact fold order matters).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim)).T.copy()  # (dim, bits)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @F.pandas_udf(T.IntegerType())
    def _bucket(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype="float64") for v in col])
        signs = (m @ planes) >= 0.0
        return pd.Series((signs @ weights).astype("int32"))

    return _bucket(vec)


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    round_dp: int | None = None,
) -> DataFrame:
    """ANN top-k: score only rows within ``probe_hamming`` bit flips of
    the query's LSH bucket.  Recall/cost dial: probes grow as
    ``sum(C(bits, i) for i <= probe_hamming)`` while the scanned corpus
    fraction is probes/2^bits."""
    from itertools import combinations

    q = np.asarray(list(query), dtype=np.float64)
    dim = len(q)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    q_bucket = 0
    for b in range(bits):
        if float(planes[b] @ q) >= 0:
            q_bucket |= 1 << b
    probes = [q_bucket]
    for h in range(1, max(0, probe_hamming) + 1):
        for flips in combinations(range(bits), h):
            m = 0
            for b in flips:
                m |= 1 << b
            probes.append(q_bucket ^ m)

    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, bits, seed))
    candidates = bucketed.filter(F.col("__bucket").isin(probes))
    score = cosine_score(F.col(vec_col), query)
    if round_dp is not None:
        # round before the order/limit: a rounded tie at the k boundary
        # then resolves by id exactly like an oracle ranking the
        # rounded value (see cosine_topk_bruteforce)
        score = F.round(score, round_dp)
    scored = candidates.select(F.col(id_col), score.alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_within_blocks(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "block",
    round_dp: int = 6,
    chunk_rows: int = 4096,
) -> DataFrame:
    """Exact k-NN restricted to each block — the IVF-style scale path.

    ``block_col`` is the coarse partitioner (LSH bucket, IVF centroid
    id, shard key, ...).  Each block is handled by one Arrow batch in
    ``applyInPandas``: a numpy matmul computes the full within-block
    cosine matrix and emits only the top-k rows per source — O(b²) work
    per block, never O(n²) globally, and no pairwise shuffle (the only
    shuffle is the groupBy on the block key).  Cosines are rounded to
    ``round_dp`` BEFORE ranking so the (cosine desc, nbr_id asc) order
    is reproducible across float summation orders.

    Mirrors the reference's scan-then-rank per-series access pattern
    (reference streamlit_app.py:112-126) lifted to vector data.
    """
    import pandas as pd

    schema = (
        f"src_id long, nbr_id long, cosine double, rank int"
    )

    def _knn_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype="int64")
        m = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
        norms = np.linalg.norm(m, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        unit = m / safe[:, None]
        n = len(ids)
        kk = min(k, n - 1)
        if kk <= 0:
            return pd.DataFrame(
                {"src_id": [], "nbr_id": [], "cosine": [], "rank": []}
            ).astype({"src_id": "int64", "nbr_id": "int64",
                      "cosine": "float64", "rank": "int32"})
        # HALF_UP like Spark's F.round and DuckDB's round() — np.round
        # is half-to-even, which could disagree on an exact .5 boundary
        scale = 10.0 ** round_dp
        out_src, out_nbr, out_cos, out_rank = [], [], [], []
        # row-chunked matmul: peak memory O(chunk·b), not O(b²), so a
        # skew-heavy bucket degrades to more chunks instead of an OOM;
        # each source row still ranks against the FULL block (exact)
        chunk = max(1, chunk_rows)
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            cos = unit[i0:i1] @ unit.T
            cos[norms[i0:i1] == 0, :] = 0.0
            cos[:, norms == 0] = 0.0
            cos[np.arange(i1 - i0), np.arange(i0, i1)] = -np.inf
            with np.errstate(invalid="ignore"):
                cos = np.where(
                    np.isfinite(cos),
                    np.sign(cos) * np.floor(np.abs(cos) * scale + 0.5) / scale,
                    cos,
                )
            for r in range(i1 - i0):
                order = np.lexsort((ids, -cos[r]))[:kk]
                out_src.append(np.full(kk, ids[i0 + r]))
                out_nbr.append(ids[order])
                out_cos.append(cos[r][order])
                out_rank.append(np.arange(1, kk + 1, dtype="int32"))
        return pd.DataFrame(
            {
                "src_id": np.concatenate(out_src),
                "nbr_id": np.concatenate(out_nbr),
                "cosine": np.concatenate(out_cos),
                "rank": np.concatenate(out_rank),
            }
        )

    return (
        df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
        .groupBy(block_col)
        .applyInPandas(_knn_block, schema=schema)
    )


def knn_all_pairs_bruteforce(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """Exact k nearest neighbors for every row (self-join + window top-k).

    O(n²) within a block — the recall oracle for the LSH path, and the
    real operator for small/medium corpora.  At 100 TB, block first
    (IVF coarse quantizer or LSH bucket as ``block_col``).
    """
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        *([F.col(block_col)] if block_col else []),
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    cond = F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    na, nb = _norm(F.col("a.v")), _norm(F.col("b.v"))
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("src_id"),
        F.col(f"b.{id_col}").alias("nbr_id"),
        F.when((na > 0) & (nb > 0), _dot(F.col("a.v"), F.col("b.v")) / (na * nb))
        .otherwise(F.lit(0.0))
        .alias("cosine"),
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "nbr_id", "cosine", "rank")
    )


def hard_negatives_within_blocks(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    block_col: str = "block",
    dup_ceiling: float = 0.95,
    round_dp: int = 6,
    chunk_rows: int = 4096,
) -> DataFrame:
    """Hard-negative mining — the contrastive-training companion to
    `knn_within_blocks`.

    For each vector, the most similar OTHER-labeled vectors that are
    not near-duplicates: candidates must carry a different
    ``label_col`` (a same-label "negative" is a false negative for the
    loss) and a cosine <= ``dup_ceiling`` (above it the pair is
    probably the same content mislabeled — mining it would teach the
    model to split duplicates).  Same scale shape as the k-NN kernel:
    one shuffle on the coarse block key, one numpy matmul per block,
    top-k emitted per source — O(b²) per block, never global.

    Masking happens on the ROUNDED cosine so the ceiling compares
    identically in any engine (the oracle applies ``cosine <= ceiling``
    to the same 6-dp value).
    """
    import pandas as pd

    schema = "src_id long, nbr_id long, cosine double, rank int"

    def _mine_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype="int64")
        labels = pdf[label_col].to_numpy()
        m = np.stack([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
        norms = np.linalg.norm(m, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        unit = m / safe[:, None]
        n = len(ids)
        scale = 10.0 ** round_dp
        out_src, out_nbr, out_cos, out_rank = [], [], [], []
        # row-chunked like _knn_block: O(chunk·b) memory, exact ranking
        # (the masks index by absolute column, so results are
        # chunk-size-invariant — pinned by the parity test)
        chunk = max(1, chunk_rows)
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            cos = unit[i0:i1] @ unit.T
            cos[norms[i0:i1] == 0, :] = 0.0
            cos[:, norms == 0] = 0.0
            with np.errstate(invalid="ignore"):
                cos = (
                    np.sign(cos) * np.floor(np.abs(cos) * scale + 0.5) / scale
                )
            same_label = labels[i0:i1, None] == labels[None, :]
            cos = np.where(same_label | (cos > dup_ceiling), -np.inf, cos)
            cos[np.arange(i1 - i0), np.arange(i0, i1)] = -np.inf
            for r in range(i1 - i0):
                order = np.lexsort((ids, -cos[r]))
                order = order[np.isfinite(cos[r][order])][:k]
                kk = len(order)
                if kk == 0:
                    continue
                out_src.append(np.full(kk, ids[i0 + r]))
                out_nbr.append(ids[order])
                out_cos.append(cos[r][order])
                out_rank.append(np.arange(1, kk + 1, dtype="int32"))
        if not out_src:
            return pd.DataFrame(
                {"src_id": [], "nbr_id": [], "cosine": [], "rank": []}
            ).astype({"src_id": "int64", "nbr_id": "int64",
                      "cosine": "float64", "rank": "int32"})
        return pd.DataFrame(
            {
                "src_id": np.concatenate(out_src),
                "nbr_id": np.concatenate(out_nbr),
                "cosine": np.concatenate(out_cos),
                "rank": np.concatenate(out_rank),
            }
        )

    return (
        df.select(
            F.col(id_col), F.col(vec_col), F.col(label_col), F.col(block_col)
        )
        .groupBy(block_col)
        .applyInPandas(_mine_block, schema=schema)
    )


# --------------------------------------------------------------------- #
# IVF-flat ANN (inverted-file index with a deterministic coarse
# quantizer) — the second classic ANN scale path next to sign-LSH.
# Lifts the reference's scan-then-rank per-series access pattern
# (reference streamlit_app.py:112-126) to vector data the IVF way:
# partition the corpus into nlist Voronoi cells, search only the
# nprobe cells whose centroids score best against the query.


def adaptive_nlist(
    n_rows: int,
    target_occupancy: int = 256,
    min_lists: int = 16,
    max_lists: int = 4096,
) -> int:
    """List-count dial for the IVF family (see ``adaptive_lsh_bits``).

    A fixed ``nlist`` means expected cell occupancy — and the per-probe
    scan — grows linearly with the corpus; scaling lists with
    n/target keeps the probed fraction's cost O(nprobe·target) per
    query regardless of corpus size.  Floored at ``min_lists`` so
    small/certification corpora keep the 16-cell layout the static
    oracles reproduce; capped at ``max_lists`` because beyond that a
    flat coarse quantizer is itself the bottleneck and the honest next
    step is a two-level (IVF-in-IVF) quantizer, not more cells.
    """
    import math

    if n_rows <= target_occupancy * min_lists:
        return min_lists
    return max(
        min_lists, min(max_lists, math.ceil(n_rows / target_occupancy))
    )


def sampled_centroids(
    df: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the ``nlist`` vectors whose ids
    md5-hash smallest, in hash order (ties by id).

    md5 of the id's decimal string is an order-free uniform sample —
    the same rows are chosen by any engine at any partitioning, so a
    SQL oracle can rebuild the exact quantizer (k-means-quality
    centroids plug into the same downstream via ``ivf_assign``; the
    sampled quantizer is the certifiable baseline, as in FAISS where
    random-sample coarse quantizers are the documented cheap
    fallback).  Returns [(cid, vector)] with cid = rank in hash order.
    Driver-side collect is nlist rows — model-sized, like the query
    vector every top-k entry already collects.
    """
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(nlist)
        .collect()
    )
    return [
        (cid, [float(x) for x in r[vec_col]]) for cid, r in enumerate(rows)
    ]


def _py_fold_cosine(a: Sequence[float], b: Sequence[float]) -> float:
    """Left-to-right double-fold cosine — bit-identical to the JVM
    ``aggregate`` fold and DuckDB's ``list_sum(list_transform(...))``
    (all three add in array order in IEEE double)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    import math

    den = math.sqrt(na) * math.sqrt(nb)
    return dot / den if den > 0 else 0.0


def _round_half_away(x: float, dp: int) -> float:
    """Round half away from zero — what Spark's ``F.round`` and
    DuckDB's ``round()`` do; Python's builtin rounds half to even."""
    import math

    scale = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    list_col: str = "list_id",
    round_dp: int | None = 6,
) -> DataFrame:
    """Assign every row to its best-cosine centroid (tie: lowest cid).

    The argmax is one codegen'd expression: an array of
    (-score, cid) structs reduced by ``array_min`` — no shuffle, no
    Python, no join.  Scores are rounded to ``round_dp`` BEFORE the
    argmax so a near-tie resolves by cid identically in any engine
    ranking the rounded value (the DuckDB oracle does).  Viable to a
    few hundred centroids (the plan carries nlist literal arrays);
    past that use ``ivf_assign_batched``.
    """
    import math

    # The whole argmax is generated as ONE SQL string and parsed with a
    # single F.expr: building it Column-by-Column costs one py4j round
    # trip per centroid-coordinate literal (nlist x dim ~ 1000 hops,
    # measured ~2 s of pure driver time at sf0.1 — the same lesson
    # operators/ranks.py documents for its bucket expressions).  The
    # parsed tree is expression-identical (same zip_with/aggregate fold
    # order, same CASE guard), so scores are bit-identical.  The vector
    # cast and its norm are materialized once as helper columns so the
    # interpreted fold runs once per row, not once per centroid.
    def _d(x: float) -> str:
        # repr() of a non-finite float ("nan"/"inf") is not a SQL
        # literal — a NaN/inf centroid coordinate would make the
        # generated string unparseable (the pre-r13 F.lit form handled
        # them); fail loudly instead of emitting broken SQL (ADVICE r13)
        fx = float(x)
        if not math.isfinite(fx):
            raise ValueError(
                f"ivf_assign: non-finite centroid coordinate {fx!r}"
            )
        return repr(fx) + "D"

    entries = []
    for cid, c in centroids:
        carr = "array(" + ",".join(_d(x) for x in c) + ")"
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        dot = (
            f"aggregate(zip_with(`__ivf_vd`, {carr}, (x, y) -> x * y), "
            "0.0D, (acc, v) -> acc + v)"
        )
        den = f"(`__ivf_vn` * {_d(cn)})"
        s = f"(CASE WHEN {den} > 0.0D THEN {dot} / {den} ELSE 0.0D END)"
        if round_dp is not None:
            s = f"round({s}, {int(round_dp)})"
        entries.append(f"named_struct('ns', -{s}, 'cid', {cid})")
    best = "array_min(array(" + ",".join(entries) + "))['cid']"
    v = F.col(vec_col).cast("array<double>")
    return (
        df.withColumn("__ivf_vd", v)
        .withColumn("__ivf_vn", _norm(F.col("__ivf_vd")))
        .withColumn(list_col, F.expr(best))
        .drop("__ivf_vd", "__ivf_vn")
    )


def ivf_assign_batched(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    list_col: str = "list_id",
    round_dp: int | None = 6,
) -> DataFrame:
    """``ivf_assign`` as one Arrow-batched numpy matmul per batch —
    the big-nlist path (O(dim·nlist) BLAS per row instead of nlist
    interpreted Catalyst folds; the plan carries one broadcast-closure
    matrix instead of nlist literal arrays).

    Same tie rule (rounded score, lowest cid).  The only divergence
    channel vs the JVM variant is float summation order inside the
    BLAS dot product, material only when two centroids' rounded scores
    straddle a 10^-round_dp boundary by <1 ulp — the same documented
    channel as ``lsh_bucket_batched``.
    """
    cmat = np.stack(
        [np.asarray(c, dtype="float64") for _, c in centroids]
    )  # (nlist, dim)
    cids = np.asarray([cid for cid, _ in centroids], dtype="int64")
    cnorm = np.linalg.norm(cmat, axis=1)
    csafe = np.where(cnorm > 0, cnorm, 1.0)
    cunit = (cmat / csafe[:, None]).T.copy()  # (dim, nlist)
    scale = 10.0 ** round_dp if round_dp is not None else None

    @F.pandas_udf(T.IntegerType())
    def _assign(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype="float64") for v in col])
        norms = np.linalg.norm(m, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        cos = (m / safe[:, None]) @ cunit
        cos[norms == 0, :] = 0.0
        cos[:, cnorm == 0] = 0.0
        if scale is not None:
            # HALF_UP like F.round / DuckDB round (np.round is
            # half-to-even)
            cos = np.sign(cos) * np.floor(np.abs(cos) * scale + 0.5) / scale
        # argmax score, tie -> lowest cid: scan reversed columns so the
        # FIRST max numpy keeps is the lowest cid
        order = np.argsort(cids)
        best = order[np.argmax(cos[:, order], axis=1)]
        return pd.Series(cids[best].astype("int32"))

    return df.withColumn(list_col, _assign(F.col(vec_col)))


# plan-size threshold between the literal-array argmax and the
# batched matmul assignment (structs × dim literals per centroid)
IVF_JVM_NLIST_MAX = 64


def cosine_topk_ivf(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = 6,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-flat ANN top-k: score only rows assigned to the ``nprobe``
    cells whose centroids best match the query.

    Recall/cost dial: the scanned fraction is ~nprobe/nlist of the
    corpus.  ``centroids`` defaults to the deterministic md5 sample
    (oracle-reproducible); k-means-trained centroids plug straight in.
    At 100 TB the assignment is the index BUILD — materialize it once
    partitioned by ``list_id`` (partition pruning then serves every
    probe without touching the other cells); this inline form exists
    so the certified query is self-contained.
    """
    if centroids is None:
        centroids = sampled_centroids(df, nlist, vec_col, id_col)
    qvec = [float(x) for x in query]
    probe_scores = []
    for cid, c in centroids:
        s = _py_fold_cosine(qvec, c)
        if round_dp is not None:
            s = _round_half_away(s, round_dp)
        probe_scores.append((-s, cid))
    probe_cids = [cid for _, cid in sorted(probe_scores)[:nprobe]]

    assign = (
        ivf_assign if len(centroids) <= IVF_JVM_NLIST_MAX
        else ivf_assign_batched
    )
    assigned = assign(df, centroids, vec_col=vec_col, round_dp=round_dp)
    candidates = assigned.filter(F.col("list_id").isin(probe_cids))
    score = cosine_score(F.col(vec_col), qvec)
    if round_dp is not None:
        score = F.round(score, round_dp)
    scored = candidates.select(F.col(id_col), score.alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# --------------------------------------------------------------------- #
# Product quantization (PQ) with asymmetric-distance scoring — the
# vector-COMPRESSION scale path that composes with the IVF cells above
# into the classic IVF+PQ index: codes are m small ints per vector
# (m bytes at k<=256 — 32x smaller than dim-64 float32), and a query
# scans codes with integer adds against a broadcast lookup table
# instead of touching the raw vectors.


def pq_subspaces(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    return dim // m


def pq_encode_batched(
    df: DataFrame,
    codebook_rows: list[tuple[int, list[float]]],
    m: int = 8,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    round_dp: int = 6,
) -> DataFrame:
    """Encode every vector to ``m`` codebook ids (one per subspace).

    ``codebook_rows`` is the same [(code, vector)] shape
    ``sampled_centroids`` returns — subspace j's codebook is the j-th
    dim/m-wide slice of each sampled vector, so ONE deterministic
    sample defines all m codebooks and a SQL oracle rebuilds them with
    one CTE.  Per subspace the code is the argmin squared-L2 over the
    k codes, distances rounded half-up to ``round_dp`` BEFORE the
    argmin (tie -> lowest code) so the choice is engine-reproducible —
    the ``kmeans_assign`` rounding contract.  One Arrow-batched numpy
    broadcast per batch; no shuffle at any scale (encode IS the index
    build — at 100 TB write codes once next to the IVF list_id).
    """
    C = np.stack([np.asarray(v, dtype="float64") for _, v in codebook_rows])
    k, dim = C.shape
    d = pq_subspaces(dim, m)
    Cs = C.reshape(k, m, d)
    codes = np.asarray([c for c, _ in codebook_rows], dtype=np.int64)
    order = np.argsort(codes)
    scale = 10.0 ** round_dp

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _encode(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="object")
        X = np.stack([np.asarray(v, dtype="float64") for v in col])
        Xs = X.reshape(len(X), m, d)
        # dist[n, m, k]: per-subspace squared L2 to every code
        diff = Xs[:, :, None, :] - Cs[None, :, :, :].transpose(0, 2, 1, 3)
        dist = (diff * diff).sum(axis=3)
        # HALF_UP like F.round / DuckDB round (np.round is half-even)
        dist = np.floor(dist * scale + 0.5) / scale
        # argmin over k, tie -> lowest code id (scan in code order;
        # np.argmin keeps the FIRST minimum)
        best = order[np.argmin(dist[:, :, order], axis=2)]
        return pd.Series(list(codes[best].astype("int32")))

    return df.withColumn(codes_col, _encode(F.col(vec_col)))


def pq_adc_topk(
    df: DataFrame,
    query: Sequence[float],
    codebook_rows: list[tuple[int, list[float]]],
    k: int = 10,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 6,
    codes_col: str | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): the query stays
    full-precision, every corpus vector is its PQ codes, and the
    distance is the sum of per-subspace query-to-code squared L2s.

    ``codes_col``: name of a PREBUILT codes column (from
    ``pq_encode_batched`` at index-build time) — when given, the scan
    reuses it and never touches ``vec_col``; when None, the inline
    form re-encodes from the raw vectors (r11 ADVICE: the build-once
    index path and the self-contained inline path are both real).

    The per-(subspace, code) distances are precomputed DRIVER-side
    with a left-to-right double fold (bit-identical to the SQL
    oracle's list fold), converted to integer MICROS (half-up at
    ``round_dp=6``), and embedded as m literal long arrays: the
    per-row score is m ``element_at`` lookups + integer adds — exact,
    summation-order-free, reproducible in any engine.  Ranking is
    (adc asc, id asc).  At scale this is the IVF+PQ probe step:
    the LUT is one broadcast of m*k longs, the scan touches only
    codes, never vectors.
    """
    import math

    qvec = [float(x) for x in query]
    dim = len(qvec)
    d = pq_subspaces(dim, m)
    by_code = {c: v for c, v in codebook_rows}
    n_codes = len(codebook_rows)
    # element_at(lut, code+1) positions the LUT by code VALUE, so the
    # codebook ids must be exactly 0..n-1 (r11 ADVICE: fail loud, not
    # KeyError mid-build, on a non-contiguous codebook)
    if sorted(by_code) != list(range(n_codes)):
        raise ValueError(
            "pq_adc_topk requires contiguous codebook ids 0..n-1, got "
            f"{sorted(by_code)[:8]}..."
        )
    luts = []
    for j in range(m):
        row = []
        for code in range(n_codes):
            cv = by_code[code]
            acc = 0.0
            for i in range(j * d, (j + 1) * d):
                diff = qvec[i] - float(cv[i])
                acc += diff * diff
            row.append(int(math.floor(acc * (10.0 ** round_dp) + 0.5)))
        luts.append(row)

    if codes_col is not None:
        # withColumn (not rename): unambiguous if a stale 'codes'
        # column already exists alongside codes_col.  Guard the m
        # contract per row — a codes array built with a different m
        # would otherwise yield NULL adc distances that sort FIRST
        # and silently win the top-k.
        encoded = df.withColumn(
            "codes",
            F.when(F.size(F.col(codes_col)) == m, F.col(codes_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"pq_adc_topk: prebuilt {codes_col} has "
                        ),
                        F.size(F.col(codes_col)).cast("string"),
                        F.lit(f" codes per row, expected m={m}"),
                    )
                ).cast("array<int>")
            ),
        )
    else:
        encoded = pq_encode_batched(
            df, codebook_rows, m=m, vec_col=vec_col, round_dp=round_dp
        )
    micros = None
    for j in range(m):
        # bigint lanes: a per-subspace term fits int32 only for small
        # vectors, and the m-term SUM overflows it on real embeddings
        lut = F.array(*[F.lit(v) for v in luts[j]]).cast("array<bigint>")
        term = F.element_at(lut, F.col("codes")[j] + 1)
        micros = term if micros is None else micros + term
    adc = F.round(micros / F.lit(10.0 ** round_dp), round_dp)
    return (
        encoded.select(F.col(id_col), adc.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------- #
# Two-level IVF (hierarchical coarse quantizer) — the documented next
# step past adaptive_nlist's 4096-cell cap: at 10^10 vectors you want
# ~10^6 cells, and a FLAT argmin over 10^6 centroids is itself the
# bottleneck.  Group the cells under G leaders (IMI-style); a row
# finds its leader in O(G), then its cell among that leader's members
# — O(G + nlist/G) per row instead of O(nlist).  Every layer reuses
# the proven rounded-argmax/argmin + lowest-id tie machinery, so a
# SQL oracle rebuilds the whole hierarchy.


def two_level_layout(
    centroids: list[tuple[int, list[float]]],
    n_groups: int,
    round_dp: int = 6,
) -> dict[int, int]:
    """Assign each cell centroid to its best-cosine leader.

    Leaders are the first ``n_groups`` centroids in the (md5-ranked)
    sample — the same recursively-applied deterministic-prefix trick
    as `sampled_centroids` itself, so the oracle gets the layout from
    the ranked CTE it already has.  Returns {cid: leader_cid}.
    Model-sized driver work (nlist rows), like every quantizer build.
    """
    leaders = centroids[:n_groups]
    layout = {}
    for cid, c in centroids:
        scored = []
        for lid, lv in leaders:
            s = _py_fold_cosine(c, lv)
            if round_dp is not None:
                s = _round_half_away(s, round_dp)
            scored.append((-s, lid))
        layout[cid] = min(scored)[1]
    return layout


def ivf2_assign_batched(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_groups: int,
    vec_col: str = "embedding",
    list_col: str = "list_id",
    round_dp: int | None = 6,
) -> DataFrame:
    """Hierarchical cell assignment: nearest leader first (rounded
    argmax cosine, tie lowest id), then nearest cell AMONG that
    leader's members (same rule).

    This is the IMI trade: a row whose globally-best cell lives under
    a different leader lands in its group-local best instead — the
    standard hierarchical-quantizer approximation, bought for
    O(G + nlist/G) per-row work.  One Arrow batch per partition, no
    shuffle; the same ulp channel as the other batched kernels.

    A row whose best leader heads an EMPTY group (possible when the
    layout remaps a leader cell to an earlier leader on a rounded
    cosine tie at 1.0 while the row still argmaxes to the later
    leader) gets ``list_id = -1`` — the same drop semantics as the
    SQL oracle, which inner-joins away such rows — instead of the
    silent lowest-cell-id np.argmax artifact (r11 ADVICE, medium).
    """
    layout = two_level_layout(centroids, n_groups, round_dp=round_dp)
    leaders = centroids[:n_groups]
    Lm = np.stack([np.asarray(v, dtype="float64") for _, v in leaders])
    lids = np.asarray([lid for lid, _ in leaders], dtype=np.int64)
    Cm = np.stack([np.asarray(v, dtype="float64") for _, v in centroids])
    cids = np.asarray([cid for cid, _ in centroids], dtype=np.int64)
    group_of = np.asarray([layout[int(c)] for c in cids], dtype=np.int64)
    scale = 10.0 ** round_dp if round_dp is not None else None

    def _unit(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1)
        return m / np.where(n > 0, n, 1.0)[:, None]

    Lu, Cu = _unit(Lm).T.copy(), _unit(Cm).T.copy()
    lorder = np.argsort(lids)
    corder = np.argsort(cids)

    @F.pandas_udf(T.IntegerType())
    def _assign(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="int32")
        X = np.stack([np.asarray(v, dtype="float64") for v in col])
        n = np.linalg.norm(X, axis=1)
        Xu = X / np.where(n > 0, n, 1.0)[:, None]
        gs = Xu @ Lu
        gs[n == 0, :] = 0.0
        if scale is not None:
            gs = np.sign(gs) * np.floor(np.abs(gs) * scale + 0.5) / scale
        glead = lids[lorder[np.argmax(gs[:, lorder], axis=1)]]
        cs = Xu @ Cu
        cs[n == 0, :] = 0.0
        if scale is not None:
            cs = np.sign(cs) * np.floor(np.abs(cs) * scale + 0.5) / scale
        # mask cells outside the row's leader group, then argmin on
        # (-score, cid): scan cid-sorted columns so first max wins ties
        member = group_of[None, :] == glead[:, None]
        masked = np.where(member[:, corder], cs[:, corder], -np.inf)
        best = corder[np.argmax(masked, axis=1)]
        out = cids[best].astype("int32")
        # empty leader group -> all -inf -> argmax's column 0 is an
        # artifact; emit the -1 sentinel (oracle drop semantics)
        out[~member.any(axis=1)] = -1
        return pd.Series(out)

    return df.withColumn(list_col, _assign(F.col(vec_col)))


def cosine_topk_ivf2(
    df: DataFrame,
    query: Sequence[float],
    centroids: list[tuple[int, list[float]]],
    n_groups: int,
    k: int = 10,
    nprobe_groups: int = 2,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = 6,
) -> DataFrame:
    """Two-level IVF search: probe the ``nprobe_groups`` best leaders,
    then the ``nprobe`` best cells among those leaders' members, and
    brute-force cosine within.  The probe walk is driver-side
    model-sized arithmetic in the oracle's exact fold order."""
    qvec = [float(x) for x in query]
    layout = two_level_layout(centroids, n_groups, round_dp=round_dp)
    leaders = centroids[:n_groups]

    def ranked(cands: list[tuple[int, list[float]]]) -> list[int]:
        scored = []
        for cid, c in cands:
            s = _py_fold_cosine(qvec, c)
            if round_dp is not None:
                s = _round_half_away(s, round_dp)
            scored.append((-s, cid))
        return [cid for _, cid in sorted(scored)]

    probe_leads = set(ranked(leaders)[:nprobe_groups])
    member_cells = [
        (cid, c) for cid, c in centroids if layout[cid] in probe_leads
    ]
    probe_cids = ranked(member_cells)[:nprobe]

    assigned = ivf2_assign_batched(
        df, centroids, n_groups, vec_col=vec_col, round_dp=round_dp
    )
    candidates = assigned.filter(F.col("list_id").isin(probe_cids))
    score = cosine_score(F.col(vec_col), qvec)
    if round_dp is not None:
        score = F.round(score, round_dp)
    scored = candidates.select(F.col(id_col), score.alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
