"""Runnable demo: RAG retrieval indexing + query over the testdata.

    python examples/rag_pipeline.py [sf_dir] [k]

Composes the engine's retrieval stack end-to-end, Spark-first:

1. **chunk**    — documents → overlapping 64/16-token windows
                  (operators/text.py chunk_text_windows, row-local);
2. **embed**    — deterministic hash-projection chunk embeddings (a
                  stand-in for a model encoder: 64-dim salted-md5
                  feature hashing, unit-normalized — same Arrow batch
                  shape a real encoder UDF would use);
3. **index**    — sign-LSH bucket per chunk (operators/similarity.py
                  lsh_bucket_batched, one Arrow matmul);
4. **query**    — embed the query string the same way, probe its
                  bucket (+ multiprobe neighbors), exact cosine on
                  the candidates only, top-k;
5. **assemble** — return the top-k chunks with doc/window provenance,
                  the context block a generator would consume.

Everything distributed is a DataFrame op; the only driver-side data
is the query vector and the final k rows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from world_vaccination_coverage_etl_spark.operators.similarity import (  # noqa: E402
    lsh_bucket_batched,
)
from world_vaccination_coverage_etl_spark.operators.text import (  # noqa: E402
    chunk_text_windows,
)
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402
from world_vaccination_coverage_etl_spark.sources.registry import (  # noqa: E402
    load_table,
)

DIM = 64


def _embed_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic bag-of-hashed-tokens embedding (the fake encoder).

    dim/sign from md5 — the same engine-portable contract the
    feature-hashing query certifies — then L2 normalization.
    """
    import hashlib

    v = np.zeros(DIM)
    for w in tokens:
        h = int(hashlib.md5(f"fh:{w}".encode()).hexdigest()[:2], 16)
        v[h % DIM] += 1.0 if (h // DIM) % 2 == 0 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [float(x) for x in _embed_tokens((t or "").lower().split())]
            for t in texts
        ],
        dtype="object",
    )


def build_index(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text_windows(docs, chunk_size=64, overlap=16)
    embedded = chunks.select(
        "doc_id",
        F.col("chunk_idx"),
        F.col("chunk_text"),
        embed_text(F.col("chunk_text")).alias("emb"),
    )
    return embedded.withColumn(
        "bucket", lsh_bucket_batched(F.col("emb"), DIM, bits=6)
    )


def retrieve(spark, index, query: str, k: int = 5):
    qv = _embed_tokens(query.lower().split())
    import hashlib  # noqa: F401

    rng = np.random.default_rng(42)
    planes = rng.standard_normal((6, DIM)).T
    signs = (qv @ planes) >= 0.0
    qbucket = int((signs @ (1 << np.arange(6))).astype(np.int64))
    # multiprobe: the query bucket plus all hamming-1 neighbors
    probes = [qbucket] + [qbucket ^ (1 << b) for b in range(6)]
    cand = index.filter(F.col("bucket").isin(probes))
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    score = F.aggregate(
        F.zip_with(F.col("emb"), qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.select(
            "doc_id",
            "chunk_idx",
            "chunk_text",
            F.round(score, 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "doc_id", "chunk_idx")
        .limit(k)
    )


def build_ivfpq_index(spark, sf_dir: str, nlist: int = 16):
    """The IVF+PQ flavor of step 3: same chunks + embeddings, but the
    index is (cell id, PQ codes) — what a 100 TB deployment
    materializes (partitioned by list_id; codes are 32x smaller than
    the raw vectors, see queries ivfpq_topk_adc / DEPLOY.md)."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        ivf_assign_batched,
        pq_encode_batched,
        sampled_centroids,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text_windows(docs, chunk_size=64, overlap=16)
    embedded = chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        embed_text(F.col("chunk_text")).alias("emb"),
    ).withColumn(
        "vec_id",
        F.col("doc_id") * F.lit(1_000_000) + F.col("chunk_idx"),
    )
    sample = sampled_centroids(embedded, nlist=nlist, vec_col="emb")
    indexed = pq_encode_batched(
        ivf_assign_batched(embedded, sample, vec_col="emb"),
        sample,
        m=8,
        vec_col="emb",
    )
    return indexed, sample


def retrieve_ivfpq(index, sample, query: str, k: int = 5, nprobe: int = 4):
    """Probe the nprobe best cells, ADC-rank their codes — retrieval
    never touches raw vectors (the emb column here exists only for
    display; a materialized index would not store it)."""
    from world_vaccination_coverage_etl_spark.operators.similarity import (
        _py_fold_cosine,
        _round_half_away,
        pq_adc_topk,
    )

    qv = [float(x) for x in _embed_tokens(query.lower().split())]
    probe = sorted(
        (-_round_half_away(_py_fold_cosine(qv, c), 6), cid)
        for cid, c in sample
    )[:nprobe]
    cand = index.filter(
        F.col("list_id").isin([cid for _, cid in probe])
    )
    # codes_col reuses the codes built by build_ivfpq_index: the ADC
    # scan reads (list_id, codes) only — never re-encodes, never
    # touches the raw emb column (r11 ADVICE)
    top = pq_adc_topk(cand, qv, sample, k=k, m=8, codes_col="codes")
    return top.join(
        index.select("vec_id", "doc_id", "chunk_idx", "chunk_text"),
        on="vec_id",
    ).orderBy("adc_dist", "vec_id")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="rag_pipeline")
    index = build_index(spark, sf).cache()
    n_chunks = index.count()
    n_buckets = index.select("bucket").distinct().count()
    print(f"index: {n_chunks} chunks in {n_buckets} LSH buckets")
    query = "the quick brown fox"
    hits = retrieve(spark, index, query, k).collect()
    print(f"query: {query!r} -> top-{k}")
    for r in hits:
        print(
            f"  cos={r.cosine:+.4f} doc={r.doc_id} win={r.chunk_idx} "
            f"text={r.chunk_text[:60]!r}"
        )
    context = "\n\n".join(r.chunk_text for r in hits)
    print(f"assembled context: {len(context)} chars from {len(hits)} chunks")

    # same corpus through the IVF+PQ index (the 100 TB retrieval path)
    ivfpq, sample = build_ivfpq_index(spark, sf)
    ivfpq = ivfpq.cache()
    n_cells = ivfpq.select("list_id").distinct().count()
    print(f"ivf+pq index: {ivfpq.count()} chunks in {n_cells} cells")
    hits2 = retrieve_ivfpq(ivfpq, sample, query, k).collect()
    for r in hits2:
        print(
            f"  adc={r.adc_dist:.4f} doc={r.doc_id} win={r.chunk_idx} "
            f"text={r.chunk_text[:60]!r}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
