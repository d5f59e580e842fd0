"""Deduplication operators for large-scale corpus curation.

Five families, all designed shuffle-lean for the 100 TB posture:

- exact:      hash-groupBy on normalized content (one shuffle);
- MinHash:    shingle → per-row minhash signature (zero shuffle) →
              LSH banding → bucket join for candidates → row-local
              Jaccard verify;
- SimHash:    vectorized Pandas-UDF signature → 16-bit chunk blocking →
              popcount (bit_count) verify;
- n-gram Jaccard: row-local n-gram sets → blocked self-join → row-local
              intersect/union arithmetic;
- embedding:  sign-LSH blocking (or brute force below a size threshold)
              → row-local cosine.

The signature computations are all row-local column expressions (or an
Arrow-batched UDF for SimHash), so the only shuffles are the final
candidate-pair joins on short keys — the minimum any dedup needs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# exact


def normalized_text(col: F.Column) -> F.Column:
    """Whitespace-collapse + lowercase: the canonical form for dedup."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct normalized text: the representative is
    the minimum id (deterministic, oracle-friendly).  One hash shuffle."""
    norm = normalized_text(F.col(text_col)).alias("__norm")
    keep = (
        df.select(F.col(id_col), norm)
        .groupBy("__norm")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def exact_dedup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups: normalized text → representative id + dup count.

    Returns one row per duplicated content (group size > 1).
    """
    norm = normalized_text(F.col(text_col)).alias("norm_text")
    return (
        df.select(F.col(id_col), norm)
        .groupBy("norm_text")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


# --------------------------------------------------------------------------
# shingles / tokens (row-local building blocks)


def _tokens(col: F.Column) -> F.Column:
    toks = F.split(normalized_text(col), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def _shingles(col: F.Column, k: int) -> F.Column:
    """Word k-shingles as an array<string>, computed row-locally.

    ``transform(sequence(0, n-k), i -> concat_ws(' ', slice(tokens, i+1, k)))``
    then distinct.  Documents shorter than k words fall back to their
    full token join (single shingle) so they still participate.
    """
    toks = _tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return F.array_distinct(F.when(n > 0, sh).otherwise(F.array()))


def jaccard(a: F.Column, b: F.Column) -> F.Column:
    """|A ∩ B| / |A ∪ B| over two string arrays (row-local)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


# --------------------------------------------------------------------------
# MinHash + LSH


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding.

    Per-row (no shuffle): shingle set; signature ``sig[h] =
    min(hash(shingle, h))`` using Spark's 32-bit murmur hash with the
    hash index as a second input column (deterministic).  Banding:
    ``bands`` bands of ``num_hashes/bands`` rows each; docs sharing any
    band hash become candidates (one exploded groupBy + self-join on the
    band key).  Candidates are verified with the exact shingle Jaccard
    (row-local) and filtered at ``threshold``.

    Scale: the explode emits ``bands`` rows per doc (constant factor);
    the join key (band_idx, band_hash) is short; skewed buckets (e.g.
    boilerplate) are handled by AQE skew-join.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    sh = df.select(
        F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("shingles")
    ).filter(F.size("shingles") > 0)

    sig_cols = F.array(
        *[
            F.array_min(F.transform("shingles", lambda s, h=h: F.hash(s, F.lit(h))))
            for h in range(num_hashes)
        ]
    ).alias("sig")
    signed = sh.select(id_col, "shingles", sig_cols)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.hash(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = signed.select(id_col, "shingles", F.explode(band_structs).alias("band")).select(
        id_col, "shingles", "band.band_idx", "band.band_hash"
    )

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over blocked pairs.

    Blocking on ``block_col`` bounds the self-join; within a block the
    intersect/union arithmetic is row-local.  With ``block_col=None``
    this is a full cross self-join — only for small inputs or as the
    verification stage after candidate generation.
    """
    grams = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        _shingles(F.col(text_col), n).alias("grams"),
    ).filter(F.size("grams") > 0)

    a, b = grams.alias("a"), grams.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens — Arrow-batched numpy kernel.

    Token hashing uses a deterministic FNV-1a (no Python ``hash``
    randomization); the signature bit b is 1 iff the sum over tokens of
    (bit b set ? +1 : -1) is positive.
    """
    import numpy as np

    def fnv1a64(token: str) -> int:
        h = 0xCBF29CE484222325
        for byte in token.encode("utf-8"):
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        if not text:
            continue
        tokens = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split() if t]
        if not tokens:
            continue
        # hash each token once; go through uint64 so the top bit never
        # overflows numpy's signed shift (h >= 2**63 is ~half of tokens)
        hs = np.array([fnv1a64(tok) for tok in tokens], dtype=np.uint64)
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
        acc = np.where(bits == 1, 1, -1).sum(axis=0)
        sig = int(np.packbits(acc > 0, bitorder="little").view(np.uint64)[0])
        # two's-complement into int64
        out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
    return pd.Series(out)


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= ``max_hamming``.

    Blocking: the 64-bit signature splits into four 16-bit chunks; by
    pigeonhole, any pair within hamming distance 3 shares at least one
    chunk exactly.  Candidates join on (chunk_idx, chunk_value); verify
    is a JVM-side ``bit_count(xor)``.
    """
    signed = df.select(F.col(id_col), _simhash64(F.col(text_col)).alias("sig"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                F.shiftrightunsigned("sig", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(
                    "chunk_val"
                ),
            )
            for i in range(4)
        ]
    )
    blocked = signed.select(id_col, "sig", F.explode(chunks).alias("c")).select(
        id_col, "sig", "c.chunk_idx", "c.chunk_val"
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup


def _cosine(a: F.Column, b: F.Column) -> F.Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_cosine_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold.

    Optional blocking column bounds the self-join (at 100 TB use
    sign-LSH buckets from ``similarity.lsh_bucket`` as the block).
    Cosine is a row-local ``zip_with``/``aggregate`` expression —
    JVM-side, no UDF.
    """
    cols = [F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")]
    if block_col:
        cols.append(F.col(block_col))
    vecs = df.select(*cols)
    a, b = vecs.alias("a"), vecs.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
