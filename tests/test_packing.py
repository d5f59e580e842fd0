"""Sequence-packing operator tests (operators/packing.py)."""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.operators.packing import pack_token_bins


def _greedy_ref(tokens, cap):
    """Reference greedy rule: new bin when adding would overflow."""
    bins, b, fill = [], 0, 0
    for i, t in enumerate(tokens):
        if i > 0 and fill + t > cap:
            b += 1
            fill = 0
        fill += t
        bins.append((b, fill))
    return bins


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "de", 10 + (i * 7) % 90) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_pack_matches_reference_greedy(docs):
    out = pack_token_bins(docs, "n_tokens", 128, "lang").collect()
    by_lang = {}
    for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    assert len(out) == 200
    for lang, rows in by_lang.items():
        ref = _greedy_ref([r.n_tokens for r in rows], 128)
        got = [(r.bin_idx, r.bin_fill) for r in rows]
        assert got == ref, lang


def test_pack_invariants_and_oversize(spark):
    # an over-capacity doc gets its own bin; fills never exceed cap otherwise
    rows = [(1, "x", 50), (2, "x", 300), (3, "x", 50), (4, "x", 60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = sorted(pack_token_bins(df, "n_tokens", 128, "lang").collect(),
                 key=lambda r: r.doc_id)
    assert [r.bin_idx for r in out] == [0, 1, 2, 2]
    assert [r.bin_fill for r in out] == [50, 300, 50, 110]


def test_pack_sharded_scopes_bins(spark):
    rows = [(i, "en", i % 2, 100) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, shard int, n_tokens long"
    )
    out = pack_token_bins(df, "n_tokens", 128, "lang", shard_col="shard").collect()
    # 3 docs per shard, capacity fits one doc per bin -> bins 0,1,2 per shard
    for shard in (0, 1):
        got = sorted(
            (r.doc_id, r.bin_idx) for r in out if r.shard == shard
        )
        assert [b for _d, b in got] == [0, 1, 2]


def test_pack_validates_capacity(docs):
    with pytest.raises(ValueError):
        pack_token_bins(docs, "n_tokens", 0, "lang")


def test_concat_shards_digest_and_order(spark):
    import hashlib

    from world_vaccination_coverage_etl_spark.operators.packing import (
        concat_shards,
    )

    rows = [(i, f"src{i % 2}", f"doc number {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = concat_shards(df).collect()
    # every doc lands in exactly one (source, shard); totals conserved
    assert sum(r.n_docs for r in out) == 40
    assert sum(r.total_chars for r in out) == sum(
        len(t) for _, _, t in rows
    )
    # digest equals md5 of the ascending-doc_id '\n\n' join per group
    def shard_of(i):
        return hashlib.md5(f"shard:{i}".encode()).hexdigest()[:1]

    expected = {}
    for i, src, text in sorted(rows):
        expected.setdefault((src, shard_of(i)), []).append(text)
    for r in out:
        want = hashlib.md5(
            "\n\n".join(expected[(r.source, r.shard)]).encode()
        ).hexdigest()
        assert r.text_digest == want, (r.source, r.shard)


def test_concat_shards_growth_stable_assignment(spark):
    from world_vaccination_coverage_etl_spark.operators.packing import (
        concat_shards,
    )

    rows = [(i, "s", f"t{i}") for i in range(30)]
    small = spark.createDataFrame(rows[:20], "doc_id long, source string, text string")
    big = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # a doc's shard never changes when the corpus grows (row-local hash)
    def assignment(df):
        return {
            (r.source, r.shard): r.n_docs for r in concat_shards(df).collect()
        }

    a_small, a_big = assignment(small), assignment(big)
    for key, n in a_small.items():
        assert a_big.get(key, 0) >= n
