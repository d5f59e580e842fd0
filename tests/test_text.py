"""Golden tests for the text-analysis operators (operators/text.py)."""

from __future__ import annotations

from world_vaccination_coverage_etl_spark.operators.text import (
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_token_count,
    word_frequencies,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_counts_golden(spark):
    df = _df(spark, ["hello world", "a b  c", "punct, only!", ""])
    rows = {r.doc_id: r for r in with_token_count(df).collect()}
    assert rows[0].ws_tokens == 2 and rows[0].bpe_tokens == 2
    assert rows[1].ws_tokens == 3
    # "punct, only!" -> BPE-ish: punct , only !  = 4 pieces
    assert rows[2].bpe_tokens == 4
    assert rows[3].ws_tokens == 0


def test_language_id_markers(spark):
    df = _df(
        spark,
        [
            "the cat and the dog in the house",       # en
            "el perro y la casa de los vecinos",       # es
            "der hund und die katze ist von den",      # de
            "zzz qqq xxx",                             # no markers -> und
        ],
    )
    rows = {r.doc_id: r.lang_id for r in with_language_id(df).collect()}
    assert rows[0] == "en"
    assert rows[1] == "es"
    assert rows[2] == "de"
    assert rows[3] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _df(spark, ["Hello   World", "hello world", "different"])
    rows = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


def test_quality_score_ranges_and_ordering(spark):
    good = "the quick brown fox and the lazy dog walked to the house in the morning"
    bad = "!!! ### $$$ %%% ^^^"
    rows = {
        r.doc_id: r for r in with_quality_score(_df(spark, [good, bad])).collect()
    }
    assert 0.0 <= rows[0].quality_score <= 1.0
    assert 0.0 <= rows[1].quality_score <= 1.0
    assert rows[0].quality_score > rows[1].quality_score
    assert rows[1].punct_ratio > rows[0].punct_ratio


def test_word_frequencies_counts(spark):
    df = _df(spark, ["a b a", "b a"])
    freqs = {r.word: r.freq for r in word_frequencies(df).collect()}
    assert freqs == {"a": 3, "b": 2}
