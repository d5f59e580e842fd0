"""BPE merge learning: Spark implementation vs plain-Python reference."""

from __future__ import annotations

from collections import Counter

from world_vaccination_coverage_etl_spark.operators.bpe import (
    bpe_reference,
    learn_bpe_merges,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_classic_sennrich_example(spark):
    # 'newest' x6 and 'widest' x3 drive ('e','s') then ('es','t') first
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges = learn_bpe_merges(_corpus(spark, [" ".join(texts)]), n_merges=4)
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9


def test_matches_reference_on_random_corpus(spark):
    import random

    rng = random.Random(42)
    words = ["".join(rng.choices("abcd", k=rng.randint(2, 6))) for _ in range(80)]
    texts = [" ".join(rng.choices(words, k=20)) for _ in range(30)]
    wc = Counter(w for t in texts for w in t.split())
    exp = bpe_reference(dict(wc), n_merges=8)
    got = learn_bpe_merges(_corpus(spark, texts), n_merges=8)
    assert got == exp


def test_adjacent_overlap_merges_left_to_right(spark):
    # 'aaaa' x3: pair ('a','a') counts 9; after merging left-to-right
    # each word becomes ['aa','aa'] (not ['aa','a','a'])
    merges = learn_bpe_merges(_corpus(spark, ["aaaa aaaa aaaa"]), n_merges=2)
    assert merges[0] == ("a", "a", 9)
    assert merges[1] == ("aa", "aa", 3)


def test_stops_when_no_pair_repeats(spark):
    merges = learn_bpe_merges(_corpus(spark, ["ab cd ef"]), n_merges=5)
    assert merges == []
