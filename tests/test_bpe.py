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


# ------------------------------------------------------------------ #
# encode (the apply half)

import re

from world_vaccination_coverage_etl_spark.operators.bpe import (  # noqa: E402
    bpe_encode_docs,
    bpe_encode_reference,
)


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]


def test_encode_matches_reference(spark):
    import random

    rng = random.Random(7)
    words = ["".join(rng.choices("abcd", k=rng.randint(2, 6))) for _ in range(60)]
    texts = [" ".join(rng.choices(words, k=15)) for _ in range(20)]
    corpus = _corpus(spark, texts)
    merges = learn_bpe_merges(corpus, n_merges=6)
    assert merges  # the random corpus repeats pairs

    got = {
        r["doc_id"]: (list(r["subtokens"]), r["n_subtokens"])
        for r in bpe_encode_docs(corpus, merges).collect()
    }
    for i, t in enumerate(texts):
        exp = bpe_encode_reference(_tok(t), merges)
        assert got[i][0] == exp, f"doc {i}"
        assert got[i][1] == len(exp)


def test_encode_order_preserved_across_repartition(spark):
    texts = ["newest widest lowest", "widest newest"]
    corpus = _corpus(spark, texts).repartition(5)
    merges = [("e", "s"), ("es", "t"), ("w", "i")]
    got = {
        r["doc_id"]: list(r["subtokens"])
        for r in bpe_encode_docs(corpus, merges).collect()
    }
    assert got[0] == bpe_encode_reference(_tok(texts[0]), merges)
    assert got[1] == bpe_encode_reference(_tok(texts[1]), merges)
    # subtokens re-concatenate to the original token stream
    assert "".join(got[0]) == "".join(_tok(texts[0]))


def test_encode_merge_order_matters(spark):
    corpus = _corpus(spark, ["abc abc"])
    ab_first = bpe_encode_docs(corpus, [("a", "b"), ("ab", "c")]).collect()
    bc_first = bpe_encode_docs(corpus, [("b", "c"), ("a", "b")]).collect()
    assert list(ab_first[0]["subtokens"]) == ["abc", "abc"]
    # ('b','c') merges first, so ('a','b') never applies
    assert list(bc_first[0]["subtokens"]) == ["a", "bc", "a", "bc"]
