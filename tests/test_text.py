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


def test_chunk_text_windows_edges(spark):
    from world_vaccination_coverage_etl_spark.operators.text import (
        chunk_text_windows,
    )

    docs = [
        (0, " ".join(f"t{i}" for i in range(10))),   # single short chunk
        (1, " ".join(f"t{i}" for i in range(64))),   # exactly chunk_size
        (2, " ".join(f"t{i}" for i in range(65))),   # one token past -> 2 chunks
        (3, ""),                                     # token-free: emits nothing
        (4, "   "),                                  # whitespace only
        (5, "solo"),
        (6, " ".join(f"t{i}" for i in range(150))),  # 3 full strides + tail
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_text_windows(df, chunk_size=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc and 4 not in by_doc
    assert [r.n_tokens for r in sorted(by_doc[0], key=lambda r: r.chunk_idx)] == [10]
    assert [r.n_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [64]
    # 65 tokens, stride 48: windows at 0 (64 toks) and 48 (17 toks)
    assert [r.n_tokens for r in sorted(by_doc[2], key=lambda r: r.chunk_idx)] == [64, 17]
    assert [r.n_tokens for r in by_doc[5]] == [1]
    # 150 tokens: starts 0,48,96 -> lengths 64,64,54 (window at 144 would
    # be a subset of the one at 96: not emitted)
    got6 = sorted(by_doc[6], key=lambda r: r.chunk_idx)
    assert [r.n_tokens for r in got6] == [64, 64, 54]
    # consecutive chunks overlap by exactly `overlap` tokens while full
    first, second = got6[0].chunk_text.split(), got6[1].chunk_text.split()
    assert first[48:] == second[:16]
    # n_tokens always equals the emitted token count
    for rows in by_doc.values():
        for r in rows:
            assert r.n_tokens == len(r.chunk_text.split())


def test_scrub_pii_patterns(spark):
    from world_vaccination_coverage_etl_spark.operators.text import scrub_pii

    docs = [
        (0, "reach me at jane.doe+spam@mail.example.org today"),
        (1, "ssn 123-45-6789 on file"),
        (2, "call +44-202-555-0199 or 1-555-0100"),
        (3, "no pii here at all"),
        (4, "two mails: a@b.io and c.d@e-f.co"),
    ]
    out = {
        r.doc_id: r
        for r in scrub_pii(_df(spark, [t for _, t in docs])).collect()
    }
    assert out[0].scrubbed == "reach me at [PII] today"
    assert out[0].n_email == 1 and out[0].n_phone == 0
    assert out[1].scrubbed == "ssn [PII] on file"
    assert out[1].n_ssn == 1
    # ssn-shaped strings are claimed by the ssn pattern before phone
    assert "123-45-6789" not in out[1].scrubbed
    assert "[PII]" in out[2].scrubbed and "555" not in out[2].scrubbed
    assert out[2].n_phone >= 1
    assert out[3].scrubbed == "no pii here at all"
    assert out[3].n_email == out[3].n_ssn == out[3].n_phone == 0
    assert out[4].scrubbed == "two mails: [PII] and [PII]"
    assert out[4].n_email == 2


def test_repetition_stats_golden(spark):
    import re

    from world_vaccination_coverage_etl_spark.operators.text import (
        repetition_stats,
    )

    docs = [
        (1, "the cat sat on the cat sat again"),
        (2, "a b a b a b"),          # one dominating bigram
        (3, "all unique words here"),  # no repeated grams
        (4, "x"),                      # too short for any bigram
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.doc_id, r.n): (r.top_gram_frac, r.dup_gram_frac)
        for r in repetition_stats(df).collect()
    }

    def ref(text, n):
        toks = [t for t in re.split(r"[^a-zA-Z0-9]+", text.lower().strip()) if t]
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            return None
        from collections import Counter

        c = Counter(grams)
        top = max(c.values()) / len(grams)
        dup = sum(v for v in c.values() if v > 1) / len(grams)
        return round(top, 6), round(dup, 6)

    for doc_id, text in docs:
        for n in (2, 3):
            expect = ref(text, n)
            if expect is None:
                assert (doc_id, n) not in out
            else:
                assert out[(doc_id, n)] == expect, (doc_id, n)
    # doc 2: "a b" appears 3 of 5 bigrams; every bigram is a repeat
    assert out[(2, 2)] == (0.6, 1.0)


def test_scrub_pii_gates_equal_ungated_for_any_replacement(spark):
    """The gates must be invisible: gated output byte-identical to the
    ungated sequential replace for ANY replacement — including ones
    that splice new digit junctions into the scrubbed text (r10
    ADVICE: an original-text gate skipped ssn/phone shapes CREATED by
    the email pass when the replacement carries digits)."""
    from pyspark.sql import functions as F

    from world_vaccination_coverage_etl_spark.operators.text import (
        PII_PATTERNS,
        scrub_pii,
    )

    texts = [
        "clean prose with no personal data at all",
        "mail a@b.cc and ssn 123-45-6789 and phone +1-555-123-4567",
        # no digit run in the ORIGINAL; a digit-bearing replacement
        # for the email creates a phone-shaped string afterwards
        "reach me at someone@example.com if needed",
        "edge a@b.cc123-45-6789 glued",
        "dots 1.555.123.4567 only",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for repl in ["[PII]", "", "0", "12-345-6789x", "x@y.zz"]:
        ungated = F.col("text")
        for pat in PII_PATTERNS.values():
            ungated = F.regexp_replace(ungated, pat, repl)
        want = {
            r["doc_id"]: r["want"]
            for r in df.select("doc_id", ungated.alias("want")).collect()
        }
        got = {
            r["doc_id"]: r["scrubbed"]
            for r in scrub_pii(df, replacement=repl).collect()
        }
        assert got == want, f"replacement {repl!r}"
