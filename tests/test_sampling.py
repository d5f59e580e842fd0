"""Deterministic sampling/split operator tests (operators/sampling.py)."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    mixture_sample,
    stratified_exact_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _expected_split(doc_id: int, train_frac: float, salt: str = "split") -> str:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:4]
    return "train" if h < format(int(train_frac * 65536), "04x") else "val"


def test_hash_split_matches_reference_hash_and_is_stable(docs, spark):
    got = {r.doc_id: r.split for r in hash_split(docs, train_frac=0.8).collect()}
    for i in range(300):
        assert got[i] == _expected_split(i, 0.8)
    # membership must not change when the corpus grows
    bigger = docs.unionAll(
        spark.createDataFrame([(1000 + i, "en") for i in range(50)],
                              "doc_id long, lang string")
    )
    got2 = {r.doc_id: r.split for r in hash_split(bigger, train_frac=0.8).collect()}
    assert all(got2[i] == got[i] for i in range(300))


def test_hash_split_fraction_roughly_holds(docs):
    counts = (
        hash_split(docs, train_frac=0.8)
        .groupBy("split").count().collect()
    )
    by = {r.split: r["count"] for r in counts}
    assert 0.7 <= by.get("train", 0) / 300 <= 0.9


def test_deterministic_sample_is_subset_and_reproducible(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.2).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.2).collect()}
    assert a == b
    # growing the fraction only ever adds rows (threshold monotonicity)
    c = {r.doc_id for r in deterministic_sample(docs, 0.5).collect()}
    assert a <= c


def test_stratified_exact_sample_counts(docs):
    out = stratified_exact_sample(docs, "lang", 0.2).groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in out}
    assert by["en"] == math.ceil(200 * 0.2)
    assert by["de"] == math.ceil(100 * 0.2)
    # deterministic: same rows every run
    again = stratified_exact_sample(docs, "lang", 0.2)
    assert {r.doc_id for r in again.collect()} == {
        r.doc_id
        for r in stratified_exact_sample(docs, "lang", 0.2).collect()
    }


def test_fraction_validation(docs):
    with pytest.raises(ValueError):
        hash_split(docs, train_frac=1.5)
    with pytest.raises(ValueError):
        stratified_exact_sample(docs, "lang", -0.1)
    with pytest.raises(ValueError):
        mixture_sample(docs, "lang", {"en": -0.5})


def _mix_copies(doc_id: int, rate: float, salt: str = "mix") -> int:
    whole = int(rate)
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:4]
    frac = rate - whole
    extra = 1 if (frac > 0 and h < format(int(frac * 65536), "04x")) else 0
    return whole + extra


def test_mixture_sample_matches_reference_multiplicity(docs):
    rates = {"en": 0.5, "de": 2.25}
    out = mixture_sample(docs, "lang", rates).collect()
    got = {}
    for r in out:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    for i in range(300):
        lang = "en" if i % 3 else "de"
        expect = _mix_copies(i, rates[lang])
        assert got.get(i, 0) == expect, (i, lang)
    # copy indices are 0..n-1 per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())


def test_mixture_sample_default_rate_passthrough(docs):
    # unlisted groups keep every row exactly once
    out = mixture_sample(docs, "lang", {"de": 0.0}, default_rate=1.0)
    rows = out.collect()
    assert all(r.lang == "en" for r in rows)
    assert len(rows) == 200
    assert all(r.copy_idx == 0 for r in rows)


def test_weighted_sample_topk_excludes_nonpositive(spark):
    from world_vaccination_coverage_etl_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, None), (4, 5), (5, 1)],
        "doc_id long, w long",
    )
    out = weighted_sample_topk(df, weight_col="w", k=10)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5]  # zero/NULL weights never sampled


def test_weighted_sample_topk_deterministic_and_k_bounded(spark):
    from world_vaccination_coverage_etl_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, "g" if i % 2 else "h", 1 + i % 7) for i in range(60)],
        "doc_id long, grp string, w long",
    )
    a = weighted_sample_topk(df, "w", k=4, strata_col="grp")
    b = weighted_sample_topk(df, "w", k=4, strata_col="grp")
    ra = sorted((r["grp"], r["doc_id"]) for r in a.collect())
    rb = sorted((r["grp"], r["doc_id"]) for r in b.collect())
    assert ra == rb and len(ra) == 8
    # repartitioning the input must not change membership
    c = weighted_sample_topk(df.repartition(7), "w", k=4, strata_col="grp")
    assert sorted((r["grp"], r["doc_id"]) for r in c.collect()) == ra


def test_capped_per_group_equals_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from world_vaccination_coverage_etl_spark.operators.sampling import (
        capped_per_group,
    )

    rows = [(i, f"s{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r.doc_id for r in capped_per_group(df, "source", cap=25).collect()
    )
    u = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(u, "doc_id")
    want = sorted(
        r.doc_id
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .collect()
    )
    assert got == want
    # cap respected per group
    from collections import Counter

    by_src = Counter(i % 3 for i in got)
    assert all(v <= 25 for v in by_src.values())
    assert len(got) == 75


def test_capped_per_group_small_groups_untouched(spark):
    from world_vaccination_coverage_etl_spark.operators.sampling import (
        capped_per_group,
    )

    rows = [(i, "only") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    assert capped_per_group(df, "source", cap=50).count() == 10


def test_exact_k_sample_size_and_portability(spark):
    from world_vaccination_coverage_etl_spark.operators.sampling import (
        exact_k_sample,
    )

    rows = [(i,) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long").repartition(7)
    got = sorted(r.doc_id for r in exact_k_sample(df, 25).collect())
    assert len(got) == 25
    # engine-portability: the winners are exactly the 25 smallest
    # md5('ksample:'||id) digests computed independently in Python
    want = sorted(
        sorted(range(200), key=lambda i: (hashlib.md5(
            f"ksample:{i}".encode()).hexdigest(), i))[:25]
    )
    assert got == want
    # k >= n returns everything; k=0 returns nothing; k<0 raises
    assert exact_k_sample(df, 500).count() == 200
    assert exact_k_sample(df, 0).count() == 0
    with pytest.raises(ValueError):
        exact_k_sample(df, -1)


def test_exact_k_sample_growth_stability(spark):
    from world_vaccination_coverage_etl_spark.operators.sampling import (
        exact_k_sample,
    )

    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    grown = spark.createDataFrame([(i,) for i in range(150)], "doc_id long")
    s1 = {r.doc_id for r in exact_k_sample(small, 20).collect()}
    s2 = {r.doc_id for r in exact_k_sample(grown, 20).collect()}
    # a surviving row only leaves when a NEW row hashes below the
    # old k-th digest: the grown sample differs from the old one only
    # by new-row replacements, never by reshuffling old members
    dropped = s1 - s2
    added = s2 - s1
    assert len(dropped) == len(added)
    assert all(i >= 100 for i in added)
