"""Property-based pins (hypothesis) for the sketch/sampler contracts.

The example-based suites pin specific streams; these assert the
CONTRACTS over randomized inputs — the guarantees a 100 TB deployment
actually leans on.  Examples are kept small (Spark job per example) so
the whole module stays under a minute.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from world_vaccination_coverage_etl_spark.operators.heavyhitters import (
    misra_gries_summary,
)
from world_vaccination_coverage_etl_spark.operators.sampling import (
    exact_k_sample,
    hash_split,
)

_FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
)
@_FAST
def test_mg_bounds_hold_on_any_stream(spark, keys, k):
    df = spark.createDataFrame(
        [(f"k{v}",) for v in keys], "key string"
    ).repartition(3)
    exact = Counter(f"k{v}" for v in keys)
    n = len(keys)
    summ = {
        r["key"]: r["est"]
        for r in misra_gries_summary(df, "key", k=k).collect()
    }
    assert len(summ) <= k
    for key, cnt in exact.items():
        est = summ.get(key, 0)
        assert 0 <= est <= cnt
        assert est >= cnt - n / (k + 1)
    # presence guarantee: everything above the bar is in the summary
    for key, cnt in exact.items():
        if cnt > n / (k + 1):
            assert key in summ


@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=40),
)
@_FAST
def test_exact_k_matches_python_reference(spark, ids, k):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").repartition(5)
    got = sorted(r.doc_id for r in exact_k_sample(df, k).collect())
    want = sorted(
        sorted(
            ids,
            key=lambda i: (hashlib.md5(f"ksample:{i}".encode()).hexdigest(), i),
        )[:k]
    )
    assert got == want


@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
    st.floats(min_value=0.0, max_value=1.0),
)
@_FAST
def test_hash_split_is_deterministic_and_total(spark, ids, frac):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").repartition(4)
    out = {r.doc_id: r.split for r in hash_split(df, train_frac=frac).collect()}
    assert set(out) == ids  # total: every row labeled
    # engine-portable reference
    thresh = format(int(frac * 65536), "04x") if frac < 1.0 else "g"
    for i in ids:
        h = hashlib.md5(f"split:{i}".encode()).hexdigest()[:4]
        assert out[i] == ("train" if h < thresh else "val")
