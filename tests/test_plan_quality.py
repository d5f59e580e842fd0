"""Anti-pattern guard over EVERY lazily-plannable registered query.

Two properties every plan must hold at any scale:

1. no row-at-a-time Python UDF (`BatchEvalPython`) — the only allowed
   exception is the country-flag lookup, which mirrors the reference's
   per-row function over a 25-row dimension;
2. no cartesian / broadcast-nested-loop join — the only allowed
   exception is the explicitly-documented O(n²) recall oracle.

This is the enforced version of tools/explain_audit.py's WARNING
lines: a future query that slips a Python UDF or an accidental cross
join into the hot path fails CI here, not at 100 TB.
"""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.queries import REGISTRY

# queries whose fn() EXECUTES work when called (streams start, loops
# run, scratch dirs write) — planned-only inspection isn't free for
# them, so they're covered by the audit/bench instead
_EXECUTES = tuple(
    name
    for name in REGISTRY
    if name.startswith(("streaming_", "stream_"))
    or name
    in {
        "kmeans_clusters",            # iterative driver loop
        "dup_connected_components",   # iterative driver loop
        "dup_cluster_sizes",          # iterative driver loop
        "fuzzy_entity_clusters",      # iterative driver loop
        "curation_pipeline",          # stage materialization writes
    }
)

ROW_UDF_OK = {"udf_country_flag"}
NESTED_LOOP_OK = {
    "knn_allpairs_small",
    # crossJoin(broadcast(1-row aggregate)) — the in-plan-scalar
    # pattern (corpus size N for the IDF): a nested-loop join whose
    # build side is exactly one row is a constant-append, not O(n·m)
    "tfidf_top_terms",
    "q15_top_supplier",
    # Q22's above-average-balance threshold: same 1-row broadcast
    # scalar pattern (exact decimal avg joined in-plan)
    "q22_dormant_customers",
    # corpus-total scalar for the unigram NLL normalization
    "doc_unigram_logprob",
    # Q11's fraction-of-global-total threshold: 1-row broadcast scalar
    # over the already-aggregated per-part values
    "q11_important_parts",
    # total-user-count scalar for support/lift normalization
    "assoc_rules_event_types",
    # Benford audit: 1-row total-count scalar over the 9-digit rows
    "benford_first_digit",
    # Naive Bayes: the tf rows intentionally replicate per class — a
    # |classes|-row (5) broadcast cross join, the scoring fan-out the
    # algorithm requires — plus 1-row vocab/ndoc scalars
    "naive_bayes_lang_confusion",
    # BM25's (N, avgdl) corpus scalars: same 1-row broadcast pattern
    "bm25_topk_docs",
    # chi-square: 1-row (N) x 1-row (sum q) x 1-row (dof) scalar combine
    "chi2_independence_lang_source",
    # recursive-calendar: types x generated-days cross join, bounded by
    # two dimension cardinalities (|event types| x |calendar days|)
    "sql_recursive_calendar",
    # RFM: 1-row reference-day scalar broadcast
    "rfm_user_segments",
    # gains table: 1-row (total pos, total n) scalar broadcast
    "gains_table_embedding",
    # FK audit: 1-row (child count) x 1-row (orphan count) combines
    "fk_orphan_audit",
    # Pareto coverage: 1-row (total tokens, vocab size) scalar broadcast
    "vocab_pareto_coverage",
}

_LAZY = [n for n in REGISTRY if n not in _EXECUTES]


@pytest.mark.parametrize("name", _LAZY)
def test_no_antipatterns_in_plan(spark, sf_small, name):
    df = REGISTRY[name].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in ROW_UDF_OK:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert (
            "BroadcastNestedLoopJoin" not in plan
        ), f"{name}: nested-loop join"
