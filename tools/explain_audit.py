"""Plan-quality audit: dump formatted plans for headline queries and
summarize the scale-relevant evidence (pushdown, pruning, broadcast,
codegen, shuffle count) into PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "filter_eq2",
    "agg_window_compare",
    "window_topn_per_group",
    "minhash_near_dup",
    "ngram_jaccard_block_lang",
    "embedding_dup_pairs",
    "cosine_topk",
    "word_frequencies",
    "event_tumbling_daily",
    "asof_join_last_purchase",
    "curation_pipeline",
    "simhash_near_dup",
    "knn_blocked_lsh",
    "q18_large_orders",
    "mixture_sample_docs",
    "pack_token_bins_docs",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "range_join_attribution",
    "tfidf_top_terms",
    "weighted_sample_docs",
    "decontaminate_overlap",
    "doc_length_stats",
    "dup_connected_components",
    "event_path_topk",
    "cohort_retention",
    "funnel_conversion",
    "q15_top_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_nation_profit",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "doc_concat_shards",
    "sql_api_running_revenue",
    # r8 additions: the fixed-point covariance re-contract + the
    # real-decode media queries (row-local mapInPandas, zero shuffle)
    "embedding_covariance",
    "multimodal_decode_jpeg",
    "multimodal_sample_video",
    "domain_cap_sample",
    "incremental_dedup_new_docs",
    "q16_supplier_diversity",
    "hard_negatives_topk",
    "q2_min_cost_supplier",
    # r5c additions
    "q11_important_parts",
    "q12_priority_by_returnflag",
    "q20_dominant_promo_supplier",
    "full_outer_reconcile_users",
    "window_rank_family",
    "events_gapfill_locf",
    "regr_trend_daily_value",
    "hll_sketch_union_users",
    "fuzzy_blocked_match_docs",
    "doc_bigram_logprob",
    "skew_report_events",
    "assoc_rules_event_types",
    "multi_touch_attribution",
    "revenue_share_window",
    "mad_outliers_value",
    "rolling_7d_unique_users",
    "markov_transition_matrix",
    "conversion_latency_percentiles",
    "assign_global_ids_docs",
    "doc_segment_dedup",
    "embedding_int8_quantize",
    "profile_orders_columns",
    "scd2_user_event_type",
    "events_daily_ewma",
    "window_range_1h_user",
    "variant_props_extract",
    "naive_bayes_lang_confusion",
    "fuzzy_entity_clusters",
    # r10: the capped fuzzy flavor + the fanned-out PII scrub
    "fuzzy_match_topk_docs",
    "doc_pii_scrub",
    "winsorize_values",
    "benford_first_digit",
    "embedding_covariance",
    "feature_hashing_docs",
    "null_safe_join_nation",
    "scd2_point_in_time_join",
    "embedding_hof_flags",
    # r5d additions
    "pagerank_dup_graph",
    "clustering_coeff_dup_graph",
    "exact_k_sample_docs",
    "user_activity_streaks",
    "twap_value_by_type",
    "bm25_topk_docs",
    "semantic_dedup_clusters",
    "incremental_agg_merge",
    "cdc_apply_user_state",
    "chi2_independence_lang_source",
    "heavy_hitters_users",
    "auc_rank_embedding",
    "doc_blocklist_filter",
    "multimodal_byte_entropy",
    "sql_recursive_calendar",
    "rfm_user_segments",
    "rolling_slope_7d",
    "weekday_seasonality",
    "kfold_assignment_docs",
    "label_separation_stats",
    "gains_table_embedding",
    "jackknife_mean_se",
    "zipf_slope_words",
    # r11: the new IVF / PQ ANN registrations
    "cosine_topk_ivf",
    "pq_topk_adc",
    "ivfpq_topk_adc",
    "cosine_topk_ivf2",
    # r12: two-phase bucketed-rank rewrites + new registration, and
    # the pooled pair-graph consumers
    "doc_length_ntile_bins",
    "event_value_decile_stats",
    "dup_graph_triangles",
    "clustering_coeff_dup_graph",
    "pagerank_dup_graph",
    "vocab_pareto_coverage",
    # r13: incremental near-dup ingest (pooled banded index) + the
    # vector-space twin
    "incremental_neardup_new_docs",
    "incremental_embdup_new_vecs",
]


def summarize(plan: str, simple: str) -> list[str]:
    """Scan-level evidence from the formatted detail blocks (each
    operator's details appear once), topology counts from the
    post-execution simple tree (the AQE *final* plan)."""
    simple = simple.split("== Initial Plan ==")[0]  # AQE repeats the pre-adaptive tree
    notes = []
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    real_pushed = [p for p in pushed if p.strip()]
    if real_pushed:
        notes.append(f"pushed filters: {len(real_pushed)} scan(s) — {real_pushed[0][:120]}")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) for s in schemas]
        notes.append(f"column pruning: scans read {widths} column(s)")
    n_bhj = simple.count("BroadcastHashJoin")
    n_smj = simple.count("SortMergeJoin")
    n_shj = simple.count("ShuffledHashJoin")
    if n_bhj or n_smj or n_shj:
        notes.append(f"joins: {n_bhj} broadcast, {n_smj} sort-merge, {n_shj} shuffled-hash")
    n_ex = len(re.findall(r"(?<!Broadcast)Exchange (hashpartitioning|rangepartitioning|SinglePartition)", simple))
    notes.append(f"shuffles: {n_ex} shuffle exchange(s)")
    if "HashAggregate" in simple and "partial" in simple.lower():
        notes.append("partial (map-side) aggregation present")
    if "ArrowEvalPython" in simple:
        notes.append(f"python: {simple.count('ArrowEvalPython')} Arrow-batched UDF eval(s)")
    if "BatchEvalPython" in simple:
        notes.append("WARNING: row-at-a-time Python UDF in plan")
    if "CartesianProduct" in simple:
        notes.append("WARNING: nested-loop/cartesian join in plan")
    elif "BroadcastNestedLoopJoin" in simple:
        # r12 (r11 verdict item 3): a BroadcastNestedLoopJoin whose
        # broadcast side is a GLOBAL aggregate (keys=[] -> exactly one
        # row) is the scalar-subquery pattern (crossJoin(broadcast(agg))
        # — bounded by construction, not a real cartesian.  AQE reuses
        # one scalar exchange across several BNLJs (ReusedExchange has
        # no subtree), so the classification is per IDENTITY EXCHANGE,
        # not per join.  A grouped-aggregate build (bounded by its
        # group-key cardinality, e.g. a distinct dimension crossed with
        # a generated calendar) is surfaced as a check-me note; only a
        # build that is neither is a real cartesian warning.
        n_ident, n_scalar, n_agg = _identity_builds(simple)
        n_bnlj = simple.count("BroadcastNestedLoopJoin")
        if n_ident and n_scalar == n_ident:
            notes.append(
                f"scalar-broadcast nested-loop join(s): {n_bnlj} "
                "(1-row global-aggregate build side — bounded)"
            )
        elif n_ident and n_scalar + n_agg == n_ident:
            notes.append(
                f"nested-loop join(s): {n_bnlj} with aggregate-bounded "
                "build side (cardinality = group count; verify the "
                "dimension is bounded)"
            )
        else:
            notes.append("WARNING: nested-loop/cartesian join in plan")
    return notes


def _identity_builds(simple: str) -> tuple[int, int, int]:
    """Classify every IdentityBroadcastMode exchange (the BNLJ build
    side): total, global-aggregate (keys=[] -> exactly one row), and
    grouped-aggregate (bounded by group cardinality) subtrees."""
    lines = simple.splitlines()
    n_ident = n_scalar = n_agg = 0
    for i, line in enumerate(lines):
        if "BroadcastExchange IdentityBroadcastMode" not in line:
            continue
        if "ReusedExchange" in line:
            # a reuse POINTER to an exchange classified at its
            # definition site; it has no subtree of its own
            continue
        n_ident += 1
        depth = len(re.match(r"^[\s:+|-]*", line).group(0))
        for sub in lines[i + 1 :]:
            sdepth = len(re.match(r"^[\s:+|-]*", sub).group(0))
            if sub.strip() and sdepth <= depth:
                break
            # a row-EXPANDING operator between the exchange and the
            # aggregate voids the bound: explode(collect_list(...)) or
            # a join ON TOP of a global aggregate is N rows, not 1 —
            # classify by the aggregate only if nothing above it in
            # the build subtree can multiply rows
            if re.search(r"\b(Generate|Expand|\w*Join\w*)\b", sub):
                break
            m = re.search(r"(?:Hash|Sort|ObjectHash)Aggregate\(keys=\[(.*?)\]", sub)
            if m:
                if m.group(1).strip():
                    n_agg += 1
                else:
                    n_scalar += 1
                break
    return n_ident, n_scalar, n_agg


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/explain_audit.py` over `{sf_dir}`.  For each headline",
        "query: the scale-relevant plan evidence (predicate pushdown, column pruning,",
        "join strategy, shuffle count, codegen spans), then the formatted plan.",
        "",
    ]
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        df = REGISTRY[name].fn(spark, sf_dir)
        df.collect()  # materialize so AQE's FINAL plan (with codegen ids) is shown
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString
        plan = qe.explainString(mode("formatted"))
        simple = qe.explainString(mode("simple"))
        # simple mode marks codegen'd operators with *(id)
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", simple.split("== Initial Plan ==")[0])))
        out.append(f"## {name}")
        out.append("")
        for n in summarize(plan, simple) + [f"codegen: {n_wsc} whole-stage span(s)"]:
            out.append(f"- {n}")
        out.append("")
        out.append("<details><summary>formatted plan</summary>")
        out.append("")
        out.append("```")
        out.append(plan.strip())
        out.append("```")
        out.append("</details>")
        out.append("")
        print(f"[audit] {name} done", file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
