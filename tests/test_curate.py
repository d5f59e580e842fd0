"""End-to-end curation pipeline test (plans/curate.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from world_vaccination_coverage_etl_spark.plans.curate import curate_training_corpus
from world_vaccination_coverage_etl_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def curated(spark, sf_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    final = curate_training_corpus(
        spark, corpus, bench, out,
        lang_whitelist=("en",), min_quality=0.2,
        near_dup_threshold=0.8, train_frac=0.9, pack_capacity=256,
    )
    return final, corpus, bench, out


def test_pipeline_produces_nonempty_training_corpus(curated):
    final, corpus, bench, out = curated
    n = final.count()
    assert 0 < n <= corpus.count()
    assert set(final.columns) == {
        "doc_id", "text", "lang", "ws_tokens", "split", "bin_idx"
    }


def test_stages_materialized_and_monotone(curated):
    final, corpus, bench, out = curated
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    sizes = {}
    for s in ["s1_gated", "s2_exact_dedup", "s3_near_dedup",
              "s4_decontaminated", "corpus"]:
        path = os.path.join(out, s)
        assert os.path.isdir(path), f"stage {s} not materialized"
        sizes[s] = spark.read.parquet(path).count()
    # each destructive stage only removes rows
    assert sizes["s2_exact_dedup"] <= sizes["s1_gated"]
    assert sizes["s3_near_dedup"] <= sizes["s2_exact_dedup"]
    assert sizes["s4_decontaminated"] <= sizes["s3_near_dedup"]
    assert sizes["corpus"] == sizes["s4_decontaminated"]


def test_no_exact_duplicates_survive(curated):
    final, *_ = curated
    from world_vaccination_coverage_etl_spark.operators.dedup import normalized_text

    dups = (
        final.select(normalized_text(F.col("text")).alias("norm"))
        .groupBy("norm").count().filter("count > 1").count()
    )
    assert dups == 0


def test_no_contaminated_docs_survive(curated):
    final, corpus, bench, out = curated
    from world_vaccination_coverage_etl_spark.operators.dedup import (
        ngram_contamination_pairs,
    )

    leaked = ngram_contamination_pairs(
        final.select("doc_id", "text"), bench, n=5
    ).count()
    assert leaked == 0


def test_split_and_packing_contract(curated):
    final, *_ = curated
    splits = {r["split"] for r in final.select("split").distinct().collect()}
    assert splits <= {"train", "val"} and "train" in splits
    # packing: within each split, walking ids ascending, bin_idx is
    # non-decreasing and bins respect capacity except single overlong docs
    rows = final.select("split", "doc_id", "ws_tokens", "bin_idx").collect()
    by_split: dict[str, list] = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    for split, rs in by_split.items():
        rs.sort(key=lambda r: r["doc_id"])
        fill: dict[int, int] = {}
        last_bin = 0
        for r in rs:
            assert r["bin_idx"] >= last_bin
            last_bin = r["bin_idx"]
            fill[r["bin_idx"]] = fill.get(r["bin_idx"], 0) + r["ws_tokens"]
        for b, tot in fill.items():
            members = [r for r in rs if r["bin_idx"] == b]
            assert tot <= 256 or len(members) == 1
