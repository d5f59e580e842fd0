"""r14 at-scale proof: representative queries at sf0.1 / sf1 / sf10.

The r13 verdict (items 3 and 5) asks for sf1/sf10 evidence that each
optimized family's win holds or grows with volume (overhead-shaped
wins can invert).  One representative per family runs bench-faithfully
(same warmup, System.gc, noop sink) on the shipped sf0.1 warehouse and
the `tools/make_sf1.py` decorrelated 10x/100x warehouses; pooled
queries run COLD (clear_pools first) because the pool build IS the
computation being certified.

Usage::

    python tools/r14_scale_probe.py [--sfs d1,d2,...] [query ...]

Writes .scale/r14_probe.json and prints a markdown table for
SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.queries._core import (  # noqa: E402
    POOLED_QUERIES,
    clear_pools,
)
from world_vaccination_coverage_etl_spark.schemas import STAR_TABLES  # noqa: E402
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402
from world_vaccination_coverage_etl_spark.sources.registry import load_table  # noqa: E402

# one representative per optimized family (r13 + r14)
DEFAULT_QUERIES = [
    "zipf_slope_words",            # r13 ranks array-form
    "agg_grouping_sets",           # r13 pre-aggregated Expand
    "multimodal_decode_jpeg",      # r13 media pre_kernel fusion
    "cosine_topk_ivf",             # r13 IVF expr-build
    "tfidf_top_terms",             # r13 text tf checkpoint
    "naive_bayes_lang_confusion",  # r13 text tf checkpoint (3 consumers)
    "curation_pipeline",           # r14 window dedup + pinned stage parts
    "dup_cluster_sizes",           # r14 fused kernel + eager stage + CC probe (cold)
    "fuzzy_entity_clusters",       # r14 gid-graph CC (cold)
    "incremental_embdup_new_vecs", # r14 partition-level LSH verify (cold)
    "incremental_neardup_new_docs",# r14 fused screen kernel (cold)
    "embedding_dup_pairs",         # r14 partition-level LSH verify
    "simhash_near_dup",            # r14 eager staging
    "q13_customer_distribution",   # r14 pre-agg before outer join
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfs",
        default="/root/testdata/sf0.1,.scale/sf1,.scale/sf10",
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES
    sf_dirs = [os.path.abspath(os.path.join(REPO, d)) if not d.startswith("/")
               else d for d in args.sfs.split(",")]

    spark = get_spark("r14_scale_probe")
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        # bench-faithful warmup per warehouse
        REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()
        for t in STAR_TABLES:
            load_table(spark, sf_dir, t).write.format("noop").mode(
                "overwrite").save()
        dp = spark.sparkContext.defaultParallelism
        spark.range(dp * 4, numPartitions=dp).mapInPandas(
            lambda it: it, "id long").write.format("noop").mode(
            "overwrite").save()
        for name in names:
            ts = []
            for _ in range(args.runs):
                if name in POOLED_QUERIES:
                    clear_pools()  # the pool BUILD is the computation
                spark._jvm.System.gc()
                t0 = time.time()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                ts.append(round(time.time() - t0, 3))
            results[name][label] = min(ts)
            print(f"[probe] {label} {name} {min(ts)}s (runs {ts})",
                  file=sys.stderr, flush=True)

    out = os.path.join(REPO, ".scale", "r14_probe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    labels = [os.path.basename(d.rstrip("/")) for d in sf_dirs]
    hdr = "| query | " + " | ".join(f"{b} (s)" for b in labels)
    hdr += " | ratio/volume |"
    print(hdr)
    print("|" + "---|" * (len(labels) + 2))
    for name in names:
        row = results[name]
        cells = " | ".join(f"{row.get(b, float('nan'))}" for b in labels)
        first, last = labels[0], labels[-1]
        vol = 10 ** (len(labels) - 1)
        ratio = (
            round(row[last] / row[first] / vol, 3)
            if row.get(first) and row.get(last)
            else None
        )
        print(f"| {name} | {cells} | {ratio} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
