"""Time a subset of registry queries under bench.py's exact rules.

Usage::

    python tools/bench_subset.py [--sf DIR] query [query ...]

Same measurement context as bench.py (q1 + every STAR_TABLES scan +
python-worker-pool warmup, System.gc() before each run, best-of-2 via
the noop sink) so numbers are comparable to BASELINE.md rows without
paying for the full 201-query sweep while iterating.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.schemas import STAR_TABLES  # noqa: E402
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402
from world_vaccination_coverage_etl_spark.sources.registry import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("bench_subset")
    REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format(
        "noop").mode("overwrite").save()
    for t in STAR_TABLES:
        load_table(spark, args.sf, t).write.format("noop").mode(
            "overwrite").save()
    dp = spark.sparkContext.defaultParallelism
    spark.range(dp * 4, numPartitions=dp).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    for name in args.queries:
        times = []
        for _ in range(args.runs):
            spark._jvm.System.gc()
            t0 = time.time()
            REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(times)} runs={times}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
