"""Benchmark harness: run every registry query at a scale-factor dir and
print ONE JSON line with per-query wall times.

Contract (driver): ``{"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}`` — value is the total wall
time of one full pass over the registry.

Env:
- ``SPARK_GRAFT_SF_DIR``  (default /root/testdata/sf0.1)
- ``SPARK_GRAFT_CPUS``    (default 32; forwarded to the session factory)

Each query executes to completion through the ``noop`` sink (all
operators run, nothing is collected to the driver), which is the
fairest distributed-execution measurement local mode offers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    spark = get_spark("bench")

    # warm the JVM/codegen/Python-worker pools outside the measured pass
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_query: dict[str, float] = {}
    t_total = time.time()
    for name, qd in REGISTRY.items():
        # local-mode hygiene: tens of varied queries in one JVM leave
        # garbage + weakly-referenced cleaner state that only a full GC
        # releases; without this, later Arrow-UDF queries measure 3-8x
        # slower (GC churn), which a per-executor-heap cluster never
        # sees.  Measured: 31.7s -> 3.9s on the same query.
        spark._jvm.System.gc()
        t0 = time.time()
        qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 3)
        print(f"[bench] {name} {per_query[name]}s", file=sys.stderr, flush=True)
    total = round(time.time() - t_total, 3)

    print(
        json.dumps(
            {
                "metric": "registry_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf_num,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
