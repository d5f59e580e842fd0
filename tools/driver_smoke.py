"""Full-registry smoke under a PLAIN SparkSession (r5 verdict item 6).

The driver evaluates the contract with its OWN untuned session (no
engine confs: default shuffle partitions, no AQE tweaks, no warehouse
dir, ANSI defaults).  A query whose plan silently depends on
``session.get_spark`` tuning would pass every local sweep and then
break in the driver.  This runs ``entry(spark)`` plus EVERY
``queries()`` entry under such a session — ``limit(1)`` collect per
query, which executes the plan end-to-end without materializing
data-sized results.

Usage: python tools/driver_smoke.py [sf_dir]   (default sf0.001)
Exit 0 = every registry entry executed; failures are listed.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_smoke")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as e

    failures: list[tuple[str, str]] = []
    t0 = time.time()
    rows = e.entry(spark).limit(1).collect()
    print(f"entry: {len(rows)} row(s) ({time.time() - t0:.1f}s)", flush=True)

    qs = e.queries()
    for i, (name, fn) in enumerate(qs.items(), 1):
        t = time.time()
        try:
            fn(spark, sf_dir).limit(1).collect()
            print(
                f"[{i}/{len(qs)}] ok   {name} ({time.time() - t:.1f}s)",
                flush=True,
            )
        except Exception:
            failures.append((name, traceback.format_exc(limit=3)))
            print(f"[{i}/{len(qs)}] FAIL {name}", flush=True)

    print(
        f"\n{len(qs) - len(failures)}/{len(qs)} queries smoke-clean "
        f"under a plain session in {time.time() - t0:.0f}s"
    )
    for name, tb in failures:
        print(f"\n--- {name} ---\n{tb}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
