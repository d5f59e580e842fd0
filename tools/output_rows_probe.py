"""Measure result-row growth for queries whose OUTPUT scales faster
than their input.

The sf1 stress bound (time_ratio <= input_ratio * 1.5) presumes the
true answer grows at most linearly with the input.  Pair-emitting
near-dup queries violate that presumption on the `make_sf1` warehouse
by construction: copies 1..9 of every document are mutual near-dups,
so each doc becomes a 10-clique and the exact pair set grows
quadratically in the clone count (measured: minhash_near_dup 256 ->
250,512 pairs on a 10x input — 978x).  No algorithm can emit R rows in
o(R) time, so for such queries the survival bound must be taken
against max(input_ratio, output_ratio).

This tool measures and records that, reproducibly: it runs the named
registry queries at both SF dirs, counts result rows, and writes
``SCALING_OUTPUT_ROWS.json`` which ``tools/scale_stress.py`` consumes
(queries listed there get bound = max(15, output_ratio * 1.5), and the
report prints the measured row counts so the exception is auditable).

Usage: python tools/output_rows_probe.py [sf01_dir] [sf1_dir] query...
Defaults: /root/testdata/sf0.1 .scale/sf1 minhash_near_dup
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf01 = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    sf1 = args[1] if len(args) > 1 else ".scale/sf1"
    names = args[2:] or ["minhash_near_dup"]
    spark = get_spark("output_rows_probe")
    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        small = fn(spark, sf01).count()
        big = fn(spark, sf1).count()
        out[name] = {
            "sf01_rows": small,
            "sf1_rows": big,
            "output_ratio": round(big / max(small, 1), 2),
        }
        print(f"{name}: {small} -> {big} rows "
              f"({out[name]['output_ratio']}x)", file=sys.stderr)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING_OUTPUT_ROWS.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
