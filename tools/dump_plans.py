"""Dump ``explain("formatted")`` for registry queries to files.

Usage::

    python tools/dump_plans.py --out plans/r13 --suffix _before [query ...]

No queries given = the whole registry.  Used by the optimization round
to record before/after physical plans (the judge checks plan claims
against these files).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from world_vaccination_coverage_etl_spark.queries import REGISTRY  # noqa: E402
from world_vaccination_coverage_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("dump_plans")
    names = args.queries or sorted(REGISTRY)
    for name in names:
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        try:
            df = REGISTRY[name].fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record the failure, keep going
            text = f"<explain failed: {exc!r}>\n"
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
