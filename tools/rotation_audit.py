"""Audit (and optionally regenerate) the certification rotation lists.

The driver's CORRECTNESS gate records only the FIRST 50 registry
entries per round, so iteration order decides which queries get a
driver-written correctness row.  Policy (r5 verdict item 2): the head
must hold exactly the oldest never-driver-certified entries until the
backlog drains; entries with at least one driver row take the tail,
least-recently-certified first.

Usage:
    python tools/rotation_audit.py          # check current lists
    python tools/rotation_audit.py --emit   # print regenerated lists

Exit 0 = the current `_CERT_EARLY` head is exactly the 50 oldest
never-certified entries and every certified entry is behind every
never-certified one; non-zero otherwise.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAD_WINDOW = 50  # driver's observed CORRECTNESS truncation


def certified_rounds() -> dict[str, int]:
    """name -> latest round with a GREEN driver-written correctness row.

    Green = err is null and rows/schema/hash all matched.  A failed or
    errored row is NOT certification (r7 verdict item: the hash-blind
    version counted embedding_covariance's FAILED r7 row as certified,
    which would have sunk the one red entry to the rotation tail).
    """
    out: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        rnd = int(m.group(1)) if m else 0
        with open(f) as fh:
            for name, row in json.load(fh).items():
                if (
                    row.get("err") is None
                    and row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ):
                    out[name] = max(out.get(name, 0), rnd)
    return out


def definition_order() -> list[str]:
    """@register order across the queries/ package, in the registration
    order fixed by __init__'s topic-module import sequence."""
    pkg = os.path.join(REPO, "world_vaccination_coverage_etl_spark", "queries")
    init = open(os.path.join(pkg, "__init__.py")).read()
    modules = re.findall(r"from \. import (m\d+\w+)", init)
    names: list[str] = []
    for mod in modules:
        src = open(os.path.join(pkg, f"{mod}.py")).read()
        names += re.findall(r'@register\(\s*"([A-Za-z0-9_]+)"', src)
    assert len(names) == len(set(names)), "duplicate @register names"
    return names


def main() -> int:
    emit = "--emit" in sys.argv
    cert = certified_rounds()
    defn = definition_order()
    never = [n for n in defn if n not in cert]
    cert_sorted = sorted(
        (n for n in defn if n in cert), key=lambda n: (cert[n], defn.index(n))
    )

    if emit:
        def block(title, names):
            print(f"{title} = [")
            for n in names:
                print(f'    "{n}",')
            print("]")

        block("_CERT_EARLY", never[:HEAD_WINDOW])
        print("\n# middle (unlisted; leads next round's window):")
        for n in never[HEAD_WINDOW:]:
            print(f"#   {n}")
        print()
        block("_CERT_LATE", cert_sorted)
        return 0

    from world_vaccination_coverage_etl_spark.queries import REGISTRY

    order = list(REGISTRY)
    head = order[:HEAD_WINDOW]
    errors = []
    want_head = never[: min(HEAD_WINDOW, len(never))]
    if head[: len(want_head)] != want_head:
        missing = [n for n in want_head if n not in head]
        errors.append(
            f"head is not the {len(want_head)} oldest never-certified entries "
            f"(missing from head: {missing[:5]}...)"
        )
    # no certified entry may precede a never-certified one
    seen_cert_at = None
    for i, n in enumerate(order):
        if n in cert and seen_cert_at is None:
            seen_cert_at = i
        if n not in cert and seen_cert_at is not None:
            errors.append(
                f"never-certified {n!r} (pos {i}) sits behind certified "
                f"{order[seen_cert_at]!r} (pos {seen_cert_at})"
            )
            break
    print(
        f"registry={len(order)} certified={len(cert)} "
        f"never-certified={len(never)} head_window={HEAD_WINDOW}"
    )
    for e in errors:
        print("FAIL:", e)
    if not errors:
        print("OK: rotation drains the backlog oldest-first")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
