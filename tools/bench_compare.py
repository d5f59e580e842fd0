"""Host-normalized per-query bench comparison.

Raw cross-round totals mislead: the round hosts differ by up to ~2.3x
on identical code (measured r4->r5 on untouched pure-JVM queries).
This tool compares two bench JSON lines the way the round notes do by
hand: estimate the host ratio as the median per-query ratio, then flag
queries whose ratio deviates from that baseline by more than a
threshold in either direction.

Host factor (r6 verdict item 5; cohort broadened late-r9 per the r8
verdict's caveat): the median is taken over the SUB-SECOND baseline
cohort — every query whose OLD-run/recorded time is under 1 s
(~146 of 200 in the r9 table), falling back to the 20 cheapest when
the cohort is thin.  A sub-second query's cost is scan + fixed
overhead with a plan that never changes round-to-round, so its drift
IS the host; the expensive plan-bearing queries still do not vote.
The old 20-cheapest cohort was dominated by pure job-launch overhead
and under-tracked compute-shaped host drift (r8 verdict what's-wrong
item 2 predicted exactly this; measured late-r9: cheapest-20 median
1.198 while the broad cohort showed sub-second compute queries at
2-2.7x on an unchanged plan).  A ~146-vote median is also HARDER for
a real regression to masquerade in than a 20-vote one.

Usage::

    python tools/bench_compare.py OLD.json NEW.json [threshold]

Threshold is the multiplicative deviation from the host-normalized
expectation (default 1.5: flag queries >1.5x slower or >1.5x faster
than the host ratio predicts).
"""

from __future__ import annotations

import json
import re
import statistics
import sys

N_TRIVIAL = 20     # fallback votes: the N cheapest old-run queries
SUB_SECOND = 1.0   # primary cohort: every old-run query under this


def load_baseline_md(path: str) -> dict[str, float]:
    """Per-query seconds from BASELINE.md's recorded markdown table."""
    out: dict[str, float] = {}
    for m in re.finditer(
        r"^\| ([A-Za-z0-9_]+) \| ([0-9.]+) \|$", open(path).read(), re.M
    ):
        out[m.group(1)] = float(m.group(2))
    return out


def host_factor(
    old: dict[str, float], new: dict[str, float], n_trivial: int = N_TRIVIAL
) -> float:
    """Median new/old ratio over the sub-second old-run cohort
    (fallback: the n cheapest old-run queries when the cohort is
    thinner than 2*n — e.g. a tiny ad-hoc comparison file)."""
    common = [q for q in old if q in new and old[q] > 0]
    cohort = [q for q in common if old[q] < SUB_SECOND]
    if len(cohort) < 2 * n_trivial:
        cohort = sorted(common, key=lambda q: old[q])[:n_trivial]
    if not cohort:
        return 1.0
    return statistics.median(new[q] / old[q] for q in cohort)


def load(path: str) -> dict[str, float]:
    """Accept either bench.py's raw one-line output or the driver's
    BENCH_r{N}.json wrapper (bench line embedded in its "tail" field)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if "queries" in doc:
                return doc["queries"]
            if "tail" in doc:
                text = doc["tail"]
            elif "parsed" in doc and isinstance(doc["parsed"], dict):
                return doc["parsed"]["queries"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)["queries"]
    # the tail field may hold the bench line without a newline prefix
    idx = text.find('{"metric"')
    if idx >= 0:
        return json.loads(text[idx:].splitlines()[0])["queries"]
    raise SystemExit(f"no bench JSON line found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    host = host_factor(old, new)
    print(
        f"common={len(common)}  host_ratio(sub-second-cohort median)="
        f"{host:.3f}  all-query median={statistics.median(ratios.values()):.3f}  "
        f"new_only={sorted(set(new) - set(old))}"
    )
    flagged = []
    for q in common:
        norm = ratios[q] / host
        if norm > threshold or norm < 1 / threshold:
            flagged.append((norm, q))
    for norm, q in sorted(flagged, reverse=True):
        direction = "SLOWER" if norm > 1 else "faster"
        print(
            f"  {q}: {old[q]:.3f}s -> {new[q]:.3f}s "
            f"({norm:.2f}x host-normalized, {direction})"
        )
    if not flagged:
        print("  no query deviates beyond the threshold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
