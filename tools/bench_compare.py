"""Host-normalized per-query bench comparison.

Raw cross-round totals mislead: the round hosts differ by up to ~2.3x
on identical code (measured r4->r5 on untouched pure-JVM queries).
This tool compares two bench JSON lines the way the round notes do by
hand: estimate the host ratio as the median per-query ratio, then flag
queries whose ratio deviates from that baseline by more than a
threshold in either direction.

Host factor (r6 verdict item 5): the median is taken over the
TRIVIAL-query subset — the N cheapest queries in the OLD run.  A
cheap query's cost is scan + fixed overhead with a plan that never
changes round-to-round, so its drift IS the host; expensive queries
are exactly the ones whose plans change and must not vote on the
normalization.  (Two consecutive rounds showed uniform ~1.1-1.3x
drift on plan-identical cheap queries; an all-query median lets a
broad real regression masquerade as host drift.)

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

N_TRIVIAL = 20  # host factor votes: the N cheapest old-run queries


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
    """Median new/old ratio over the n cheapest old-run queries."""
    common = [q for q in old if q in new and old[q] > 0]
    trivial = sorted(common, key=lambda q: old[q])[:n_trivial]
    if not trivial:
        return 1.0
    return statistics.median(new[q] / old[q] for q in trivial)


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
        f"common={len(common)}  host_ratio(median of {N_TRIVIAL} cheapest)="
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
