"""Deterministic policy-brief narrative from aggregated statistics.

Reproduces the reference's rule-based text generation contract
(``_policy_brief_text``, global_vaccination_coverage_explorer_app.py:163-188):
a (risk, implication, action) triple derived from the window-compare
aggregates, with a degenerate branch when either window has ≤ 1
observation.  Driver-side formatting over the one-row-per-group
aggregate — never an engine operator.
"""

from __future__ import annotations

import math


def policy_brief(
    avg_before: float | None,
    avg_after: float | None,
    diff_pp: float | None,
    p_value: float | None,
    n_before: int,
    n_after: int,
) -> tuple[str, str, str]:
    """(risk, implication, action) narrative for one series comparison."""
    if (
        n_before <= 1
        or n_after <= 1
        or p_value is None
        or (isinstance(p_value, float) and math.isnan(p_value))
    ):
        return (
            "Too few yearly observations fall inside one or both comparison "
            "windows for a dependable significance test.",
            "Treat the numbers as descriptive; the before/after contrast is "
            "not statistically grounded yet.",
            "Widen the pre/post windows, or pick a series with a longer "
            "observation history, before drawing conclusions.",
        )
    risk = (
        f"Coverage moves {diff_pp:+.1f} percentage points across the campaign "
        f"boundary (p = {p_value:.4f}). Reporting gaps, denominator revisions, "
        "and publication lag can all mimic or mask real movement."
    )
    implication = (
        f"The pre-window average is {avg_before:.1f}% against {avg_after:.1f}% "
        "after; the shift is directional evidence, not proof of cause."
    )
    action = (
        "Flag the series for programme review, cross-check against delivery "
        "records, and corroborate with neighbouring antigens before acting."
    )
    return risk, implication, action
