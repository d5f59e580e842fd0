"""Pin: no forced broadcast hint on SF-proportional join sides.

Round-10 verdict: explicit ``F.broadcast`` hints on tables that grow
linearly with scale factor (part, supplier, customer, derived per-part
aggregates) override the size threshold and would OOM the driver at
100 TB.  The fix keeps hints ONLY on sides bounded regardless of SF
(nation/region, 1-row scalars, type-domain marginals) and leaves the
growing sides unhinted so the planner broadcasts them at small SF and
degrades to sort-merge at large SF.

The pin is behavioral, not a source grep: with BOTH broadcast
thresholds disabled, a forced hint would still plan BroadcastHashJoin
— so for queries whose every join side is SF-proportional we assert
the plan contains NO broadcast join at all under threshold -1, and
(sanity) that the planner DOES broadcast at the tiny test SF under the
default threshold.  A future edit re-adding a hint to part/supplier/
customer in these queries fails here, not on a 1000-executor driver.
"""

from __future__ import annotations

import pytest

from world_vaccination_coverage_etl_spark.queries import REGISTRY

# every join side in these queries grows with SF (part, supplier,
# customer, orders/lineitem, or an aggregate derived from them), so a
# broadcast under threshold -1 can only come from a forced hint
_ALL_SIDES_GROW = [
    "q3_top_revenue",        # customer / orders / lineitem
    "q18_large_orders",      # orders / per-order qty aggregate / customer
    "q14_promo_revenue",     # lineitem / part
    "q19_disjunctive_revenue",  # lineitem / part
    "q17_small_qty_revenue",  # lineitem / part / per-part avg aggregate
    "q16_supplier_diversity",  # lineitem / supplier anti / part
    "q21_waiting_supplier",  # lineitem / supplier / orders / per-order agg
]

_THRESH_KEYS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


def _plan(spark, sf_small, name):
    df = REGISTRY[name].fn(spark, sf_small)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _ALL_SIDES_GROW)
def test_no_broadcast_when_threshold_disabled(spark, sf_small, name):
    old = {k: spark.conf.get(k, None) for k in _THRESH_KEYS}
    for k in _THRESH_KEYS:
        spark.conf.set(k, "-1")
    try:
        plan = _plan(spark, sf_small, name)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "BroadcastHashJoin" not in plan, (
        f"{name}: broadcast join survives threshold -1 — a forced "
        f"F.broadcast hint is back on an SF-proportional side"
    )
    assert "BroadcastNestedLoopJoin" not in plan, name
    # the joins still happen — as shuffle joins
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), name


@pytest.mark.parametrize("name", _ALL_SIDES_GROW)
def test_still_broadcasts_at_tiny_sf(spark, sf_small, name):
    # sanity: dropping the hints did NOT cost the small-SF plan its
    # broadcast — the default threshold picks it from size estimates
    plan = _plan(spark, sf_small, name)
    assert "BroadcastHashJoin" in plan, (
        f"{name}: expected the planner to broadcast-join at sf0.001 "
        f"under the default threshold"
    )
