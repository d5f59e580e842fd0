"""Salted (skew-mitigated) join.

A shuffled join hash-partitions both sides on the join key, so one hot
key — the celebrity user, the null-ish default id, the top domain —
lands its entire row set on a single reducer while the other 999
executors idle.  Salting splits the hot key's rows across
``salt_parts`` reducers: the BIG side gets a deterministic per-row
salt appended to its key, and the SMALL side is replicated once per
salt value, so every (key, salt) partition can still complete its
join locally.  Cost: small side shuffled ``salt_parts`` x — the right
trade whenever the small side is modest but too big to broadcast.

This is the join-side sibling of ``salted_agg_count``
(operators/sampling.py) and the manual form of what AQE's
``skewJoin`` does adaptively; the explicit operator exists for the
cases AQE can't see (skew appearing after a runtime filter, or a
non-shuffle stage boundary) and for engines/configs without AQE.

The salt derives from ``xxhash64`` of the big side's row, so results
are deterministic run-to-run; the OUTPUT is salt-invariant by
construction (every big row joins the same small rows it would have
joined unsalted), which the registered query's oracle — the plain
unsalted join — verifies by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_parts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on equi-keys ``on``, spreading each
    key over ``salt_parts`` reducers.

    ``how`` is restricted to joins that preserve the big side
    ('inner', 'left', 'left_semi', 'left_anti'): each big row carries
    exactly one salt, so its join semantics are unchanged; a
    right/full outer would emit the small side's unmatched rows once
    PER SALT, which is wrong by construction.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted join preserves the big side only; {how!r} not in "
            f"{sorted(allowed)}"
        )
    if salt_parts <= 0:
        raise ValueError(f"salt_parts must be positive, got {salt_parts}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                      F.lit(salt_parts)).cast("int")
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_parts - 1)))
    )
    out = salted_big.join(replicated_small, [*on, _SALT], how)
    return out.drop(_SALT)
