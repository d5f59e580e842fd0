"""Connected components over duplicate-pair graphs.

Near-dup detection emits PAIRS; actual corpus dedup needs CLUSTERS —
every document labeled with its duplicate-component representative so
one keeper per component survives.  This is the step between
``operators/dedup.py`` pair output and a curation decision.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature).  Each round rewrites the EDGE SET instead of propagating
labels one hop:

    large-star(u):  connect every neighbor v > u to
                    m(u) = min(N(u) ∪ {u})        → emits (m, v)
    small-star(v):  connect every neighbor u < v (and v itself) to
                    m(v) = min of those neighbors → emits (m, u), (m, v)

The composition halves component "heights" geometrically, so the
fixpoint — a star forest with every node pointing directly at its
component's minimum id — arrives in O(log n) rounds regardless of
graph diameter.  That is the r8→r9 re-plan: the previous one-hop
min-label propagation needed O(diameter) rounds, and the synthetic
dup corpora grow clone-chain diameters with scale, which compounded
to a measured 90× runtime at 100× input.  Star rounds also SHRINK the
edge set toward |V|−|components| rows, so late rounds are nearly free
where label propagation re-joined the full edge set every round.

Scale shape per round: two groupBy→join passes over the current edge
set (short integer keys, partial-aggregated map-side) + one
dropDuplicates.  Edges are kept canonical (u < v), so the parent side
of every edge is always the smaller id.  Convergence is the star-
forest test "no parent id also appears as a child id" — a semi-join
with ``limit(1)``; only that scalar returns to the driver.  Each
round is lineage-cut via the shared ``staging.stage`` helper
(``localCheckpoint`` locally, durable per-round parquet staging
tables when ``staging_dir`` is given — two alternating paths so a
write never overwrites the parquet it reads).  Nothing in the loop
holds state proportional to data size on the driver, so the operator
is the same plan at 100 TB with more executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staging import stage


def _large_star(e: DataFrame) -> DataFrame:
    """Emit (m(u), v) for every neighbor v > u; m(u) = min(N(u) ∪ {u}).

    Input/output edges are canonical (u < v).  Output size is exactly
    one row per input edge (the strictly-larger endpoint is emitted
    once, from its smaller center), possibly with duplicates that the
    end-of-round dropDuplicates clears."""
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    # m ≤ u always, so emitted edges (m, v) with v > u ≥ m stay canonical
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        und.join(mins, on="u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), "v")
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Emit (m, u) for every neighbor u < v with u ≠ m, plus (m, v);
    m = min of v's strictly-smaller neighbors.

    With canonical edges the strictly-smaller neighbors of a center v
    are exactly the u-sides of its edges, so no union with a reversed
    copy is needed."""
    sm = e.groupBy("v").agg(F.min("u").alias("m"))  # m < v by canon
    redirect = (
        e.join(sm, on="v")
        .filter(F.col("u") != F.col("m"))
        .select(F.col("m").alias("u"), F.col("u").alias("v"))
    )
    to_root = sm.select(F.col("m").alias("u"), "v")
    return redirect.unionAll(to_root).dropDuplicates(["u", "v"])


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    staging_dir: str | None = None,
) -> DataFrame:
    """Label every node with its component id (min node id reachable).

    ``nodes``: one row per node (``id_col``); singletons allowed.
    ``edges``: undirected pair list (``src_col``, ``dst_col``).
    Raises if ``max_iter`` rounds don't converge — large-star/small-
    star needs O(log n) rounds, so 25 covers any physically possible
    graph; non-convergence means the input is pathological (e.g. null
    ids), not the algorithm.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).cast("long").alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))  # self-loops carry nothing
        .dropDuplicates(["u", "v"])
    )
    e = stage(e, staging_dir, "cc_edges_0")

    for it in range(max_iter):
        e = stage(
            _small_star(_large_star(e)), staging_dir, f"cc_edges_{(it % 2) + 1}"
        )
        # star-forest test: converged iff no parent id is also a child
        # id AND every child has exactly one parent (edges (2,18),(7,18)
        # — a path through 18 — pass the first test alone).  Both
        # violation probes ride one unionAll + limit(1) action, so a
        # round costs a single scheduling-latency scalar job; probing
        # AFTER the round (not before the first) saves a probe per call
        # — a star round on an already-star input is a no-op anyway.
        violation = (
            e.select("u")
            .join(e.select(F.col("v").alias("u")), on="u", how="left_semi")
            .select(F.lit(1).alias("x"))
            .unionAll(
                e.groupBy("v")
                .agg(F.count(F.lit(1)).alias("np"))
                .filter(F.col("np") > 1)
                .select(F.lit(1).alias("x"))
            )
            .limit(1)
            .count()
        )
        if violation == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # final edge set is a star forest (child v → root u = component min);
    # groupBy is defensive versus duplicate child rows
    stars = e.groupBy(F.col("v").alias("node")).agg(
        F.min("u").alias("root")
    )
    return (
        nodes.select(
            F.col(id_col).alias("node"),
            F.col(id_col).cast("long").alias("self_label"),
        )
        .join(stars, on="node", how="left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("root", "self_label").alias("component_id"),
        )
    )


def component_summary(components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cluster roll-up: component size + keeper (the representative is
    the component id itself, i.e. the min doc id).  One shuffle."""
    return components.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(id_col).alias("keeper_id"),
    )
