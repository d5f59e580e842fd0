"""Connected components over duplicate-pair graphs.

Near-dup detection emits PAIRS; actual corpus dedup needs CLUSTERS —
every document labeled with its duplicate-component representative so
one keeper per component survives.  This is the step between
``operators/dedup.py`` pair output and a curation decision.

Algorithm: iterative min-label propagation ("hash-to-min" family,
cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public literature).  Each round every node adopts the
minimum label among itself and its neighbors:

    label[v]  <-  min(label[v], min over (u,v) edges of label[u])

which converges to component-id = min node id in O(graph diameter)
rounds.  Duplicate graphs are near-cliques (diameter 1-2), so 3-5
rounds settle real corpora.

Scale shape per round: one shuffle (edge join on src) + one shuffle
(groupBy dst) — both on short integer keys, partial-aggregated
map-side.  Labels are lineage-cut each round via the shared
``staging.stage`` helper — ``localCheckpoint`` locally, durable
per-round parquet staging tables when ``staging_dir`` is given (the
cluster path; two alternating paths so a write never overwrites the
parquet it reads).  Convergence is detected with a single
aggregated count per round — no driver-side data collection; only the
scalar changed-count returns to the driver.  Nothing in the loop holds
state proportional to data size on the driver, so the operator is the
same plan at 100 TB with more executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staging import stage


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
    Raises if ``max_iter`` rounds don't converge — for duplicate
    graphs that means the input is pathological, not the algorithm.
    """
    # undirected: propagate both ways
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    rev = edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    und = fwd.unionAll(rev)
    # edges re-scan every round: materialize once (stage() = durable
    # parquet when staging_dir is given — the cluster path)
    und = stage(und, staging_dir, "cc_edges")

    labels = stage(
        nodes.select(
            F.col(id_col).alias("node"),
            F.col(id_col).cast("long").alias("label"),
        ),
        staging_dir,
        "cc_labels_init",
    )

    for it in range(max_iter):
        # min neighbor label per node, one join + one partial-agg shuffle
        neighbor_min = (
            und.join(labels, und.src == labels.node, "inner")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "__changed"
                ),
            )
        )
        # per-round lineage cut; staged flavor alternates two paths so
        # each write never overwrites the parquet it is reading from
        updated = stage(updated, staging_dir, f"cc_labels_{it % 2}")
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels.select(
                F.col("node").alias(id_col), F.col("label").alias("component_id")
            )
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def component_summary(components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cluster roll-up: component size + keeper (the representative is
    the component id itself, i.e. the min doc id).  One shuffle."""
    return components.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(id_col).alias("keeper_id"),
    )
