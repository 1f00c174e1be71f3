"""Connected components over a pair list — turning pairwise near-duplicate
edges (MinHash/SimHash output) into duplicate *clusters*, the step a
production dedup pipeline needs before it can pick one representative per
group. Absent from the reference (SURVEY.md §2.2: no joins at all).

Algorithm: iterative minimum-label propagation (the DataFrame form of the
alternating large-star/small-star technique from Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each node starts labeled with
itself; every round each node adopts the minimum label in its closed
neighborhood; converged when no label changes. Rounds are O(graph diameter)
— near-duplicate graphs are unions of small dense cliques, so 2-4 rounds in
practice.

Scale design:
- state between rounds is one (node, label) row per node — never the closure;
- each round is one shuffle (symmetrized edges joined to labels, min-agg);
- ``localCheckpoint`` cuts lineage each round so plans do not grow with the
  iteration count (the classic iterative-DataFrame trap);
- convergence is a cheap count of changed labels (AQE-coalesced aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes don't appear (a
    caller wanting singleton clusters unions the full id table afterwards).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize once; both directions feed every round
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # each node's new label: min over its own label and neighbors' labels
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a.alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        )
        changed = new_labels.filter(F.col("new_label") != F.col("label")).limit(1).count()
        labels = (
            new_labels.select("node", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster summary from near-duplicate pairs: (component, n_members,
    keep_id) — keep the minimum id, drop the rest. This is the final step of
    a dedup pipeline: pairs → components → one representative per cluster."""
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("keep_id"),
    )
