"""Canonicalization: connected components via iterative min-label
propagation over DataFrame joins.

Catalyst cannot express a loop (SURVEY.md §4), so the driver iterates:
each round propagates the component-minimum label across edges and stops
when no label changed. The link graph is a forest of shallow stars
(surface → entity_key), so convergence takes 2-3 rounds; for general
graphs the same loop bounds at O(diameter) and the code localCheckpoints
every round to cut lineage (and to keep AQE re-planning each round's
shuffle independently).

The result matches kernels/canonical.connected_components exactly: every
node labeled with the lexicographically smallest member of its component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def links_to_edges(links: DataFrame) -> DataFrame:
    """links(norm_key, entity_key, ...) → undirected edge list (src, dst).
    Unlinked surfaces become singleton self-edges."""
    surface = F.concat(F.lit("surface:"), F.col("norm_key"))
    return links.select(
        surface.alias("src"),
        F.coalesce(F.col("entity_key"), surface).alias("dst"),
    )


def connected_components(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """edges(src, dst) → (node_id, canon_id) with canon_id = min member."""
    spark = edges.sparkSession
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("label", F.col("node_id"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        # propagate: every node also hears its neighbors' labels
        neighbor_labels = (
            sym.join(labels, sym["src"] == labels["node_id"])
            .select(F.col("dst").alias("node_id"), "label")
        )
        new_labels = (
            labels.select("node_id", "label")
            .unionByName(neighbor_labels)
            .groupBy("node_id")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    return labels.select("node_id", F.col("label").alias("canon_id"))


def canonicalize(links: DataFrame, max_iterations: int = 25) -> DataFrame:
    return connected_components(links_to_edges(links), max_iterations)
