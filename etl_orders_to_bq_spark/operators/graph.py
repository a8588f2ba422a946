"""Iterative graph operators: connected components.

The last step of a near-dup dedup pipeline: LSH/Jaccard emit PAIRS,
but dedup needs CLUSTERS (a~b, b~c => {a,b,c} keep one). Connected
components via min-label propagation:

    label(v) <- min(label(v), min over neighbors' labels)

iterated to fixpoint. Converges in O(graph diameter) rounds; dedup
graphs are near-cliques (diameter 1-2), so 2-3 rounds in practice.

Scale notes
-----------
- each round is one self-join + one groupBy-min on (node, label) pairs
  — shuffle size is |edges|, never materializing components;
- ``localCheckpoint`` truncates the lineage each round, without it the
  plan doubles per iteration and the driver OOMs planning round ~15;
- early-exit when a round changes no label (cheap count on the
  changed-flag), so the loop does not run max_iter blindly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (id, component) where component is the smallest node id in
    the component — the canonical "representative doc" of a dup cluster.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()

    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )

    for _ in range(max_iter):
        # neighbor labels: for each node, the min label among neighbors
        neighbor_min = (
            und.join(labels, und.b == labels.id)
            .select(F.col("a").alias("id"), F.col("label"))
            .groupBy("id")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (
                    F.coalesce("nbr_label", F.col("label")) < F.col("label")
                ).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        if new_labels.filter(F.col("changed")).limit(1).count() == 0:
            labels = new_labels
            break
        labels = new_labels

    return labels.select(F.col("id"), F.col("label").alias("component"))
