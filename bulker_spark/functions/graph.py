"""Connected components over candidate-pair edges: duplicate clustering.

The last stage of a near-dup pipeline: LSH/Jaccard emits *pairs*; keeping
one document per duplicate *group* requires the transitive closure —
(a,b),(b,c) is one cluster {a,b,c} even though (a,c) never scored.

Spark-first: iterative min-label propagation on DataFrames — each round
every node adopts the smallest label among itself and its neighbors;
converged when no label changes. Rounds = graph diameter (near-dup
clusters are shallow — a handful of rounds). Each round is one shuffle on
the edge key; labels/edges are persisted so the lineage doesn't re-execute,
and the loop early-stops on a cheap count. This is the standard
large-graph CC formulation (the same shape GraphX/GraphFrames use under
the hood) without needing either package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """→ DataFrame[node, component] where component = min node id reachable.

    Nodes are everything appearing in either edge endpoint; isolated nodes
    (no edges) are the caller's concern — union them in with
    ``component = node`` if needed.
    """
    # undirected: keep both directions once
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    for _ in range(max_iterations):
        # each node's candidate label: min over neighbors' labels and own
        neighbor_min = (
            e.join(labels, e.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("n_comp"))
        )
        updated = labels.join(neighbor_min, on="node", how="left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("n_comp", "component")
            ).alias("component"),
            (F.coalesce("n_comp", "component") < F.col("component")).alias(
                "_changed"
            ),
        )
        # localCheckpoint truncates the lineage — without it each round's
        # plan nests the previous round's and the tree grows exponentially
        # (driver OOM before the data is ever large). On a real cluster
        # use spark.sparkContext.setCheckpointDir + .checkpoint() for
        # fault-tolerant truncation; the algorithm is unchanged.
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("_changed")).count()
        labels.unpersist()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    e.unpersist()
    return labels
