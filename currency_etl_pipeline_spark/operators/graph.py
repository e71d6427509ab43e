"""Connected components over an edge list — duplicate-CLUSTER formation,
the step after near-dup pair generation in corpus dedup (pairs say
"a~b"; training-data pruning needs "keep one doc per transitive
cluster").

Spark-first design: iterative min-label propagation (the Pregel loop
GraphFrames would run, written on plain DataFrames so there is no
GraphFrames dependency). Each superstep is one shuffle (join labels to
edges + min-aggregate); the loop exits when a superstep changes no
label. Iteration count is bounded by the cluster diameter — near-dup
clusters are short chains, so a handful of supersteps in practice.

Scale notes (100 TB): label state is one row per node and each
superstep shuffles |edges| + |nodes| rows on the node key — the same
cost profile as any Pregel CC. The driver-side convergence probe is a
single boolean (isEmpty on the changed-set), not data. For graphs with
giant diameters swap the propagation step for large-star/small-star
(alternating min over neighbors-of-neighbors) — same loop skeleton,
logarithmic rounds; near-dup graphs never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component = min node id reachable over the undirected graph.

    ``edges`` rows are (src, dst) pairs; direction is ignored. Raises
    if the loop hits ``max_iter`` without converging (diameter larger
    than expected — switch to star contraction before raising it).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))

    for _ in range(max_iter):
        # Superstep: every node takes min(own label, neighbors' labels).
        neighbor_min = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # cut the growing lineage
        changed = new_labels.alias("n").join(
            labels.alias("o"), "node"
        ).filter(F.col("n.label") != F.col("o.label"))
        labels = new_labels
        if changed.isEmpty():
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} supersteps")
