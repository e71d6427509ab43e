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
single boolean (isEmpty on the changed-set), not data. Propagation
rounds are bounded by the component DIAMETER; for giant-diameter
graphs ``_star_contraction`` below runs the alternating
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") — logarithmic rounds in
component size — and ``connected_components`` falls back to it
automatically when propagation exhausts ``max_iter``, so the operator
never fails on diameter alone. Near-dup graphs (short chains) stay on
the cheaper per-round propagation path. The edge list and
per-superstep labels are pinned with ``localCheckpoint`` (executor
local storage — right for iterative lineage-cutting, NOT
fault-tolerant); on a long-running cluster job swap for reliable
``checkpoint()`` to a shared checkpoint dir so executor loss doesn't
restart the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_contraction(und: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Large-star/small-star CC over a symmetric, checkpointed edge
    list — O(log n) rounds regardless of diameter.

    Each round: LARGE-STAR hangs every neighbor v > u onto u's
    neighborhood minimum; SMALL-STAR hangs every neighbor v <= u (and
    u itself) onto that minimum. The edge set monotonically flattens
    into stars whose centers are the component minima; convergence =
    a round that changes nothing. Both operations are one
    groupBy(min) + one join per direction — the same shuffle
    profile as a propagation superstep, but the round count is
    logarithmic so a path graph of ANY length converges in a few
    dozen rounds. max_rounds=40 covers > 2^40 nodes; hitting it means
    the input is malformed (e.g. unstable ids), not big.
    """
    all_nodes = und.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)

    def _sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()

    edges = und  # symmetric (a, b)
    converged = False
    for _ in range(max_rounds):
        gamma_plus = edges.unionByName(
            edges.select(F.col("a").alias("a"), F.col("a").alias("b")).distinct()
        )
        m = gamma_plus.groupBy("a").agg(F.min("b").alias("m"))
        # large-star: (v, m(u)) for v in Γ(u), v > u
        large = (
            edges.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        # keep the u -> m(u) pointers so no node is orphaned
        anchors = m.select(F.col("a"), F.col("m").alias("b"))
        e1 = _sym(large.unionByName(anchors).filter(F.col("a") != F.col("b"))).localCheckpoint(
            eager=True
        )
        # small-star on the large-star output
        gamma_plus = e1.unionByName(
            e1.select(F.col("a").alias("a"), F.col("a").alias("b")).distinct()
        )
        m2 = gamma_plus.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            gamma_plus.join(m2, "a")
            .filter(F.col("b") <= F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select("a", F.col("m").alias("b")))
        )
        e2 = _sym(small.filter(F.col("a") != F.col("b"))).localCheckpoint(eager=True)
        if e2.exceptAll(edges).isEmpty() and edges.exceptAll(e2).isEmpty():
            edges = e2
            converged = True
            break
        edges = e2
    if not converged:
        # Mid-contraction labels are NOT component minima — returning
        # them would silently merge/split clusters. 40 rounds covers
        # > 2^40 nodes, so this fires only on malformed input.
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds — "
            "malformed edge ids (e.g. unstable/non-comparable keys)?"
        )
    # At the fixed point every edge is (node, center) ∪ (center, node);
    # the label of a node is its minimum neighbor (center <= all its
    # leaves), and centers label themselves.
    labels = (
        edges.unionByName(edges.select(F.col("a"), F.col("a").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("component"))
        .select(F.col("a").alias("node"), "component")
    )
    # Nodes whose only edge was a self-loop drop out of the contraction;
    # they are their own singleton component.
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
    algorithm: str = "auto",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component = min node id reachable over the undirected graph.

    ``edges`` rows are (src, dst) pairs; direction is ignored.
    ``algorithm``: "propagate" (min-label supersteps, rounds = graph
    diameter — right for short-chain near-dup graphs), "star"
    (large-star/small-star contraction, logarithmic rounds — right for
    giant diameters), or "auto" (default): propagate, and if
    ``max_iter`` supersteps don't converge, fall back to star
    contraction instead of failing.
    """
    if algorithm not in ("auto", "propagate", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # Materialize ONCE: every superstep joins this edge list, and
        # without the checkpoint each iteration lazily re-executes the
        # whole upstream pair-generation pipeline (for the LSH-fed
        # cluster queries that is the full candidate join + cosine
        # verification, per superstep — measured 24s → 3s at sf0.1).
        .localCheckpoint(eager=True)
    )
    if algorithm == "star":
        return _star_contraction(und)
    labels = und.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))

    for _ in range(max_iter):
        # Superstep: every node takes min(own label, neighbors' labels).
        # The changed flag is derived in the same projection (the old
        # label is already on the row), so the convergence probe reads
        # the checkpointed superstep output instead of re-joining
        # new-vs-old labels.
        neighbor_min = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", "label")).alias("new_label"),
                (F.coalesce("nmin", "label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)  # cut the growing lineage
        )
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if stepped.filter("changed").isEmpty():
            return labels.select("node", F.col("label").alias("component"))
    if algorithm == "auto":
        # Diameter outran the superstep budget — restart on the (already
        # checkpointed) edge list with the logarithmic-round algorithm.
        return _star_contraction(und)
    raise RuntimeError(f"connected_components did not converge in {max_iter} supersteps")
