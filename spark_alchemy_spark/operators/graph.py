"""Iterative graph operators: connected components for dedup
clustering.

The dedup suite (operators/dedup.py) emits near-duplicate *pairs*; a
curation pipeline needs *clusters* — every document mapped to one
canonical representative even when duplicates chain A~B~C without A~C.
That closure is connected components over the pair graph.

Scale design: min-label propagation as a DataFrame loop —
each round joins the current labels across (symmetrized) edges and
keeps the per-node minimum, so one round is one shuffle on the node
key; rounds needed = graph diameter (small for dup clusters, which are
near-cliques).  Convergence is detected by counting changed labels
(a single aggregate scalar per round — no driver-side row iteration;
label-type agnostic, so string node ids converge correctly too), and
``localCheckpoint`` cuts the growing lineage every round, which is
what keeps plan size and task deserialization flat when the loop runs
long (the classic iterative-algorithm failure mode on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; the component id
    is the minimum node id reachable from the node.

    Min-label propagation to fixpoint (bounded by ``max_iter``);
    isolated nodes never appear in ``edges`` and so are their own
    implicit singleton components — callers union them in if needed.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(neigh_min, labels.node == neigh_min.a, "left")
            .select(
                "node",
                F.col("comp").alias("old_comp"),
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)  # cut lineage every round
        )
        # Convergence = zero labels changed this round.  `!=` on the label
        # column works for any orderable id type (long, string, ...),
        # unlike a SUM over labels which is NULL for strings and would
        # silently exit the loop early with wrong chained components.
        changed = updated.filter(F.col("comp") != F.col("old_comp")).count()
        labels = updated.drop("old_comp")
        if changed == 0:
            break
    return labels
