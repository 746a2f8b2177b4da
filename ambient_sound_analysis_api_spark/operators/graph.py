"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate detection emits *pairs*; acting on them (keep one canonical
doc per duplicate group) needs the transitive closure — connected
components over the similarity graph. This is the engine's iterative-
algorithm surface: a driver-side loop of joins, each iteration a bounded
Spark job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Assign every node the minimum node id reachable from it.

    Min-label propagation: each round, every node takes the min of its own
    label and its neighbors' labels; converges in O(component diameter)
    rounds. Near-dup components are shallow (dup clusters are cliques or
    near-cliques from the pair generators), so a handful of rounds
    suffices; ``max_iter`` bounds pathological chains.

    Scale notes: each round is one shuffle (join on the edge endpoint) plus
    a min-aggregate; lineage is truncated with ``localCheckpoint`` every
    round so the plan doesn't grow with iterations (the classic iterative-
    Spark trap). For graphs with huge diameters, swap in the
    large-star/small-star algorithm (O(log n) rounds, same join primitive)
    — near-dup clustering does not need it.

    Returns ``(node_col, cluster_id)`` — singleton nodes keep their own id.
    """
    # Materialize the symmetric edge set ONCE: every iteration joins against
    # it, and without this the full upstream edge-generation pipeline (e.g.
    # the Jaccard shingle join) would re-execute per round. Both orientations
    # come from a SINGLE pass over `edges` (explode of a 2-element array) —
    # a union of two selects would execute the upstream pipeline twice, since
    # Spark does not share common subplans across union branches. No
    # `distinct`: the consumer is a min-aggregate, which is duplicate-
    # tolerant, so deduplicating the edge list would be a pure extra shuffle.
    # persist (not checkpoint): it caches the data AND keeps plan statistics.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .persist()
    )
    labels = nodes.select(
        F.col(node_col).alias("u"), F.col(node_col).alias("lbl")
    ).localCheckpoint()

    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(
                    labels.withColumnRenamed("u", "v2"), sym["v"] == F.col("v2")
                )
                .groupBy("u")
                .agg(F.min("lbl").alias("nbr_lbl"))
            )
            # The changed flag rides the propagation join (a label only
            # changes when a strictly smaller neighbor label arrives), so
            # convergence is read off the already-checkpointed frame with a
            # shuffle-free filter+isEmpty — not a separate join job per
            # iteration, which at cluster scale would be a full extra job
            # launch per round.
            new_labels = (
                labels.join(neighbor_min, "u", "left_outer")
                .select(
                    "u",
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                    ).alias("lbl"),
                    F.coalesce(
                        F.col("nbr_lbl") < F.col("lbl"), F.lit(False)
                    ).alias("chg"),
                )
                .localCheckpoint()
            )
            converged = new_labels.filter(F.col("chg")).isEmpty()
            labels = new_labels.drop("chg")
            if converged:
                break
    finally:
        # release even when an iteration's job dies — a long-lived session
        # must not accumulate corpus-sized edge caches from failed runs
        sym.unpersist()
    return labels.select(F.col("u").alias(node_col), F.col("lbl").alias("cluster_id"))
