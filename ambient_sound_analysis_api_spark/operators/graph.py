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

    Min-label propagation with pointer-jumping acceleration. Each round,
    every node takes the min of its own label, its neighbors' labels (the
    *hook* step — converges alone in O(component diameter) rounds), and
    its label's label (the *jump* step of Shiloach-Vishkin pointer
    doubling, which halves the remaining label-chain depth per round and
    brings worst-case convergence to O(log diameter)). The jump rides the
    SAME join as the hook: ``lbl(lbl(u))`` is the neighbor-min
    contribution of a synthetic edge ``u → lbl(u)``, so the label table
    is unioned into the per-round edge input instead of paying a second
    label self-join (round-15; the union branch is label-table-sized).

    The jump step preserves the invariant that ``lbl(u)`` is always the id
    of a node in ``u``'s component and only ever decreases, so the fixed
    point is the same component-minimum labeling as pure min-label.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence — a silently-unconverged labeling assigns WRONG clusters,
    which is strictly worse than failing.

    Scale notes: each round is one shuffle (join on the edge endpoint) plus
    a min-aggregate; lineage is truncated with ``localCheckpoint`` every
    round so the plan doesn't grow with iterations (the classic
    iterative-Spark trap).

    The iteration runs over the EDGE-INDUCED node set only: a node with no
    edges can never receive a label, so carrying the full node table
    through every round's join + checkpoint pays per-round cost on rows
    that cannot change (after exact-collapse dedup, singletons are
    typically the vast majority of a corpus). Singletons are attached by
    one final left join (label coalesces to the node's own id). The first
    hook round is fused into initialization: with identity labels, round
    0's neighbor-min for edge node ``u`` is just ``min(u, min(neighbors))``
    — one aggregation over the symmetric edge set, no join, no full-node
    checkpoint.

    .. warning:: **Edge endpoints MUST be drawn from ``nodes``.** The
       edge-induced iteration does not re-validate this: an endpoint
       absent from ``nodes`` silently participates in propagation (it can
       receive, forward, and even BECOME a component's minimum label) yet
       is dropped from the output, so misuse produces wrong labels with
       no error (round-14 ADVICE). Every in-repo caller generates edges
       from the same frame it passes as ``nodes``; external callers must
       do the same, or pre-filter edges with two semi-joins against
       ``nodes`` (a validating wrapper costs two shuffles — deliberately
       not paid on the trusted internal path).

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
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.col("u"), F.min("v")).alias("lbl"))
        .localCheckpoint()
    )

    converged = False
    try:
        for i in range(max_iter):
            # The jump step rides the SAME join as the hook step (round-15,
            # guide §2.4): pointer jumping wants lbl(lbl(u)), which is
            # exactly the neighbor-min contribution of a synthetic edge
            # u → lbl(u) — so instead of a second label self-join per
            # round, the label table itself is unioned into the edge set
            # as those edges. min over N(u) ∪ {lbl(u)} of lbl(·) =
            # min(nbr_min(u), lbl(lbl(u))), and since labels only decrease
            # and lbl(x) ≤ x, lbl(lbl(u)) ≤ lbl(u) — the self term is
            # subsumed, same fixpoint, one fewer join and one fewer
            # exchange every round. (Jumping from round 0 instead of
            # round 1 only accelerates: intermediate labelings stay
            # component-internal, the fixpoint is unchanged.)
            hop = sym.unionByName(
                labels.filter(F.col("lbl") != F.col("u")).select(
                    "u", F.col("lbl").alias("v")
                )
            )
            neighbor_min = (
                hop.join(
                    labels.withColumnRenamed("u", "v2"), hop["v"] == F.col("v2")
                )
                .groupBy("u")
                .agg(F.min("lbl").alias("nbr_lbl"))
            )
            cand = labels.join(neighbor_min, "u", "left_outer")
            best = F.least(
                F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
            )
            # The changed flag rides the propagation join (a label only
            # changes when a strictly smaller label arrives), and the
            # checkpoint is LAZY so one count job per round does both
            # (round-15, guide §1.2 job-count): counting the changed rows
            # computes every partition of the checkpoint RDD — local
            # checkpoint data is saved as partitions materialize — so the
            # single action materializes the round AND reads convergence.
            # The former eager checkpoint + filter/isEmpty pair was two
            # job launches per round for the same work.
            new_labels = cand.select(
                "u",
                best.alias("lbl"),
                (best < F.col("lbl")).alias("chg"),
            ).localCheckpoint(eager=False)
            converged = new_labels.filter(F.col("chg")).count() == 0
            labels = new_labels.drop("chg")
            if converged:
                break
    finally:
        # release even when an iteration's job dies — a long-lived session
        # must not accumulate corpus-sized edge caches from failed runs
        sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "with pointer jumping this needs a component of diameter "
            f"~2^{max_iter - 1} — check the edge set (or raise max_iter)"
        )
    return nodes.select(F.col(node_col)).join(
        labels, F.col(node_col) == F.col("u"), "left"
    ).select(
        F.col(node_col),
        F.coalesce(F.col("lbl"), F.col(node_col)).alias("cluster_id"),
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "id",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected similarity graph.

    Ranks nodes by importance within the near-duplicate graph — the
    centrality signal a curation pipeline uses to pick the "most
    representative" member of a template family (high-degree hubs of a
    boilerplate cluster rank far above singletons). Simplified variant
    without dangling-mass redistribution: isolated nodes hold the
    teleport floor ``(1-d)/N`` and leak their damped mass, which is the
    standard local-graph formulation (and keeps the oracle exactly
    unrollable).

    Cross-engine determinism (the same lock-step contract as the k-means
    chains): every per-edge contribution is ``round(pr/deg, 9)`` cast to
    DECIMAL(20,9), so the incoming-mass sum is exact and order-
    independent; the new rank is one IEEE multiply-add re-rounded to 9
    decimals, so both engines carry bit-identical ranks into the next
    iteration.

    Scale notes: the symmetric edge set with degrees is materialized ONCE
    (single-pass explode of both orientations — union would re-run the
    upstream pair generator per branch); each iteration is one equi-join
    (rank table × edges) plus one aggregation — the canonical two-shuffle
    PageRank round — and ``localCheckpoint`` truncates lineage per round.
    Driver traffic is one scalar (the node count); ranks never leave the
    cluster.
    """
    from pyspark.sql import Window

    from .caching import tracked_persist

    # one window shuffle attaches the degree to every edge row; persisted
    # once (tracked — see caching.release_caches), every iteration reads it
    sym_deg = tracked_persist(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .withColumn("d", F.count("*").over(Window.partitionBy("u")))
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(node_col),
            F.lit(0).cast("long").alias("degree"),
            F.lit(0.0).alias("pagerank"),
        )
    base = (1.0 - damping) / n
    pr = nodes.select(
        F.col(node_col).alias("nid"), F.lit(1.0 / n).alias("pr")
    ).localCheckpoint()
    for _ in range(n_iter):
        contrib = (
            sym_deg.join(pr, sym_deg["u"] == pr["nid"])
            .select(
                F.col("v"),
                F.round(F.col("pr") / F.col("d"), 9)
                .cast("decimal(20,9)")
                .alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("mass"))
        )
        pr = (
            nodes.select(F.col(node_col).alias("nid"))
            .join(contrib, F.col("nid") == F.col("v"), "left")
            .select(
                "nid",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("mass"), F.lit(0)).cast("double"),
                    9,
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    deg = sym_deg.groupBy("u").agg(F.count("*").alias("degree"))
    return pr.join(deg, pr["nid"] == deg["u"], "left").select(
        F.col("nid").alias(node_col),
        F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
        F.col("pr").alias("pagerank"),
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    guard_max_out_degree: int | None = 4096,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected edge list (unique pairs, ``src < dst``).

    Triangle participation separates tight duplicate cliques (clustering
    → 1.0) from hub-and-spoke boilerplate stars (clustering → 0) in the
    near-dup graph — the signal that decides "collapse the whole group"
    vs "only the hub is boilerplate".

    Scale design — degree-ordered orientation (the MapReduce triangle
    algorithm of Suri & Vassilvitskii, WWW'11): each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher one,
    making the graph a DAG where every triangle {u<v<w} appears exactly
    once as the wedge u→v, u→w closed by v→w. Wedge fan-out per node is
    its OUT-degree under this orientation, which is O(√m) even for hub
    nodes — the quadratic wedge explosion a naive neighbor self-join
    suffers on high-degree vertices cannot happen. Three shuffles total:
    degree count, wedge self-join on the source, closing-edge semi-join.

    Returns ``(node, degree, triangles, clustering)`` for every node with
    degree ≥ 1; ``clustering = 2·T / (deg·(deg−1))`` (0.0 for degree-1
    nodes), 6dp-rounded.

    **Blowup guard** (``guard_max_out_degree``): wedge output is
    Θ(Σ out-deg²) — exact, but on a dup-clique of size q every member
    keeps ~q/2 oriented out-edges and the stage emits Θ(q³) wedges (the
    measured 10×-dup probe: 77× time, output-bound). The documented
    operating rule is "collapse exact/fingerprint duplicates first"; the
    guard ENFORCES it: an in-plan ``assert_true`` on the oriented
    out-degree fails the wedge stage's input fast (seconds, with an
    actionable message) instead of letting a naive caller discover the
    q³ wall hours into a 1000-executor stage. The check is an
    aggregation on the same key the wedge join shuffles on, so it reuses
    that exchange — no extra shuffle. ``None`` disables (for graphs with
    known-legitimate hubs); the default 4096 bounds wedge fan-out per
    node at ~16.7M rows.
    """
    from .caching import tracked_persist

    # persisted: the edge list is consumed by the degree count AND the
    # orientation join — without the cache the full upstream
    # edge-generation pipeline (e.g. the Jaccard shingle join) executes
    # once per consumer. Narrow (two longs per row).
    e = tracked_persist(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    sym = e.select(
        F.explode(F.array(F.col("u"), F.col("v"))).alias("node")
    )
    # persisted: deg is node-sized and consumed three times (both
    # orientation sides + the final readout join); the r14 before-plan
    # re-ran the degree shuffle — and the whole edge pipeline under it —
    # per reference (226 Exchange nodes for one query).
    deg = tracked_persist(
        sym.groupBy("node").agg(F.count("*").alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    ed = e.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    # oriented edge (s → t) with t's (degree, id) order key carried along
    # so the wedge join can order its two endpoints without re-joining deg.
    # persisted: consumed by the wedge join's two sides, the closing-edge
    # semi-join, and the out-degree guard — without it each consumer
    # recomputes the two degree joins from the scan
    oe = tracked_persist(
        ed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(u_first, F.col("deg_v"))
            .otherwise(F.col("deg_u"))
            .alias("deg_t"),
        )
    )
    # Wedge generation via ONE source-keyed aggregation + in-row ordered
    # combinations (the round-14 _pair_intersections pattern): the
    # oriented edge list shuffles once instead of twice through a
    # self-equi-join on ``s``, and the (deg, id)-ordered pair filter
    # becomes "sort the neighbor array once, emit ordered combinations".
    # Per-row peak is one ≤ out-degree slice; out-degree is O(√m) under
    # the orientation and hard-bounded by the guard, which now reads
    # straight off the collected array's size (no count window needed).
    # The combinations stream through a two-step explode so a node never
    # materializes its whole wedge set in a single value.
    nb = oe.groupBy("s").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("deg_t").alias("k"), F.col("t")))
        ).alias("_ns")
    )
    if guard_max_out_degree is not None:
        # the assertion lives in a FILTER (assert_true yields NULL on
        # pass, so isNull() keeps every surviving row): in a
        # projected-then-dropped column the optimizer would prune it away
        nb = nb.filter(
            F.assert_true(
                F.size("_ns") <= F.lit(guard_max_out_degree),
                F.concat(
                    F.lit("triangle_stats: oriented out-degree "),
                    F.size("_ns").cast("string"),
                    F.lit(
                        " exceeds guard_max_out_degree="
                        f"{guard_max_out_degree} — collapse exact/"
                        "fingerprint duplicates first, or raise/disable"
                        " the guard"
                    ),
                ),
            ).isNull()
        )
    wedges = (
        nb.select(
            "s", F.posexplode("_ns").alias("_i", "_w1"), F.col("_ns")
        )
        .select(
            "s",
            F.col("_w1.t").alias("t1"),
            F.explode(
                F.slice(
                    F.col("_ns"),
                    F.col("_i") + F.lit(2),
                    F.size("_ns") - F.col("_i") - F.lit(1),
                )
            ).alias("_w2"),
        )
        .select("s", "t1", F.col("_w2.t").alias("t2"))
    )
    closing = oe.select(
        F.col("s").alias("t1"), F.col("t").alias("t2")
    )
    tri = wedges.join(closing, ["t1", "t2"], "left_semi").select(
        "s", "t1", "t2"
    )
    tn = tri.select(
        F.explode(F.array(F.col("s"), F.col("t1"), F.col("t2"))).alias("node")
    )
    tc = tn.groupBy("node").agg(F.count("*").alias("triangles"))
    out = deg.join(tc, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )
    clustering = F.when(
        F.col("degree") >= 2,
        F.round(
            (F.lit(2.0) * F.col("triangles"))
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("clustering", clustering)
