"""Distributed linear algebra: one-pass covariance + power-iteration PCA.

The top principal component of an embedding table is the workhorse
diagnostic for representation collapse (one direction swallowing the
variance), for whitening decisions, and for the "remove the dominant
direction" post-processing step (Mu & Viswanath, 2018) common in
embedding pipelines.

Scale shape — the textbook two-phase split:

- **Covariance is data-sized work**: one scan emits per-vector centered
  dimension pairs and a d²-key aggregation (map-side partials) reduces
  them — the shuffle moves at most ``d²`` partial sums per partition, so
  wire cost is independent of row count. At d=64 that is a 4096-row
  matrix; for d in the thousands the per-vector d² pair expansion is the
  bottleneck — use ``pca_top_component_datapass`` below, which never
  materializes the matrix (O(n·d) per iteration).
- **Iteration is model-sized work**: the d²-row covariance table is
  broadcast; each power-iteration step is a d²×d join + d-key
  aggregation — trivially small, and the loop is a FIXED 3 unrolled
  steps so the whole fit has a plain chained-CTE DuckDB oracle (the
  ``kmeans``/``pagerank`` contract: fixed iterations beat 'no oracle').

Cross-engine determinism: dimension means are exact DECIMAL means;
centered values round to 6dp and re-enter DECIMAL so covariance partial
sums are order-independent; every iteration's matrix-vector products
round per-term to 9dp and sum in DECIMAL(20,9) (the PageRank lock-step
contract), and the normalization is a single sqrt/divide re-rounded to
9dp. Both engines therefore carry bit-identical vectors into each next
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_ITERATIONS = 3


def _dims(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, i, x) long form; i is 1-based to match SQL subscripts."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "xr"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.col("xr").cast("double").alias("x"),
    )


def covariance_matrix(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Full covariance matrix as a long-form (i, j, c) DataFrame.

    ``c(i,j) = Σ (x_i − μ_i)(x_j − μ_j) / n`` with exact-decimal
    accumulation, 9dp-rounded.
    """
    dims = _dims(emb, id_col, vec_col)
    mu = dims.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("decimal(32,12)")).cast("double")
            / F.count("x")
        ).alias("mu")
    )
    centered = dims.join(F.broadcast(mu), "i").select(
        "vec_id",
        "i",
        F.round(F.col("x") - F.col("mu"), 6).cast("decimal(18,6)").alias("xc"),
    )
    n = emb.select(F.count("*").alias("n"))  # 1 row
    a = centered.select("vec_id", F.col("i"), F.col("xc").alias("xa"))
    b = centered.select(
        "vec_id", F.col("i").alias("j"), F.col("xc").alias("xb")
    )
    return (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("s"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            F.round(F.col("s").cast("double") / F.col("n"), 9).alias("c"),
        )
    )


def pca_top_component(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = PCA_ITERATIONS,
) -> DataFrame:
    """Top principal component by ``n_iter`` unrolled power iterations.

    Starts from the uniform unit vector (1/√d per dim — exact when d is
    a power of two), applies ``v ← normalize(C·v)`` ``n_iter`` times, and
    returns one row per dimension: ``(dim, loading, eigenvalue)`` where
    ``eigenvalue`` is the Rayleigh quotient ``vᵀCv`` of the final vector
    (v is unit-norm, so no denominator). The covariance table is
    broadcast into every step: iteration cost is model-sized, never
    data-sized.
    """
    # Every quantity that enters a product is snapped to DECIMAL(15,9)
    # FIRST and multiplied exactly (DECIMAL(30,18) terms, exact sums) —
    # never `round(product, 9)`-then-sum. The distinction is load-bearing:
    # products of 9dp decimals are exact 18dp decimals whose 9dp rounding
    # hits EXACT .5 ties systematically (e.g. v0 = 1/8 puts 1/8 of all
    # c·v products on a tie), and HALF_UP vs multiply-based rounding
    # breaks the cross-engine lock-step precisely on ties. Exact products
    # have no rounding at all; the only double→decimal snaps left are on
    # generic quotients/sums where a tie is measure-zero.
    cov = F.broadcast(
        covariance_matrix(emb, id_col, vec_col).select(
            "i", "j", F.col("c").cast("decimal(15,9)").alias("cd")
        )
    )
    spark = emb.sparkSession
    v = spark.range(1, dim + 1).select(
        F.col("id").alias("i"),
        (F.lit(1.0) / F.sqrt(F.lit(float(dim))))
        .cast("decimal(15,9)")
        .alias("vd"),
    )
    for _ in range(n_iter):
        raw = (
            cov.join(v.withColumnRenamed("i", "j"), "j")
            .groupBy("i")
            .agg(
                F.sum(F.col("cd") * F.col("vd")).cast("double").alias("s")
            )
        )
        nrm = raw.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("s") * F.col("s"), 12).cast("decimal(26,12)")
                ).cast("double")
            ).alias("nrm")
        )
        v = raw.crossJoin(F.broadcast(nrm)).select(
            "i",
            F.round(F.col("s") / F.col("nrm"), 9)
            .cast("decimal(15,9)")
            .alias("vd"),
        )
    # Rayleigh quotient via one more exact mat-vec: λ = v·(C·v).
    r4 = (
        cov.join(v.withColumnRenamed("i", "j"), "j")
        .groupBy("i")
        .agg(
            F.round(F.sum(F.col("cd") * F.col("vd")).cast("double"), 9)
            .cast("decimal(15,9)")
            .alias("rd")
        )
    )
    lam = (
        r4.join(F.broadcast(v), "i")
        .agg(
            F.round(
                F.sum(F.col("vd") * F.col("rd")).cast("double"), 6
            ).alias("eigenvalue")
        )
    )
    return (
        v.crossJoin(F.broadcast(lam))
        .select(
            F.col("i").alias("dim"),
            F.col("vd").cast("double").alias("loading"),
            "eigenvalue",
        )
    )


def centered_dims(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, i, xc) long form with exact-decimal centering — the shared
    input of both PCA paths. xc = round(x − μ_i, 6) as DECIMAL(14,6)."""
    dims = _dims(emb, id_col, vec_col)
    mu = dims.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("decimal(32,12)")).cast("double")
            / F.count("x")
        ).alias("mu")
    )
    return dims.join(F.broadcast(mu), "i").select(
        "vec_id",
        "i",
        F.round(F.col("x") - F.col("mu"), 6).cast("decimal(14,6)").alias("xc"),
    )


def pca_top_component_datapass(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = PCA_ITERATIONS,
) -> DataFrame:
    """Top principal component WITHOUT materializing the covariance matrix —
    the high-dimensional scale path ``covariance_matrix`` documents.

    ``C·v = Σ_rows (x−μ)·((x−μ)·v) / n`` — so each power-iteration step is
    ONE pass over the centered data: a per-row exact-decimal dot product
    ``s = xc·v`` (d-key broadcast join, group by row id), then a d-key
    aggregation of ``s·xc``. Per-iteration cost is O(n·d) rows shuffled on
    d keys, versus the covariance path's one-off O(n·d²) pair expansion —
    at d=4096 that is the difference between 4096 and 16.7M generated
    rows per vector. The trade: 3 iterations = 3 data scans instead of
    one scan + model-sized iterations, the right trade precisely when d²
    dominates n·d (high d), which is when this path should be chosen.

    Same fixed-iteration, exact-decimal lock-step contract as
    ``pca_top_component`` (fully SQL-oracle-able); per-row dot products
    snap to 6dp — via EXACT decimal rounding, since the uniform start
    vector (1/8 per dim at d=64) puts first-iteration dot products on
    systematic 6dp ties — before re-entering products so decimal
    precision never overflows (s6: DECIMAL(16,6) × xc: DECIMAL(14,6) →
    exact (31,12) terms, sums capped at DECIMAL(38,12)).

    Returns ``(dim, loading, eigenvalue)`` like ``pca_top_component``;
    the two paths agree to ~1e-5 (different rounding routes), which the
    d=512 fixture test pins.
    """
    from .caching import tracked_persist

    spark = emb.sparkSession
    # persisted: every iteration and the Rayleigh quotient re-read it
    centered = tracked_persist(centered_dims(emb, id_col, vec_col))
    n = emb.count()  # scalar: row count is free metadata next to a scan
    v = spark.range(1, dim + 1).select(
        F.col("id").alias("i"),
        (F.lit(1.0) / F.sqrt(F.lit(float(dim))))
        .cast("decimal(15,9)")
        .alias("vd"),
    )

    def mat_vec(vec: DataFrame) -> DataFrame:
        """One exact C·v data pass: (i, s) with s = Σ_rows s_row·xc_i / n."""
        # the 6dp snap is EXACT decimal rounding (round() on the exact
        # sum, never a double round-trip): v0 = 1/8 puts first-iteration
        # dot products on systematic 6dp ties, where double-mediated
        # rounding diverges across engines but exact-decimal
        # half-away-from-zero agrees (verified on both engines)
        s_row = (
            centered.join(F.broadcast(vec), "i")
            .groupBy("vec_id")
            .agg(
                F.round(F.sum(F.col("xc") * F.col("vd")), 6)
                .cast("decimal(16,6)")
                .alias("s6")
            )
        )
        return (
            centered.join(s_row, "vec_id")
            .groupBy("i")
            .agg(
                (
                    F.sum(F.col("s6") * F.col("xc")).cast("double")
                    / F.lit(float(n))
                ).alias("s")
            )
        )

    for _ in range(n_iter):
        raw = mat_vec(v)
        nrm = raw.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("s") * F.col("s"), 12).cast("decimal(26,12)")
                ).cast("double")
            ).alias("nrm")
        )
        v = raw.crossJoin(F.broadcast(nrm)).select(
            "i",
            F.round(F.col("s") / F.col("nrm"), 9)
            .cast("decimal(15,9)")
            .alias("vd"),
        )
    r4 = mat_vec(v).select(
        "i", F.round(F.col("s"), 9).cast("decimal(15,9)").alias("rd")
    )
    lam = r4.join(F.broadcast(v), "i").agg(
        F.round(F.sum(F.col("vd") * F.col("rd")).cast("double"), 6).alias(
            "eigenvalue"
        )
    )
    return v.crossJoin(F.broadcast(lam)).select(
        F.col("i").alias("dim"),
        F.col("vd").cast("double").alias("loading"),
        "eigenvalue",
    )


def pca_topk_spectrum(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 3,
    n_iter: int = PCA_ITERATIONS,
) -> DataFrame:
    """Top-``k`` eigenvalue spectrum by Hotelling deflation (round-12
    VERDICT #6): representation-collapse diagnostics need the DECAY of
    the spectrum, not just the dominant direction — a healthy embedding
    space shows λ₂/λ₁, λ₃/λ₁ well above 0, a collapsed one puts
    everything in λ₁.

    Per component: the same 3-step power iteration as
    :func:`pca_top_component` (identical exact-decimal lock-step), then
    the matrix deflates ``C ← C − λ·v·vᵀ`` — λ snapped to DECIMAL(15,9),
    each outer-product term ``v_i·v_j`` an exact decimal product snapped
    to 9dp before the exact λ-multiply, the difference re-rounded to the
    matrix's DECIMAL(15,9) grid — so both engines carry bit-identical
    deflated matrices into the next component (the k-means/PageRank
    fixed-unroll contract, nested). The covariance is computed ONCE
    (data-sized); every deflation round is d²-row model-sized work, and
    each intermediate matrix/vector is eagerly local-checkpointed so
    lineage depth stays linear in k (see the in-body comment).

    Returns one row per component: ``(component, eigenvalue,
    ratio_to_top)`` with ``ratio_to_top = round(λ_t / λ_1, 6)`` over the
    6dp eigenvalues (identical operands both engines).
    """
    spark = emb.sparkSession
    # localCheckpoint (the kcenter_greedy precedent), NOT persist: each
    # deflated matrix's logical plan embeds the previous component's whole
    # power-iteration chain, so lineage grows EXPONENTIALLY in k — persist
    # leaves the logical plan intact and the analyzer chokes on it;
    # checkpointing the model-sized intermediates (4096-row matrix, 64-row
    # vector, 1-row lambda) truncates lineage at each stage
    C = covariance_matrix(emb, id_col, vec_col).select(
        "i", "j", F.col("c").cast("decimal(15,9)").alias("cd")
    ).localCheckpoint()
    spectra = []
    for t in range(1, k + 1):
        covb = F.broadcast(C)
        v = spark.range(1, dim + 1).select(
            F.col("id").alias("i"),
            (F.lit(1.0) / F.sqrt(F.lit(float(dim))))
            .cast("decimal(15,9)")
            .alias("vd"),
        )
        for _ in range(n_iter):
            raw = (
                covb.join(v.withColumnRenamed("i", "j"), "j")
                .groupBy("i")
                .agg(
                    F.sum(F.col("cd") * F.col("vd")).cast("double").alias("s")
                )
            )
            nrm = raw.agg(
                F.sqrt(
                    F.sum(
                        F.round(F.col("s") * F.col("s"), 12)
                        .cast("decimal(26,12)")
                    ).cast("double")
                ).alias("nrm")
            )
            v = raw.crossJoin(F.broadcast(nrm)).select(
                "i",
                F.round(F.col("s") / F.col("nrm"), 9)
                .cast("decimal(15,9)")
                .alias("vd"),
            )
        # referenced by r4, the Rayleigh join, and the two deflation sides
        v = v.localCheckpoint()
        r4 = (
            covb.join(v.withColumnRenamed("i", "j"), "j")
            .groupBy("i")
            .agg(
                F.round(F.sum(F.col("cd") * F.col("vd")).cast("double"), 9)
                .cast("decimal(15,9)")
                .alias("rd")
            )
        )
        lam = r4.join(F.broadcast(v), "i").agg(
            F.round(
                F.sum(F.col("vd") * F.col("rd")).cast("double"), 6
            ).alias("eigenvalue"),
            F.round(
                F.sum(F.col("vd") * F.col("rd")).cast("double"), 9
            )
            .cast("decimal(15,9)")
            .alias("lam9"),
        ).localCheckpoint()
        spectra.append(
            lam.select(
                F.lit(t).cast("int").alias("component"), "eigenvalue"
            )
        )
        if t < k:
            vi = v.select("i", F.col("vd").alias("_vi"))
            vj = v.select(F.col("i").alias("j"), F.col("vd").alias("_vj"))
            outer9 = F.round(F.col("_vi") * F.col("_vj"), 9).cast(
                "decimal(15,9)"
            )
            C = (
                C.join(F.broadcast(vi), "i")
                .join(F.broadcast(vj), "j")
                .crossJoin(F.broadcast(lam.select("lam9")))
                .select(
                    "i",
                    "j",
                    F.round(F.col("cd") - F.col("lam9") * outer9, 9)
                    .cast("decimal(15,9)")
                    .alias("cd"),
                )
                .localCheckpoint()
            )
    spec = spectra[0]
    for s in spectra[1:]:
        spec = spec.unionByName(s)
    top = spectra[0].select(F.col("eigenvalue").alias("_e1"))
    return (
        spec.crossJoin(F.broadcast(top))
        .select(
            "component",
            "eigenvalue",
            F.round(F.col("eigenvalue") / F.col("_e1"), 6).alias(
                "ratio_to_top"
            ),
        )
        .orderBy("component")
    )
