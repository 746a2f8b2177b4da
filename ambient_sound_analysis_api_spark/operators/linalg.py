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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PCA_ITERATIONS = 3


def _normalize(raw: DataFrame) -> DataFrame:
    """``v ← round(s / ‖s‖, 9)`` as ONE single-subtree projection: the
    norm is a global-window decimal sum over the d-row ``raw`` instead of
    a separate agg + crossJoin — ``raw`` appears once in the plan, so the
    iteration chain stays LINEAR (the agg+crossJoin shape referenced raw
    twice, doubling the upstream subtree per iteration: 2^n_iter
    evaluations without a barrier). Operand-for-operand the arithmetic is
    unchanged: per-row round(s², 12) → DECIMAL(26,12) exact sum → double
    → sqrt → divide → round 9 → DECIMAL(15,9). The window is global over
    a d-row input — model-sized by construction."""
    nrm = F.sqrt(
        F.sum(
            F.round(F.col("s") * F.col("s"), 12).cast("decimal(26,12)")
        )
        .over(Window.partitionBy())
        .cast("double")
    )
    return raw.select(
        "i",
        F.round(F.col("s") / nrm, 9).cast("decimal(15,9)").alias("vd"),
    )


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

    Execution (round-13 VERDICT #1): the old path exploded every vector
    into d² centered dimension PAIRS through a shuffle join — 4,096
    generated rows per 64-dim vector, the repo's worst committed scale
    number (208 s@30×). This path keeps the IDENTICAL arithmetic but
    moves the outer product into one Arrow-batched ``mapInPandas`` pass:

    - dimension means stay the exact-decimal d-key aggregation (the only
      surviving explode is the O(n·d) mean pass, data-scan class);
    - centering happens JVM-side into an array column (``zip_with`` +
      the same ``F.round(x − μ, 6)`` expression — bit-identical xc);
    - each partition recovers the exact 6dp integers (``rint(xc·1e6)``
      is exact: a 6dp decimal's double is within 1e-4 ulp of k/1e6),
      runs overflow-safe chunked int64 Gram matmuls, and accumulates in
      arbitrary-precision Python ints — EXACT, order-independent;
    - partials leave each partition as d² DECIMAL(38,12) rows (scaled by
      1e-12, the exact product scale of two 6dp decimals), and the final
      decimal sum + ``round(s/n, 9)`` is unchanged.

    Every value is therefore bit-identical to the join path (the
    unrolled-CTE DuckDB oracle pins it), while the shuffle stays d² rows
    PER PARTITION and the per-row cost drops from d² generated rows to a
    vectorized matmul.
    """
    import decimal

    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    dims = _dims(emb, id_col, vec_col)
    mu_rows = dims.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("decimal(32,12)")).cast("double")
            / F.count("x")
        ).alias("mu")
    ).collect()
    if not mu_rows:
        return spark.createDataFrame([], "i int, j int, c double")
    d = max(r["i"] for r in mu_rows)
    mu = [0.0] * d
    for r in mu_rows:
        mu[r["i"] - 1] = float(r["mu"])

    xc = emb.select(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.lit(mu),
            lambda x, m: F.round(x - m, 6),
        ).alias("xc")
    )

    def _partials(batches):
        acc = None  # object dtype: arbitrary-precision, order-free
        for pdf in batches:
            if len(pdf) == 0:
                continue
            K = np.rint(
                np.stack(pdf["xc"].to_numpy()) * 1e6
            ).astype(np.int64)
            mx = int(np.abs(K).max()) if K.size else 0
            # chunk bound: rows_per_chunk · mx² < 2^62 keeps every int64
            # Gram entry exact no matter the data magnitude
            step = max(1, (1 << 62) // (mx * mx + 1))
            for lo in range(0, K.shape[0], step):
                part = K[lo : lo + step]
                g = (part.T @ part).astype(object)
                acc = g if acc is None else acc + g
        if acc is not None:
            dd = acc.shape[0]
            ii, jj = np.meshgrid(
                np.arange(1, dd + 1), np.arange(1, dd + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "s": [
                        decimal.Decimal(int(v)).scaleb(-12)
                        for v in acc.ravel()
                    ],
                }
            )

    n = emb.select(F.count("*").alias("n"))  # 1 row
    partials = xc.mapInPandas(_partials, "i int, j int, s decimal(38,12)")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
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
    # checkpoint the (model-sized) covariance and each iteration's raw
    # mat-vec: `raw` feeds BOTH nrm and v, so without a barrier the
    # upstream subtree duplicates 2× per iteration — 2^n_iter data
    # passes. A 64-row localCheckpoint per step keeps it linear.
    cov = F.broadcast(
        covariance_matrix(emb, id_col, vec_col).select(
            "i", "j", F.col("c").cast("decimal(15,9)").alias("cd")
        ).coalesce(1).localCheckpoint()
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
        v = _normalize(raw)
    # final v is referenced by r4, the Rayleigh join, and the output —
    # one model-sized barrier instead of 3 reruns of the iteration chain
    v = v.coalesce(1).localCheckpoint()
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
        # _normalize keeps each DATA-SIZED mat_vec in the plan exactly
        # once — the agg+crossJoin shape would re-evaluate it 2× per
        # iteration (2^n_iter cached-data passes by the end)
        v = _normalize(mat_vec(v))
    # final v feeds the r4 data pass, the Rayleigh join, and the output:
    # one model-sized barrier runs the 3 cached-data passes exactly once
    v = v.coalesce(1).localCheckpoint()
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
    # model-sized from here on: 1 partition so the k×n_iter chain of
    # tiny joins/aggs schedules 1 task per stage, not 32 empty ones
    C = covariance_matrix(emb, id_col, vec_col).select(
        "i", "j", F.col("c").cast("decimal(15,9)").alias("cd")
    ).coalesce(1).localCheckpoint()
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
            v = _normalize(raw)  # single-subtree: chain stays linear
        # referenced by r4, the Rayleigh join, and the two deflation sides
        v = v.coalesce(1).localCheckpoint()
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
                .coalesce(1)
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
