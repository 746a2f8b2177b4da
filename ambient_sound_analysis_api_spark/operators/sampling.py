"""Deterministic sampling / splitting for training-data pipelines.

The reference has no sampling surface; these are part of the engine's
extension charter (SURVEY.md §7.7): every large-scale corpus pipeline needs
a *reproducible* train/valid/test split and *reproducible* stratified
downsampling, where membership is a pure function of a stable key — never
``rand()``, which is neither repeatable across runs nor stable under
repartitioning.

Everything here is a built-in Catalyst expression (md5 + substring + conv),
so it rides the scan: no shuffle, no Python, no driver state. At 100 TB the
split is a WHERE clause the optimizer can place directly above the Parquet
reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of hash buckets the key space is folded into (12 bits of the md5).
N_BUCKETS = 4096


def hash_bucket(key: Column, offset: int = 1) -> Column:
    """Stable bucket in [0, 4096) from 3 hex chars of the md5 of the
    (stringified) key, starting at 1-based ``offset``.

    md5 is standardized, so the same key lands in the same bucket in any
    engine — the property that makes splits auditable with plain SQL.
    Distinct offsets give (for md5's purposes) independent buckets, so a
    sampling decision and a split decision on the same key don't correlate.
    """
    return F.conv(F.substring(F.md5(key.cast("string")), offset, 3), 16, 10).cast("int")


def hash_split(
    df: DataFrame,
    key: Column,
    *,
    train: float = 0.8,
    valid: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Label each row train/valid/test by deterministic key-hash bucket.

    ``train``/``valid`` are fractions of the 4096-bucket space (test gets
    the remainder). Fractions are quantized to whole buckets so the SQL
    predicate is integer-exact.
    """
    b = hash_bucket(key)
    train_hi = int(train * N_BUCKETS)
    valid_hi = train_hi + int(valid * N_BUCKETS)
    label = (
        F.when(b < F.lit(train_hi), "train")
        .when(b < F.lit(valid_hi), "valid")
        .otherwise("test")
    )
    return df.withColumn(split_col, label)


def mixture_sample(
    df: DataFrame,
    key: Column,
    source_col: str,
    weights: dict[str, float],
    budget: int,
    max_sources: int = 10_000,
) -> DataFrame:
    """Downsample to a target *source mixture* — the dataset-mixing step of
    a training pipeline (e.g. 50% web, 20% books, …).

    ``weights`` are the desired mixture proportions (caller-normalized);
    ``budget`` is the total row target. Per source the keep fraction is
    ``min(1, budget·w / n)`` — a source with fewer rows than its target
    keeps everything (the mixture is then approximate, never oversampled:
    deterministic sampling cannot replicate rows). Sources absent from
    ``weights`` are dropped.

    Observed per-source counts come from ONE aggregate job collecting one
    row per source (bounded by the source vocabulary, not the data).
    Membership is then the same pure md5-bucket predicate as
    :func:`stratified_sample` — repeatable across runs, engines, and
    partitionings, and auditable with plain SQL.

    ``max_sources`` guards the driver-side collect: a mis-keyed call (e.g.
    passing a document-id column as ``source_col``) would otherwise pull a
    row per distinct value onto the driver. The fetch is capped at
    ``max_sources + 1`` rows and overflow raises instead of OOMing.
    """
    head = df.groupBy(source_col).count().limit(max_sources + 1).collect()
    if len(head) > max_sources:
        raise ValueError(
            f"mixture_sample: {source_col!r} has more than {max_sources} "
            "distinct values — not a source-vocabulary column (raise "
            "max_sources only if this cardinality is intended)"
        )
    counts = {r[0]: r[1] for r in head}
    fractions = {}
    for s, w in weights.items():
        n = counts.get(s, 0)
        if n > 0:
            fractions[s] = min(1.0, (budget * w) / n)
    return stratified_sample(df, key, fractions, source_col)


def stratified_sample(
    df: DataFrame,
    key: Column,
    fractions: dict[str, float],
    stratum_col: str,
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its key bucket
    falls below the stratum's quantized fraction.

    Unlike ``DataFrame.sampleBy`` this is repeatable across runs, engines,
    and partitionings, and composes with :func:`hash_split`: the sample
    reads md5 chars 4-6 while the split reads chars 1-3, so sample-then-
    split keeps strata proportions inside each split.
    """
    b = hash_bucket(key, offset=4)
    cut = F.create_map(
        *[
            x
            for s, frac in fractions.items()
            for x in (F.lit(s), F.lit(int(frac * N_BUCKETS)))
        ]
    )
    return df.filter(b < F.coalesce(cut[F.col(stratum_col)], F.lit(0)))


def source_cap(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap the number of rows kept per ``group_col`` at ``cap``,
    deterministically — the per-domain/per-source cap every crawl-derived
    corpus applies so one giant domain can't dominate the mixture.

    Which rows survive is decided by md5-rank within the group (stable
    across runs, engines, and partitionings — same contract as
    ``hash_split``), with the id as the tie-break. One window shuffle on
    the group key; at 100 TB the rank never materializes more than the
    group's rows on one executor because ``row_number`` streams the sorted
    partition.

    Returns the surviving rows with the rank column dropped.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    n: int,
    key: Column,
    offset: int = 8,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis–Spirakis A-RES scheme with the random draw replaced by a
    stable md5-uniform (same no-``rand()`` contract as every sampler
    here): each row scores ``u^(1/w)``, equivalently ``ln(u)/w`` (used
    directly — one libm call, monotone-identical ordering), and the top-n
    scores win. Higher weight pulls the score toward 0, so heavy rows are
    proportionally more likely to be picked, yet the draw replays
    identically across runs, engines, and partitionings — an auditable
    "random" curation sample. Top-n is a ``TakeOrderedAndProject``; no
    global sort materializes.

    The selection key is exposed as a ``sample_score`` column (callers may
    drop it); weights must be strictly positive — a non-positive weight
    raises at evaluation time rather than silently inverting the draw.
    """
    b = hash_bucket(key, offset=offset)
    u = (b.cast("double") + F.lit(0.5)) / F.lit(float(N_BUCKETS))
    # w <= 0 has no A-RES meaning (negative w would INVERT the draw and
    # outrank every valid row; w == 0 silently never samples) — fail at
    # evaluation time, row-level, with no extra job.
    score = F.when(weight > 0, F.log(u) / weight).otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_sample: non-positive weight "), weight.cast("string")
            )
        )
    )
    return (
        df.withColumn("sample_score", score)
        .orderBy(F.col("sample_score").desc(), key)
        .limit(n)
    )


def epoch_manifest(
    df: DataFrame,
    key: Column,
    n_epochs: int = 3,
    frac: float = 0.5,
    base_offset: int = 10,
) -> DataFrame:
    """Per-epoch training manifests: each epoch draws an independent
    deterministic ``frac`` of the rows (distinct md5 windows per epoch —
    offsets ``base_offset + 3e`` — so epoch draws don't correlate), the
    standard multi-epoch subsampling schedule that lets a run see
    different data each epoch while staying fully replayable: the
    manifest is a pure function of the keys, auditable in plain SQL.

    One projection + a higher-order ``filter`` over the epoch array + an
    explode — no shuffle; rides the scan at any scale. The fraction
    compares 3 hex chars against a hex-string cut (lexicographic compare
    IS the numeric compare for fixed-width lowercase hex), the same trick
    as ``hash_split``. Returns the input row per surviving (epoch, row).
    """
    if not 0 < frac <= 1:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    cut = format(int(frac * N_BUCKETS), "03x")
    epochs = ", ".join(str(e) for e in range(n_epochs))
    kept = F.expr(
        f"filter(array({epochs}), e ->"
        f" substring(md5(CAST(_ek AS STRING)), {base_offset} + 3 * e, 3)"
        f" < '{cut}')"
    )
    return (
        df.withColumn("_ek", key)
        .withColumn("epoch", F.explode(kept))
        .drop("_ek")
    )


def token_budget_select(
    docs: DataFrame,
    quality: Column,
    n_tokens: Column,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Quality-greedy corpus selection under a token budget, computed
    over the score VOCABULARY instead of a global document sort.

    The curation move "keep the best documents until the token budget is
    spent" is a greedy knapsack whose textbook implementation — sort all
    docs by quality, running-sum the tokens, cut — needs a global sort
    of the corpus.  At 100 TB that sort is the job.  This operator
    quantizes quality to 6 decimals and aggregates tokens per DISTINCT
    score first (map-side combined), so the only ordered pass is a
    cumulative window over at most 10^6+1 per-unit-interval DECIMAL(16,6)
    values; the
    cutoff score q_cut is then the smallest score whose
    descending-cumulative token mass still fits the budget, and
    selection is a broadcast semi-predicate ``q >= q_cut`` the optimizer
    pushes onto the scan.

    Granularity contract: selection is by whole score class — all docs
    at q_cut are kept, so the selected mass is the largest
    score-class-aligned prefix ≤ budget.  (Splitting the boundary class
    doc-by-doc would reintroduce the data-sized sort for ≤ one class of
    slack.)

    Returns per-source rollup of the selected set:
    (source, n_docs, n_tokens, mean_q, q_cut), ordered by source.
    """
    if not 0 < budget_frac <= 1:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    from pyspark.sql import Window

    from .caching import tracked_persist

    # persisted: d is consumed by the histogram (twice — cumulative and
    # total branches) AND the final selection, and the quality column is
    # typically a multi-regexp chain (quality_score) — without the cache
    # the regex scan ran 3x per call. hist is vocabulary-sized but also
    # dual-consumed (cum + total), so it caches too.
    d = tracked_persist(
        docs.select(
            "source",
            # (16,6) covers |q| < 10^10: a plain (10,6) silently NULLs
            # scores >= 10^4 under non-ANSI Spark (uncalibrated raw scores)
            F.round(quality, 6).cast("decimal(16,6)").alias("_q"),
            n_tokens.cast("bigint").alias("_nt"),
        )
    )
    hist = tracked_persist(
        d.groupBy("_q").agg(F.sum("_nt").alias("_toks"))
    )
    w = (
        Window.orderBy(F.col("_q").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_toks").over(w))
    total = hist.agg(F.sum("_toks").alias("_total"))
    cut = (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("_cum") <= F.col("_total") * F.lit(float(budget_frac)))
        .agg(F.min("_q").alias("q_cut"))
    )
    return (
        d.crossJoin(F.broadcast(cut))
        .filter(F.col("_q") >= F.col("q_cut"))
        .groupBy("source", "q_cut")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            # decimal sum over the DECIMAL(10,6) scores: exact, so the
            # mean is engine/partition-order independent
            F.round(
                F.sum("_q").cast("double") / F.count("_q"), 6
            ).alias("mean_q"),
        )
        .select("source", "n_docs", "n_tokens", "mean_q",
                F.col("q_cut").cast("double").alias("q_cut"))
        .orderBy("source")
    )
