"""Classifier / filter evaluation metrics as distributed aggregations.

A training-data pipeline that fits or tunes a quality filter (see
``operators.mlfit``, ``text_quality_deciles``) needs the standard
evaluation readouts — AUC, calibration, threshold-sweep confusion — and
at corpus scale each must be a *bounded* computation: no global sort of
the data, no per-row Python, no O(n²) pair enumeration.

The recipes here all follow the same shape:

* **confusion sweep** — ONE fused aggregation pass computes every
  (threshold × cell) count as a conditional sum; the threshold grid is a
  compile-time constant so the pass is map-side combinable and the
  output is grid-sized, independent of data size.
* **AUC** — the exact Mann-Whitney statistic with midrank tie handling,
  computed over the *score vocabulary*: scores are quantized to 6
  decimals, grouped (map-side combined), and the rank cumsum runs as a
  window over at most 10^6+1 distinct values — data-size-independent,
  unlike the textbook sort-all-rows formulation.
* **calibration bins** — a fixed-width bin group-by plus a 1-row total
  broadcast; emits per-bin reliability gaps and the ECE terms.

No reference analog (extension surface): the reference API
(orcasound/ambient-sound-analysis-api) exposes no model-evaluation
endpoints; these operators extend the engine for LLM-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["confusion_sweep", "binary_auc", "calibration_bins"]


def confusion_sweep(
    df: DataFrame,
    score: Column,
    label: Column,
    thresholds: list[float] | None = None,
) -> DataFrame:
    """Precision/recall/F1 over a threshold grid in ONE aggregation pass.

    For each threshold t the four confusion cells are conditional sums
    (``score >= t`` × label), so the whole sweep is a single map-side
    combinable aggregate producing one row, then a ``stack`` unpivot to
    grid-sized output — the plan never shuffles more than the partial
    aggregates regardless of corpus size or grid length.

    Returns (threshold, tp, fp, fn, tn, prec, rec, f1) with the ratio
    columns 6dp-rounded and NULL where the denominator is zero (the
    short names dodge the PRECISION keyword across engines).
    """
    if thresholds is None:
        thresholds = [round(0.1 * i, 1) for i in range(1, 10)]
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    # NULL labels count as negatives (coalesce to 0) so the four cells
    # always partition the input (tp+fp+fn+tn == n) and Spark agrees
    # with a CASE-WHEN oracle that maps non-matching/NULL to 0
    d = df.select(
        score.alias("_s"),
        F.coalesce(label.cast("int"), F.lit(0)).alias("_y"),
    )
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("_s") >= F.lit(float(t))
        pos = F.col("_y") == 1
        aggs += [
            F.sum(F.when(pred & pos, 1).otherwise(0)).alias(f"tp_{i}"),
            F.sum(F.when(pred & ~pos, 1).otherwise(0)).alias(f"fp_{i}"),
            F.sum(F.when(~pred & pos, 1).otherwise(0)).alias(f"fn_{i}"),
            F.sum(F.when(~pred & ~pos, 1).otherwise(0)).alias(f"tn_{i}"),
        ]
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({float(t)} AS DOUBLE), tp_{i}, fp_{i}, fn_{i}, tn_{i}"
        for i, t in enumerate(thresholds)
    )
    cells = one.select(
        F.expr(
            f"stack({len(thresholds)}, {stack_args}) "
            "AS (threshold, tp, fp, fn, tn)"
        )
    )
    prec = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    rec = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    return (
        cells.withColumn("prec", F.round(prec, 6))
        .withColumn("rec", F.round(rec, 6))
        .withColumn(
            "f1",
            F.round(
                2 * F.col("tp")
                / F.nullif(
                    2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)
                ),
                6,
            ),
        )
        .orderBy("threshold")
    )


def binary_auc(df: DataFrame, score: Column, label: Column) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney with midrank ties) over the score
    vocabulary.

    Scores are quantized to 6 decimals and grouped first (map-side
    combine collapses each partition to its score histogram), so the
    only ordered pass is a cumulative window over at most 10^6+1
    distinct DECIMAL(10,6) values — a *bounded*, data-size-independent
    single-partition window, unlike the classic rank-all-rows
    formulation whose global sort grows with the corpus.  Ordering is on
    the DECIMAL key (never raw doubles across engines).

    With n_neg_below(s) = negatives strictly below score s, the midrank
    statistic is  AUC = Σ_s n_pos(s)·(n_neg_below(s) + n_neg(s)/2) / (P·N).

    Returns one row: (auc, gini, n_pos, n_neg, n_scores).
    """
    from pyspark.sql import Window

    # decimal(16,6) covers |score| < 10^10 — a plain (10,6) silently
    # NULLs scores >= 10^4 under non-ANSI Spark, collapsing them into
    # one NULL group while DuckDB raises; NULL labels count as negative
    hist = (
        df.select(
            F.round(score, 6).cast("decimal(16,6)").alias("s"),
            F.coalesce(label.cast("int"), F.lit(0)).alias("y"),
        )
        .groupBy("s")
        .agg(
            F.sum("y").alias("n_pos"),
            F.sum(F.lit(1) - F.col("y")).alias("n_neg"),
        )
    )
    w = (
        Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = hist.withColumn(
        "neg_below", F.sum("n_neg").over(w) - F.col("n_neg")
    )
    # numerator scaled by 2 so every reduction term is an exact integer
    # (order-independent across engines): 2·AUC·P·N = Σ n_pos·(2·neg_below
    # + n_neg); the single double division happens once at the end
    num = F.sum(
        F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg"))
    )
    return ranked.agg(
        F.round(
            num.cast("double")
            / (F.lit(2.0) * F.sum("n_pos") * F.sum("n_neg")),
            6,
        ).alias("auc"),
        F.round(
            num.cast("double")
            / (F.sum("n_pos").cast("double") * F.sum("n_neg"))
            - F.lit(1.0),
            6,
        ).alias("gini"),
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        F.count("*").cast("bigint").alias("n_scores"),
    )


def calibration_bins(
    df: DataFrame,
    score: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram bins + per-bin ECE terms.

    Fixed-width bins over [0,1]: one group-by on the bin id (map-side
    combined, ≤ ``n_bins`` output rows) plus a single 1-row total-count
    broadcast for the bin weights.  ``ece_term`` is the bin's
    contribution to expected calibration error — Σ ece_term over the
    output IS the ECE, kept per-bin so the readout shows *where* the
    filter is miscalibrated, not just how much.

    Returns (bin, n, mean_score, frac_pos, gap, weight, ece_term)
    ordered by bin, ratios 6dp-rounded.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    d = df.select(
        score.alias("_s"),
        F.coalesce(label.cast("int"), F.lit(0)).alias("_y"),
    )
    # clamp BOTH ends: scores outside [0,1] (an uncalibrated raw score)
    # land in the edge bins instead of minting negative/overflow bin ids
    binned = d.select(
        F.greatest(
            F.lit(0),
            F.least(F.floor(F.col("_s") * n_bins), F.lit(n_bins - 1)),
        ).cast("int").alias("bin"),
        "_s",
        "_y",
    )
    # decimal-summed means (associative → engine/partition-order
    # independent); 10dp snap of the score before the sum
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("_s").cast("decimal(28,10)")).cast("double")
            / F.count("_s")
        ).alias("_ms"),
        (F.sum("_y").cast("double") / F.count("_y")).alias("_fp"),
    )
    total = d.agg(F.count("*").alias("_total"))
    gap = F.abs(F.col("_fp") - F.col("_ms"))
    return (
        per_bin.crossJoin(F.broadcast(total))
        .select(
            "bin",
            F.col("n").cast("bigint").alias("n"),
            F.round("_ms", 6).alias("mean_score"),
            F.round("_fp", 6).alias("frac_pos"),
            F.round(gap, 6).alias("gap"),
            F.round(F.col("n") / F.col("_total"), 6).alias("weight"),
            F.round(gap * F.col("n") / F.col("_total"), 6).alias("ece_term"),
        )
        .orderBy("bin")
    )
