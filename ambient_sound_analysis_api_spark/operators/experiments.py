"""Experiment-analysis operators: deterministic A/B assignment + CUPED.

CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.,
WSDM'13) is the industry-standard variance-reduction estimator for A/B
tests: adjust each unit's experiment-period metric Y by its
pre-experiment covariate X, ``Y_adj = Y − θ·(X − x̄)`` with
``θ = cov(X, Y)/var(X)``, shrinking metric variance by the squared
X-Y correlation without biasing the treatment effect.

Everything is two scan-shaped aggregations:

- per-user period sums (one groupBy over the window-filtered scan, both
  periods split by a codegen CASE — the input is read once);
- one 1-row global-moments frame (n, Σx, Σy, Σxy, Σx²) broadcast back,
  plus a variant-level rollup.

Determinism across engines (the registry oracle contract): raw metric
values sum in DECIMAL(12,2) (exact), per-user means are single double
divisions rounded to 6dp and re-cast to DECIMAL(12,6) so all cross
moments (Σxy, Σx²) accumulate EXACTLY regardless of partition order;
θ and the adjusted means are then a handful of IEEE ops on those exact
totals. Variant assignment is the md5-bucket predicate
(``operators.sampling.hash_bucket`` semantics): a pure function of the
unit key — stable across runs, engines, and repartitioning, unlike
``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_adjusted_means(
    events: DataFrame,
    start,
    split,
    end,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-variant raw and CUPED-adjusted metric means.

    Pre-period X = user's mean value in [start, split); experiment
    period Y = user's mean in [split, end). Units active in only one
    period are excluded (CUPED is defined on units with a covariate).

    Returns one row per variant:
    ``(variant, n_users, mean_y, adj_mean_y, theta)``.
    """
    ev = events.filter(
        (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end))
    ).select(
        F.col(user_col).alias("uid"),
        F.col(value_col).cast("decimal(12,2)").alias("val"),
        (F.col(ts_col) < F.lit(split)).alias("pre"),
    )
    per_user = (
        ev.groupBy("uid")
        .agg(
            F.sum(F.when(F.col("pre"), F.col("val"))).alias("sx"),
            F.count(F.when(F.col("pre"), 1)).alias("nx"),
            F.sum(F.when(~F.col("pre"), F.col("val"))).alias("sy"),
            F.count(F.when(~F.col("pre"), 1)).alias("ny"),
        )
        .filter((F.col("nx") > 0) & (F.col("ny") > 0))
    )
    x = F.round(F.col("sx").cast("double") / F.col("nx"), 6).cast("decimal(12,6)")
    y = F.round(F.col("sy").cast("double") / F.col("ny"), 6).cast("decimal(12,6)")
    units = per_user.select(
        "uid",
        x.alias("x"),
        y.alias("y"),
        F.when(
            F.substring(F.md5(F.col("uid").cast("string")), 1, 3) < "800", "A"
        )
        .otherwise("B")
        .alias("variant"),
    )
    glob = units.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )  # 1 row
    per_variant = units.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("svx"),
        F.sum("y").alias("svy"),
    )
    n = F.col("n").cast("double")
    mean_x_g = F.col("sx").cast("double") / n
    mean_y_g = F.col("sy").cast("double") / n
    cov = F.col("sxy").cast("double") / n - mean_x_g * mean_y_g
    var = F.col("sxx").cast("double") / n - mean_x_g * mean_x_g
    theta = F.when(var != 0, cov / var)
    mean_x_v = F.col("svx").cast("double") / F.col("n_users")
    mean_y_v = F.col("svy").cast("double") / F.col("n_users")
    return (
        per_variant.crossJoin(F.broadcast(glob))
        .select(
            "variant",
            "n_users",
            F.round(mean_y_v, 6).alias("mean_y"),
            F.round(mean_y_v - theta * (mean_x_v - mean_x_g), 6).alias(
                "adj_mean_y"
            ),
            F.round(theta, 6).alias("theta"),
        )
    )
