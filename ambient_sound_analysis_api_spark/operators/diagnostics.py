"""Distribution diagnostics for shuffle keys.

Before a 100 TB job shuffles on a key, the cheap question to answer is
"how skewed is it?" — one hot key turns a 1000-executor stage into a
1-executor stage. ``skew_report`` is the pre-flight: per-key counts, each
heavy key's share of all rows and its ratio to the median group size —
the two numbers that decide between a plain shuffle, AQE skew-join
splitting, or explicit salting.

Plan: one count aggregation on the key (map-side partials), a 1-row
global stats frame (total + median of the group sizes) broadcast back,
and a top-k by count. The count pass and the top-k are cheap at any
scale; the exact median is the honest cost center — ``percentile`` is a
holistic aggregate, so the stats pass ships one count per DISTINCT key
to a single reducer. Fine into the tens of millions of keys; beyond
that, pass ``approx=True`` to swap in ``percentile_approx`` (bounded
sketch state, executors × sketch wire cost) at the price of an
approximate median.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame, key_col: str, topk: int = 10, approx: bool = False
) -> DataFrame:
    """Top-``topk`` heaviest values of ``key_col`` with share-of-total and
    ratio-to-median-group-size. ``ratio_to_median`` ≫ 1 means salting or
    AQE skew handling is warranted before shuffling on this key.
    ``approx=True`` uses a percentile sketch for the median — use it when
    the key cardinality itself is huge (see module docstring)."""
    g = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n"))
    med = (
        F.percentile_approx(F.col("n"), 0.5)
        if approx
        else F.percentile(F.col("n"), 0.5)
    )
    t = g.agg(
        F.sum("n").cast("double").alias("total"),
        med.cast("double").alias("med"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("med"), 4).alias("ratio_to_median"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(topk)
    )


def drift_psi(
    events: DataFrame,
    split_a,
    split_b_end,
    value_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two time periods, per group.

    The standard production drift monitor (credit-scoring lineage, now the
    default ingest-distribution check for training pipelines): bin the
    metric into fixed-width bins over its GLOBAL range, compare the two
    periods' bin proportions, and sum (p−q)·ln(p/q). PSI < 0.1 is stable,
    0.1–0.25 drifting, > 0.25 actionable — per event type, this flags a
    source whose value distribution silently shifted between periods.

    Period A = [start, split), period B = [split, end) where ``split_a``
    = (start, split) and ``split_b_end`` is the end bound. Plan shape:
    the global min/max is a 1-row broadcast; binning is pure codegen on
    the scan; per-(group, bin) counts are one map-side-combined
    aggregation; the full group × bin grid comes from an ``explode`` of
    ``sequence`` (never a cartesian join) so empty bins participate with
    Laplace-smoothed proportions (c+1)/(n+bins) and PSI stays finite.
    Cross-engine determinism: counts are exact integers, every
    proportion is one double division, the ``ln`` is 6dp-rounded and the
    bin terms sum in DECIMAL.

    Returns ``(group, n_a, n_b, psi)``.
    """
    start, split = split_a
    end = split_b_end
    ev = events.filter(
        (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end))
    ).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("val"),
        (F.col(ts_col) < F.lit(split)).alias("in_a"),
    )
    rng = ev.agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "grp",
        "in_a",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))  # constant metric
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("val") - F.col("lo"))
                        * F.lit(float(n_bins))
                        / (F.col("hi") - F.col("lo"))
                    ),
                ),
            )
        ).alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("c_b"),
    )
    totals = counts.groupBy("grp").agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    grid = totals.select(
        "grp",
        "n_a",
        "n_b",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    full = grid.join(counts, ["grp", "bin"], "left").select(
        "grp",
        "n_a",
        "n_b",
        F.coalesce(F.col("c_a"), F.lit(0)).alias("c_a"),
        F.coalesce(F.col("c_b"), F.lit(0)).alias("c_b"),
    )
    p = (F.col("c_a") + 1).cast("double") / (F.col("n_a") + n_bins)
    q = (F.col("c_b") + 1).cast("double") / (F.col("n_b") + n_bins)
    term = F.round((p - q) * F.round(F.log(p / q), 6), 6).cast("decimal(20,6)")
    return full.groupBy("grp").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(term).cast("double").alias("psi"),
    )


def table_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass numeric column profiler: per column, row count, null
    count, exact distinct count, and min/max as doubles — the
    data-quality card a pipeline materializes before trusting a new drop.

    Plan: a SINGLE aggregation computes all per-column stats (one scan),
    then a 1-row explode of struct literals melts it to long form — no
    unpivot shuffle, no per-column scan. Honest cost note: N exact
    ``count(DISTINCT)`` aggregates make Catalyst EXPAND the scan N-way
    (N× the shuffle volume of a plain agg); that is the price of exact
    cardinalities — the at-scale alternative is
    ``approx_count_distinct`` (HLL++, one pass, ±2%), the same trade the
    sketch queries (``agg_approx_sketches``) already demonstrate.

    Returns ``(column_name, n_rows, n_null, n_distinct, min_v, max_v)``.
    """
    aggs = [F.count("*").alias("n_rows")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nn_{c}").alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_v"),
                F.col(f"mx_{c}").alias("max_v"),
            )
            for c in columns
        ]
    )
    return one.select(
        F.explode(structs).alias("p"), F.col("n_rows")
    ).select(
        "p.column_name",
        "n_rows",
        "p.n_null",
        "p.n_distinct",
        "p.min_v",
        "p.max_v",
    )


def cell_balance(assignments: DataFrame, cell_col: str = "cluster") -> DataFrame:
    """Partition-balance audit of an index cell assignment (IVF cells,
    LSH buckets, shard keys): the serving-side twin of ``skew_report``.

    An IVF serve fans queries into cells; one hot cell means one hot
    task per probe at cluster scale, so the build-time pre-flight is
    this single summary row: cell count, the hottest cell's size, its
    ratio to the mean NON-EMPTY cell, and its share of all vectors.

    Plan: one group-by on the cell id (output is nlist-sized) + one
    global fold to a single row.  Ratios are single IEEE divisions of
    exact integers, 6dp-rounded.
    """
    sizes = assignments.groupBy(cell_col).agg(F.count("*").alias("_n"))
    return sizes.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum("_n").cast("bigint").alias("n_vecs"),
        F.max("_n").cast("bigint").alias("max_cell"),
        F.min("_n").cast("bigint").alias("min_cell"),
        F.round(
            F.max("_n") * F.count("*") / F.sum("_n"), 6
        ).alias("max_over_mean"),
        F.round(F.max("_n") / F.sum("_n"), 6).alias("top_share"),
    )
