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
