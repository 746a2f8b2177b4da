"""Distribution diagnostics for shuffle keys.

Before a 100 TB job shuffles on a key, the cheap question to answer is
"how skewed is it?" — one hot key turns a 1000-executor stage into a
1-executor stage. ``skew_report`` is the pre-flight: per-key counts, each
heavy key's share of all rows and its ratio to the median group size —
the two numbers that decide between a plain shuffle, AQE skew-join
splitting, or explicit salting.

Plan: one count aggregation on the key (map-side partials), a 1-row
global stats frame (total + exact interpolated median of the group
sizes) broadcast back, and a top-k by count — the report is k rows, the
wire cost is executors × 1 regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_col: str, topk: int = 10) -> DataFrame:
    """Top-``topk`` heaviest values of ``key_col`` with share-of-total and
    ratio-to-median-group-size. ``ratio_to_median`` ≫ 1 means salting or
    AQE skew handling is warranted before shuffling on this key."""
    g = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n"))
    t = g.agg(
        F.sum("n").cast("double").alias("total"),
        F.percentile(F.col("n"), 0.5).alias("med"),
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
