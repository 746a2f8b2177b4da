"""Structured-Streaming variants of the batch window aggregations.

The reference is batch-only over archived data (SURVEY.md §2.10), but its
tumbling-window mean (A3) maps 1:1 onto a streaming
``groupBy(window(ts, ...))`` with a watermark for late hydrophone packets.
Provided as the live-feed extension point; semantics match
``operators.aggregations.resample_mean`` bucket-for-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import is_finite


def streaming_resample_mean(
    stream: DataFrame,
    interval_s: int,
    watermark: str = "10 minutes",
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming tumbling-window mean with late-data watermark.

    Uses ``F.window`` (required for streaming state management rather than
    the batch epoch-arithmetic bucket); ``window.start`` equals the batch
    ``bucket_ts`` for the same interval, so downstream consumers see the
    same keys either way.
    """
    agged = (
        stream.withWatermark(ts_col, watermark)
        .filter(is_finite(F.col(value_col)))
        .groupBy(
            *(keys or []),
            F.window(F.col(ts_col), f"{interval_s} seconds").alias("w"),
        )
        .agg(F.avg(value_col).alias("mean_value"))
    )
    return agged.select(
        *(keys or []),
        F.col("w.start").alias("bucket_ts"),
        "mean_value",
    )


def streaming_sliding_mean(
    stream: DataFrame,
    interval_s: int,
    slide_s: int,
    watermark: str = "10 minutes",
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sliding-window mean: every event contributes to
    ``interval_s / slide_s`` overlapping windows (``F.window`` with a slide
    duration — the hopping-window form the tumbling variant generalizes
    to). State per key×window is one partial aggregate; the watermark
    bounds how long closed windows linger. Window starts are the
    ``slide_s`` grid, so downstream consumers join them like any bucket
    key."""
    agged = (
        stream.withWatermark(ts_col, watermark)
        .filter(is_finite(F.col(value_col)))
        .groupBy(
            *(keys or []),
            F.window(
                F.col(ts_col), f"{interval_s} seconds", f"{slide_s} seconds"
            ).alias("w"),
        )
        .agg(F.avg(value_col).alias("mean_value"))
    )
    return agged.select(
        *(keys or []),
        F.col("w.start").alias("bucket_ts"),
        "mean_value",
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication: keep the FIRST event per key, with
    state expired by the watermark.

    ``dropDuplicatesWithinWatermark`` is the streaming analog of the batch
    hash-groupBy exact dedup (``operators/dedup.py``): per-key state lives
    only within the watermark horizon, so memory is bounded by the key
    arrival rate × horizon instead of the stream's lifetime — the property
    that makes exact dedup feasible on an unbounded 100 TB/day feed.
    Which non-key columns survive depends on arrival order; emit only the
    key columns when downstream needs run-independent values.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


_RUN_COUNTER = 0


def run_available_now(
    spark,
    batch_df: DataFrame,
    transform,
    *,
    prefix: str = "stream_run",
    output_mode: str = "complete",
):
    """Execute ``transform(stream)`` as a REAL Structured-Streaming query
    over ``batch_df``'s rows and return the final result as a batch
    DataFrame.

    The batch rows are staged to a temp Parquet directory, read back with
    ``readStream`` (file source), run with ``trigger(availableNow=True)``
    (process-everything-then-stop — the bounded-backfill trigger) into a
    memory sink (``complete`` mode for aggregations, ``append`` for
    row-emitting operators like streaming dedup), and the sink's table is
    returned. This is
    how the engine proves streaming/batch parity on real streaming
    machinery rather than on a batch re-interpretation of the same plan;
    in production the same ``transform`` attaches to a live file/Kafka
    source unchanged.
    """
    import tempfile

    global _RUN_COUNTER
    _RUN_COUNTER += 1
    name = f"{prefix}_{_RUN_COUNTER}"
    src_dir = tempfile.mkdtemp(prefix=f"{name}_src_")
    batch_df.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
