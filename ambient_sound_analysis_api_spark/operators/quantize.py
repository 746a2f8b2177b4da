"""Embedding quantization: per-dimension symmetric int8 with an error
report.

Vector stores and ANN serving layers quantize float32 embeddings to int8
(4× smaller, SIMD-friendly distance kernels); the pipeline-side job is
computing the per-dimension scales and auditing the reconstruction error
before committing a corpus to the quantized representation.

Plan shape: one ``posexplode`` of the vectors, a per-dimension max-|x|
aggregation (model-sized output: dims rows), broadcast of the scales back
onto the exploded stream, then a second per-dimension aggregation for the
error stats. Two shuffles keyed on the (tiny) dimension id; nothing
driver-side but the dims-row report. At 100 TB both aggregations are
partial-aggregate friendly (max/sum/count), so the wire traffic is
executors × dims, independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import decimal_mean


def quantize_int8_report(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension symmetric int8 quantization audit.

    For each dimension: ``scale = max(|x|)`` over the table, each value
    quantizes to ``q = round(x * 127 / scale)`` (clamped implicitly by the
    max) and reconstructs as ``q * scale / 127``. Returns one row per
    dimension: ``(pos, scale, mse, max_abs_err)`` with the mean-squared
    error computed via order-independent decimal sums (engine-stable, like
    every oracle-compared aggregate in this repo) and outputs rounded to
    make the doubles hash-comparable across engines.
    """
    ex = emb.select(F.posexplode(F.col(vec_col)).alias("pos", "x")).select(
        "pos", F.col("x").cast("double").alias("x")
    )
    scales = ex.groupBy("pos").agg(F.max(F.abs(F.col("x"))).alias("scale"))
    q = (
        ex.join(F.broadcast(scales), "pos")
        .withColumn(
            "dq",
            F.when(F.col("scale") > 0,
                   F.round(F.col("x") * 127.0 / F.col("scale"))
                   * F.col("scale") / 127.0)
            .otherwise(F.lit(0.0)),
        )
        .withColumn("err", F.abs(F.col("x") - F.col("dq")))
    )
    return (
        q.groupBy("pos")
        .agg(
            F.round(F.max("scale"), 6).alias("scale"),
            F.round(
                decimal_mean(F.col("err") * F.col("err"), scale=12, precision=32),
                9,
            ).alias("mse"),
            F.round(F.max("err"), 6).alias("max_abs_err"),
        )
        .orderBy("pos")
    )


def zscore_outlier_report(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-vector z-score outlier audit against per-dimension corpus stats.

    Embedding corpora pick up broken vectors (encoder bugs, truncated
    inputs) that ANN search then happily serves; this flags them before
    indexing. For each dimension the corpus mean and variance come from
    order-independent decimal sums (sum x, sum x² — engine- and
    partition-order-stable), then each vector reports how many of its
    dimensions sit more than ``z_threshold`` standard deviations from the
    dimension mean, and its worst |z|.

    Plan shape mirrors ``quantize_int8_report``: one ``posexplode``, a
    dims-row stats aggregate, the stats broadcast back onto the exploded
    stream, and a per-vector aggregation — wire traffic for the stats pass
    is executors × dims regardless of row count, and the per-vector pass is
    a partial-agg-friendly sum/max on the id the explode preserved.
    """
    ex = emb.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "xf")
    ).select(F.col(id_col), "pos", F.col("xf").cast("double").alias("x"))
    st = ex.groupBy("pos").agg(
        decimal_mean(F.col("x"), scale=10, precision=30).alias("mean"),
        decimal_mean(F.col("x") * F.col("x"), scale=12, precision=32).alias(
            "m2"
        ),
    )
    std = F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    z = (
        ex.join(F.broadcast(st), "pos")
        .withColumn(
            "z",
            F.when(std > 0, (F.col("x") - F.col("mean")) / std).otherwise(
                F.lit(0.0)
            ),
        )
    )
    return (
        z.groupBy(id_col)
        .agg(
            F.sum((F.abs(F.col("z")) > z_threshold).cast("long")).alias(
                "n_outlier_dims"
            ),
            F.round(F.max(F.abs(F.col("z"))), 6).alias("max_abs_z"),
        )
        .orderBy(id_col)
    )
