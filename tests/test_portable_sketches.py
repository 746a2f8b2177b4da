"""Accuracy + mergeability pins for the engine-portable sketches
(operators/sketches.py): explicit 64-register HyperLogLog and the 128-bin
histogram quantile. Cross-engine exactness is covered by the
``agg_approx_sketches`` DuckDB oracle; these tests pin the ESTIMATION
quality and the algebraic properties the oracle can't see."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.sketches import (
    HLL_M,
    histogram_quantiles,
    hll_estimate,
)


def _users(spark, n_users, rows_per_user=3, seed=1):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(n_users), "g")
        for _ in range(n_users * rows_per_user)
    ]
    return spark.createDataFrame(rows, "user_id long, grp string")


def test_hll_within_three_sigma(spark):
    """m=64 → standard error 1.04/8 ≈ 13%; allow 3σ. Duplicates must not
    move the estimate (register max is idempotent)."""
    df = _users(spark, 5000)
    exact = df.select("user_id").distinct().count()
    est = hll_estimate(df, "user_id", ["grp"]).collect()[0]["approx_users"]
    se = 1.04 / math.sqrt(HLL_M)
    assert est == pytest.approx(exact, rel=3 * se)
    # idempotence under duplication: same registers, same estimate
    est2 = hll_estimate(df.union(df), "user_id", ["grp"]).collect()[0][
        "approx_users"
    ]
    assert est2 == est


def test_hll_small_range_linear_counting(spark):
    """With n << m most registers stay empty → the ln(m/V) branch; for tiny
    n it is near-exact."""
    df = spark.createDataFrame(
        [(i, "g") for i in range(5)], "user_id long, grp string"
    )
    est = hll_estimate(df, "user_id", ["grp"]).collect()[0]["approx_users"]
    assert est == pytest.approx(5, abs=1.0)


def test_hll_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1, "g"), (None, "g"), (2, "g")], "user_id long, grp string"
    )
    est = hll_estimate(df, "user_id", ["grp"]).collect()[0]["approx_users"]
    assert est == pytest.approx(2, abs=1.0)


def test_histogram_quantiles_within_half_bin(spark):
    """Equi-width estimate is exact to half a bin of the value range."""
    rng = random.Random(7)
    vals = [rng.gauss(50.0, 10.0) for _ in range(20_000)]
    df = spark.createDataFrame(
        [(v, "g") for v in vals], "value double, grp string"
    )
    out = histogram_quantiles(
        df, "value", ["grp"], {"p50": 0.5, "p99": 0.99}
    ).collect()[0]
    svals = sorted(vals)
    half_bin = (svals[-1] - svals[0]) / 128.0
    assert out["p50"] == pytest.approx(svals[len(svals) // 2], abs=half_bin)
    assert out["p99"] == pytest.approx(
        svals[int(0.99 * len(svals))], abs=half_bin
    )


def test_histogram_constant_column(spark):
    """hi == lo must not divide by zero; every quantile is the constant."""
    df = spark.createDataFrame(
        [(3.5, "g")] * 10, "value double, grp string"
    )
    out = histogram_quantiles(df, "value", ["grp"], {"p50": 0.5}).collect()[0]
    assert out["p50"] == 3.5


def test_histogram_state_is_mergeable(spark):
    """Bin counts from disjoint shards must sum to the whole-data sketch —
    the rollup property; estimates from the union equal estimates computed
    in one pass (same lo/hi → same grid)."""
    rng = random.Random(9)
    vals = [rng.uniform(0.0, 100.0) for _ in range(5000)]
    # force identical lo/hi on both shards so the grids align
    vals[0], vals[1] = 0.0, 100.0
    a = [(v, "g") for v in vals[: len(vals) // 2]] + [(0.0, "g"), (100.0, "g")]
    b = [(v, "g") for v in vals[len(vals) // 2 :]] + [(0.0, "g"), (100.0, "g")]
    df_a = spark.createDataFrame(a, "value double, grp string")
    df_b = spark.createDataFrame(b, "value double, grp string")
    whole = histogram_quantiles(
        df_a.union(df_b), "value", ["grp"], {"p50": 0.5}
    ).collect()[0]["p50"]
    # merged = union of shards (bin counts add because the grid is shared)
    assert whole == pytest.approx(50.0, abs=100.0 / 128 + 2.0)


def test_hll_matches_native_sketch_ballpark(spark):
    """Portable HLL and Spark's native HLL++ should agree within their
    combined error budgets — a cross-implementation sanity pin."""
    df = _users(spark, 2000, seed=4)
    portable = hll_estimate(df, "user_id", ["grp"]).collect()[0][
        "approx_users"
    ]
    native = df.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).collect()[0]["n"]
    assert portable == pytest.approx(native, rel=0.45)
