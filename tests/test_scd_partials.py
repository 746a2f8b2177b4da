"""Unit tests for SCD2 history apply and algebraic partial-merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.aggregations import (
    daily_partials,
    merge_partials_monthly,
)
from ambient_sound_analysis_api_spark.operators.scd import scd2_apply


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, valid_from string, valid_to string"
    )


def test_scd2_noop_update_insert(spark):
    current = _hist(
        spark,
        [
            (1, "a", "2024-01-01", None),
            (2, "b", "2024-01-01", None),
            (3, "c", "2024-01-01", None),
        ],
    )
    changes = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, attr string"
    )
    out = scd2_apply(current, changes, ["k"], ["attr"], "2024-06-01").collect()
    rows = {(r.k, r.valid_from): r for r in out}
    # no-op: key 1 untouched, exactly one row
    assert rows[(1, "2024-01-01")].valid_to is None
    assert sum(1 for r in out if r.k == 1) == 1
    # update: key 2 closed + reopened
    assert rows[(2, "2024-01-01")].valid_to == "2024-06-01"
    assert rows[(2, "2024-06-01")].attr == "B"
    assert rows[(2, "2024-06-01")].valid_to is None
    # untouched key 3, insert key 4
    assert rows[(3, "2024-01-01")].valid_to is None
    assert rows[(4, "2024-06-01")].valid_to is None
    assert len(out) == 5  # 1 noop + 2 versions of key 2 + 1 untouched + 1 insert


def test_scd2_closed_history_passes_through(spark):
    current = _hist(
        spark,
        [
            (1, "old", "2023-01-01", "2024-01-01"),
            (1, "new", "2024-01-01", None),
        ],
    )
    changes = spark.createDataFrame([(1, "newer")], "k long, attr string")
    out = scd2_apply(current, changes, ["k"], ["attr"], "2024-06-01").collect()
    assert len(out) == 3
    closed = [r for r in out if r.valid_from == "2023-01-01"]
    assert closed[0].valid_to == "2024-01-01"  # untouched closed row


def test_scd2_null_attributes_compare_null_safe(spark):
    current = _hist(spark, [(1, None, "2024-01-01", None)])
    changes = spark.createDataFrame([(1, None)], "k long, attr string")
    out = scd2_apply(current, changes, ["k"], ["attr"], "2024-06-01").collect()
    # null == null under eqNullSafe → no-op, single open row survives
    assert len(out) == 1 and out[0].valid_to is None


def test_partial_merge_is_lossless(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import _events
    from ambient_sound_analysis_api_spark.functions.scalars import (
        decimal_mean,
        is_finite,
    )

    ev = _events(spark, sf_dir)
    merged = {
        (r.event_type, r.month): r
        for r in merge_partials_monthly(daily_partials(ev)).collect()
    }
    direct = {
        (r.event_type, r.month): r
        for r in (
            ev.filter(is_finite(F.col("value")))
            .groupBy(
                "event_type", F.date_format("ts", "yyyy-MM").alias("month")
            )
            .agg(
                F.count("value").alias("n_events"),
                decimal_mean(F.col("value")).alias("mean_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        ).collect()
    }
    assert set(merged) == set(direct)
    for key, m in merged.items():
        d = direct[key]
        assert m.n_events == d.n_events
        assert m.mean_value == d.mean_value  # bit-identical, not approx
        assert m.min_value == d.min_value and m.max_value == d.max_value


def test_scd2_apply_is_idempotent(spark):
    """Re-applying the same change batch to the applied history must be a
    no-op: every change now matches the open rows, so no new versions."""
    current = _hist(
        spark,
        [(1, "a", "2024-01-01", None), (2, "b", "2024-01-01", None)],
    )
    changes = spark.createDataFrame(
        [(1, "A"), (3, "c")], "k long, attr string"
    )
    once = scd2_apply(current, changes, ["k"], ["attr"], "2024-06-01")
    twice = scd2_apply(once, changes, ["k"], ["attr"], "2024-07-01")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_empty_batch_is_identity(spark):
    current = _hist(spark, [(1, "a", "2024-01-01", None)])
    changes = spark.createDataFrame([], "k long, attr string")
    out = scd2_apply(current, changes, ["k"], ["attr"], "2024-06-01")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, current.collect())
    )


def test_scd2_rejects_duplicate_batch_keys(spark):
    import pytest

    current = _hist(spark, [(1, "a", "2024-01-01", None)])
    changes = spark.createDataFrame(
        [(5, "x"), (5, "y")], "k long, attr string"
    )
    with pytest.raises(ValueError, match="duplicate business keys"):
        scd2_apply(current, changes, ["k"], ["attr"], "2024-06-01")
