from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.errors import (
    PointCapExceededError,
    RequestValidationError,
)
from ambient_sound_analysis_api_spark.operators.aggregations import (
    band_mean,
    daily_broadband,
    daily_summary,
    daily_summary_series,
    resample_mean,
)
from ambient_sound_analysis_api_spark.operators.planner import (
    check_point_cap,
    resolve_interval,
)

START = datetime(2021, 10, 29)


@pytest.fixture(scope="module")
def day_df(spark):
    """One synthetic day at 10-second spacing (8640 rows), value = i % 100."""
    rows = [
        (START + timedelta(seconds=10 * i), float(i % 100)) for i in range(8640)
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double").cache()


def test_auto_interval_resolves_5m_for_one_day(day_df):
    # mirrors reference tests/test_get_aggregations.py:45-57: 24h @ auto → 5m,
    # 288 buckets
    interval = resolve_interval(START, START + timedelta(days=1), "auto")
    assert interval == "5m"
    buckets = resample_mean(day_df, 300).collect()
    assert len(buckets) == 288


def test_explicit_10s_over_day_exceeds_cap(day_df):
    # mirrors reference tests/test_get_aggregations.py:59-87: 8640 > 2000 cap
    n = resample_mean(day_df, 10).count()
    assert n == 8640
    with pytest.raises(PointCapExceededError):
        check_point_cap(n)


def test_resample_mean_matches_pandas(spark, day_df):
    import pandas as pd

    ours = {
        r["bucket_ts"]: r["mean_value"]
        for r in resample_mean(day_df, 900).collect()
    }
    pdf = day_df.toPandas().set_index("ts")
    theirs = pdf.resample("900s").mean()["value"].dropna()
    assert len(ours) == len(theirs)
    for ts, v in theirs.items():
        assert ours[ts.to_pydatetime()] == pytest.approx(v, rel=1e-12)


def test_resample_skips_nonfinite(spark):
    rows = [
        (START, 10.0),
        (START + timedelta(seconds=1), float("nan")),
        (START + timedelta(seconds=2), float("inf")),
        (START + timedelta(seconds=3), 20.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = resample_mean(df, 60).collect()
    assert len(out) == 1
    assert out[0]["mean_value"] == 15.0


def test_resample_mean_inf_divergence(spark):
    """Pins the documented divergence from the reference (resample_mean
    docstring): a bucket containing ±inf among finite points yields the mean
    of its FINITE points here, whereas the reference (inf propagates through
    pandas mean, output dropped as non-finite at serialization) drops the
    whole bucket. A bucket that is all-non-finite produces no row at all."""
    rows = [
        # bucket 0: finite + inf → mean of finite survivors
        (START, 10.0),
        (START + timedelta(seconds=1), float("inf")),
        (START + timedelta(seconds=2), 20.0),
        # bucket 1: -inf only → filtered to empty, no output row
        (START + timedelta(seconds=60), float("-inf")),
        # bucket 2: NaN + finite → identical in both engines (NaN skipped)
        (START + timedelta(seconds=120), float("nan")),
        (START + timedelta(seconds=121), 7.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["bucket_ts"]: r["mean_value"] for r in resample_mean(df, 60).collect()}
    assert out == {
        START: 15.0,  # reference would drop this bucket entirely
        START + timedelta(seconds=120): 7.0,
    }


def test_band_mean_filters_range(spark):
    rows = [
        (START, 63.0, 10.0),
        (START, 125.0, 20.0),
        (START, 8000.0, 30.0),
        (START, 16000.0, 1000.0),  # outside default range → excluded
    ]
    psd = spark.createDataFrame(rows, "ts timestamp, band_hz double, value double")
    out = band_mean(psd, 60).collect()
    assert len(out) == 1
    assert out[0]["mean_value"] == 20.0


def test_daily_summary_across_days(spark):
    # same second-of-day on 3 different days → one tod row aggregating 3 obs
    rows = [
        (datetime(2021, 10, 29 + d, 6, 0, 0), 100.0, float(10 * (d + 1)))
        for d in range(3)
    ]
    psd = spark.createDataFrame(rows, "ts timestamp, band_hz double, value double")
    out = daily_summary(psd, 900).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tod_s"] == 6 * 3600
    assert r["mean_value"] == 20.0
    assert r["min_value"] == 10.0
    assert r["max_value"] == 30.0
    assert r["count_value"] == 3
    series = daily_summary_series(daily_summary(psd, 900)).collect()
    assert series[0]["count_series"] == 3.0  # mean-of-counts semantics (A8)


def test_daily_broadband(spark):
    rows = [
        (datetime(2021, 10, 29, 1), 10.0),
        (datetime(2021, 10, 29, 23), 30.0),
        (datetime(2021, 10, 30, 5), 50.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {str(r["day"]): r["mean_value"] for r in daily_broadband(df).collect()}
    assert out == {"2021-10-29": 20.0, "2021-10-30": 50.0}


def test_resolve_interval_errors():
    with pytest.raises(RequestValidationError):
        resolve_interval(START, START + timedelta(seconds=5), "auto")
    with pytest.raises(RequestValidationError):
        resolve_interval(START, START + timedelta(days=1), "7h")
    # huge window → coarsest wins even though it exceeds the budget
    assert resolve_interval(START, START + timedelta(days=4000), "auto") == "1d"
