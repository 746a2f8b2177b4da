"""Property-based correctness: the engine's trickiest operator semantics
checked against independent pandas implementations on randomized inputs.

These harden exactly the semantics SURVEY.md §7 flags as easy to get subtly
wrong: as-of join tie/ordering behavior and calendar-aligned bucket
boundaries. Example counts are small (each example round-trips through
Spark) but the generators hit the edge cases that matter: equal timestamps,
empty sides, bucket-boundary points.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ambient_sound_analysis_api_spark.operators.aggregations import resample_mean
from ambient_sound_analysis_api_spark.operators.joins import asof_join

BASE = datetime(2024, 1, 1)

# offsets in seconds — small range forces collisions and boundary hits
offsets = st.integers(min_value=0, max_value=600)


@st.composite
def asof_inputs(draw):
    left = draw(st.lists(offsets, min_size=1, max_size=15))
    right = draw(st.lists(offsets, min_size=0, max_size=15))
    return left, right


@given(asof_inputs())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(spark, inputs):
    left_off, right_off = inputs
    left_rows = [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(left_off)]
    # deduplicate right timestamps: merge_asof tie-handling on duplicate
    # right keys is positional, ours is value-deterministic; the engine
    # contract (docstring) requires a unique right ts per key, as the
    # registry's asof query enforces with a pre-reduce.
    right_rows = [
        (100 + j, ts)
        for j, ts in enumerate(
            sorted({BASE + timedelta(seconds=s) for s in right_off})
        )
    ]
    l_df = spark.createDataFrame(left_rows, "event_id long, ts timestamp").withColumn(
        "k", l_lit()
    )
    r_df = spark.createDataFrame(
        right_rows or [(None, None)], "r_id long, r_ts timestamp"
    )
    if not right_rows:
        r_df = r_df.filter("r_id is not null")
    r_df = r_df.withColumn("k", l_lit())

    got = {
        r["event_id"]: r["r_id"]
        for r in asof_join(
            l_df, r_df, on="k", left_ts="ts", right_ts="r_ts", right_values=["r_id"]
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "ts"]).sort_values(
        ["ts", "event_id"]
    )
    rp = pd.DataFrame(right_rows, columns=["r_id", "r_ts"]).sort_values("r_ts")
    if right_rows:
        exp_df = pd.merge_asof(
            lp, rp, left_on="ts", right_on="r_ts", direction="backward"
        )
        expected = {
            int(r.event_id): (None if pd.isna(r.r_id) else int(r.r_id))
            for r in exp_df.itertuples()
        }
    else:
        expected = {int(i): None for i, _ in left_rows}
    assert got == expected


def l_lit():
    from pyspark.sql import functions as F

    return F.lit("k")


@given(st.lists(st.tuples(offsets, st.floats(-100, 100)), min_size=1, max_size=30))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_resample_mean_matches_pandas_resample(spark, points):
    rows = [(BASE + timedelta(seconds=s), float(v)) for s, v in points]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r["bucket_ts"]: r["mean_value"]
        for r in resample_mean(df, 60).collect()
    }
    pdf = pd.DataFrame(rows, columns=["ts", "value"]).set_index("ts")
    exp = pdf.resample("60s").mean().dropna()
    expected = {ts.to_pydatetime(): v for ts, v in exp["value"].items()}
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-9)


@given(st.lists(offsets, min_size=1, max_size=25))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_gaps_and_islands(spark, secs):
    from ambient_sound_analysis_api_spark.operators.aggregations import sessionize

    gap = 60
    rows = [("u", BASE + timedelta(seconds=s)) for s in sorted(set(secs))]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    got = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap, keys=["user"]).collect()
    )
    # reference: break strictly when the gap exceeds the threshold
    expected = []
    cur = [rows[0][1]]
    for _, ts in rows[1:]:
        if (ts - cur[-1]).total_seconds() > gap:
            expected.append((cur[0], cur[-1], len(cur)))
            cur = [ts]
        else:
            cur.append(ts)
    expected.append((cur[0], cur[-1], len(cur)))
    assert got == sorted(expected)
