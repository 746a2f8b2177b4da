"""Hostile-session-timezone probe, promoted from the verify recipe to a
committed test: the driver runs queries under a BARE default session, so
every date-bucketing query must self-pin UTC (``registry._table`` /
``_events`` set the session TZ) rather than inherit whatever the ambient
session carries. A non-UTC ambient TZ shifts day boundaries by hours —
exactly the class of bug that only shows up on someone else's laptop.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from ambient_sound_analysis_api_spark.oracle_compare import (
    fetch_duckdb,
    fetch_spark_pandas,
    hash_rows,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize(
    "name",
    [
        "agg_daily_broadband",
        "agg_daily_summary_tod",
        "session_window_users",
        # round 11: cp_ts is a date_format readout — must self-pin UTC
        "ts_cusum_changepoint",
        # round 11: window credit keyed on the normalized micros timeline
        "agg_attribution_last_touch",
    ],
)
def test_date_bucketing_survives_hostile_session_tz(spark, sf_dir, name):
    import os

    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        cols, rows = fetch_spark_pandas(
            entrymod.queries()[name](spark, sf_dir)
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    dcols, drows = fetch_duckdb(con, entrymod.oracle_sql()[name])
    assert len(rows) == len(drows)
    assert hash_rows(cols, rows) == hash_rows(dcols, drows)
