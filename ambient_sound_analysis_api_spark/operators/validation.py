"""Preflight request validation against the coverage catalog (C4/S5).

The reference validates requests with a linear scan over cached inventory
options plus an interval-overlap test (``app/services/get_timeseries.py:
101-184``). Here it is the same logic as a **broadcast semi-join**: a 1-row
request against the tiny catalog with an equi-condition on the product key
and a range condition on coverage — the shape Spark would use even if the
catalog had millions of rows.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import (
    OutsideCoverageError,
    TimeseriesDataIntegrityError,
    UnavailableCombinationError,
    UnknownHydrophoneError,
)


def coverage_lookup(
    spark: SparkSession,
    catalog: DataFrame,
    hydrophone: str,
    freq_type: str,
    delta_f: int | None,
    delta_t: int,
    start: datetime,
    end: datetime,
) -> DataFrame:
    """Catalog rows matching the requested product that overlap [start, end).

    Overlap predicate matches the reference's rejection condition
    ``end < coverage_start or start > coverage_end``
    (``app/services/get_timeseries.py:135-143, 176-184``).
    """
    request = spark.createDataFrame(
        [(hydrophone, freq_type, delta_f, delta_t, start, end)],
        "r_hydrophone string, r_freq_type string, r_delta_f int, "
        "r_delta_t int, r_start timestamp, r_end timestamp",
    )
    cond = (
        (F.col("hydrophone") == F.col("r_hydrophone"))
        & (F.col("freq_type") == F.col("r_freq_type"))
        & (F.col("delta_t") == F.col("r_delta_t"))
        # broadband products carry delta_f = null → null-safe equality
        & F.col("delta_f").eqNullSafe(F.col("r_delta_f"))
        & (F.col("r_start") <= F.col("last_end"))
        & (F.col("r_end") >= F.col("first_start"))
    )
    return catalog.join(F.broadcast(request), cond, "inner").select(catalog.columns)


def validate_request(
    spark: SparkSession,
    catalog: DataFrame,
    hydrophone: str,
    freq_type: str,
    delta_f: int | None,
    delta_t: int,
    start: datetime,
    end: datetime,
) -> None:
    """Typed preflight rejection, mirroring the reference's 400 taxonomy.

    Raises UnknownHydrophoneError / UnavailableCombinationError /
    OutsideCoverageError in the same precedence order the reference checks
    (``app/services/get_timeseries.py:101-184``). The catalog is tiny, so the
    three probes collapse into driver-side checks over one collected slice.
    """
    rows = catalog.filter(F.col("hydrophone") == hydrophone).collect()
    if not rows:
        raise UnknownHydrophoneError(f"unknown hydrophone {hydrophone!r}")
    combo = [
        r
        for r in rows
        if r["freq_type"] == freq_type
        and r["delta_t"] == delta_t
        and (r["delta_f"] == delta_f or freq_type == "broadband")
    ]
    if not combo:
        raise UnavailableCombinationError(
            f"no {freq_type} combination with delta_f={delta_f}, "
            f"delta_t={delta_t} for {hydrophone!r}"
        )
    cover = [
        r for r in combo if not (end < r["first_start"] or start > r["last_end"])
    ]
    if not cover:
        raise OutsideCoverageError(
            "requested window is outside the coverage area"
        )


def integrity_probe(
    pruned_row_count: int, matching_file_count: int, what: str = "timeseries"
) -> None:
    """Files matched by name but zero rows in window ⇒ integrity error.

    Parity with ``_matching_file_count`` + guard
    (``app/services/get_timeseries.py:71-81, 223-229``): archives exist whose
    Parquet content disagrees with the filename range
    (``docs/upstream-notes.md:27-41``).
    """
    if matching_file_count > 0 and pruned_row_count == 0:
        raise TimeseriesDataIntegrityError(
            f"{what}: {matching_file_count} archive file(s) match the window "
            "by name but contain no rows in it"
        )
