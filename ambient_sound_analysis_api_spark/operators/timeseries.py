"""Raw timeseries queries: pruned scan → window filter → projection.

Re-expresses the reference's ``/timeseries/broadband`` and ``/timeseries/psd``
paths (``app/services/get_timeseries.py:188-335``). The reference's file-level
pruning + whole-file pandas download + post-hoc trim becomes a single
declarative plan: partition-pruned Parquet scan with the time predicate pushed
into the scan (row-group stats), projection pruned to the needed columns.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import is_finite


def window_filter(df: DataFrame, start: datetime, end: datetime,
                  ts_col: str = "ts") -> DataFrame:
    """Start-inclusive / end-exclusive time window (reference
    ``app/api/timeseries.py:21-22``)."""
    return df.filter((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))


def broadband_points(
    df: DataFrame,
    hydrophone: str,
    start: datetime,
    end: datetime,
    *,
    drop_nonfinite: bool = True,
) -> DataFrame:
    """Broadband point list ``(ts, value)`` ordered by time.

    Parity with ``get_broadband_timeseries``
    (``app/services/get_timeseries.py:246-261``): first (only) value column,
    timestamp-ascending, non-finite values dropped at the edge (P6,
    ``README.md:138``).
    """
    out = (
        window_filter(df, start, end)
        .filter(F.col("hydrophone") == hydrophone)
        .select("ts", "value")
    )
    if drop_nonfinite:
        out = out.filter(is_finite(F.col("value")))
    return out.orderBy("ts")


def psd_long(
    df: DataFrame,
    hydrophone: str,
    start: datetime,
    end: datetime,
    *,
    band_low: float | None = None,
    band_high: float | None = None,
) -> DataFrame:
    """PSD rows ``(ts, band_hz, value)`` with optional band-range selection.

    Band selection is a row filter on ``band_hz`` — the long-form equivalent
    of the reference's select-columns-whose-label-parses-into-range
    (``app/services/get_aggregations.py:57-75``).
    """
    out = window_filter(df, start, end).filter(F.col("hydrophone") == hydrophone)
    if band_low is not None:
        out = out.filter(F.col("band_hz") >= F.lit(float(band_low)))
    if band_high is not None:
        out = out.filter(F.col("band_hz") <= F.lit(float(band_high)))
    return out.select("ts", "band_hz", "value")


def psd_matrix(psd: DataFrame, bands: list[float]) -> DataFrame:
    """Serving projection: long PSD → wide matrix rows.

    One output row per timestamp with one column per requested band
    (reference response shape ``app/services/get_timeseries.py:309-328``).
    Implemented as conditional aggregation over an explicit band list so the
    output schema is static — a requirement for a distributed plan (dynamic
    ``pivot`` needs an extra pass to discover labels).

    Rows where *all* bands are null are dropped, matching the reference's
    ``dropna(how='all')`` (``app/services/get_aggregations.py:254-255``).
    """
    aggs = [
        F.avg(F.when(F.col("band_hz") == F.lit(b), F.col("value"))).alias(_band_col(b))
        for b in bands
    ]
    wide = psd.groupBy("ts").agg(*aggs)
    not_all_null = None
    for b in bands:
        c = F.col(_band_col(b)).isNotNull()
        not_all_null = c if not_all_null is None else (not_all_null | c)
    return wide.filter(not_all_null).orderBy("ts")


def _band_col(band_hz: float) -> str:
    """Stringified band label (reference stringifies column labels for the
    response, ``app/services/get_timeseries.py:321``)."""
    return f"band_{band_hz:g}"
