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


def gap_fill(
    df: DataFrame,
    interval_s: int,
    start: datetime,
    end: datetime,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regular-grid gap filling with backward fill, per key.

    Emits one row per key per grid point in ``[start, end)`` carrying the
    most recent observation at-or-before the grid point (``value`` /
    ``last_event_us``; null before the first observation). This is the
    serving-side "resample to a dense grid" the archived-noise dashboards
    need when hydrophones drop out — SQL-awkward (grid × as-of per key),
    natural as a grouped-map: ``applyInPandas`` ships each key's rows to one
    Arrow batch and ``pandas.merge_asof`` does the backward scan.

    Input duplicates per (key, ts) must be pre-reduced by the caller (the
    registry query reduces with max(value)) so the fill is deterministic.
    Scale shape: one shuffle on the keys; each group holds only that key's
    observations plus a bounded grid (grid length = window/interval), so
    memory per group is bounded regardless of table size.
    """
    import pandas as pd

    keys = keys or ["hydrophone"]
    grid = pd.date_range(start, end, freq=f"{interval_s}s", inclusive="left")
    out_schema = ", ".join(
        [f"{k} string" for k in keys]
        + ["grid_us long", "value double", "last_event_us long"]
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        gdf = pd.DataFrame({"_g": grid})
        merged = pd.merge_asof(
            gdf, pdf[[ts_col, value_col]], left_on="_g", right_on=ts_col,
            direction="backward",
        )
        out = pd.DataFrame(
            {
                **{k: key[i] for i, k in enumerate(keys)},
                "grid_us": merged["_g"].astype("int64") // 1000,
                "value": merged[value_col],
                "last_event_us": merged[ts_col].astype("int64") // 1000,
            }
        )
        # pandas NaT // 1000 is a huge negative sentinel — null it out
        out.loc[merged[ts_col].isna(), "last_event_us"] = None
        return out

    return df.groupBy(*keys).applyInPandas(fn, schema=out_schema)
