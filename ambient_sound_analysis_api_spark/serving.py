"""Serving layer: the reference's endpoint semantics over the Spark engine.

One class per deployment (``Engine``), one method per reference endpoint
(``app/api/{options,timeseries,aggregations}.py``). Each method runs the
reference lifecycle — normalize → preflight-validate against the catalog →
pruned scan → aggregate → cap-check → envelope — with the heavy middle
compiled to one declarative Spark plan instead of chunked pandas.

Driver/executor discipline: counts and caps are computed DataFrame-side;
only the bounded serving payload (≤ MAX_AGGREGATION_POINTS buckets, or a
≤31-day raw window) is ever collected, so the driver never materializes an
unbounded result (contrast: the reference loads whole months into process
memory, ``docs/upstream-notes.md:65-71``).

Request memoization mirrors the reference's ``lru_cache`` layer
(``app/services/*.py``, measured 24.67 s → 0.016 s on repeat,
``docs/performance-enhancements.md:22``).
"""

from __future__ import annotations

import copy
import functools
import math
from datetime import datetime, timedelta
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .errors import RequestValidationError, UnknownHydrophoneError
from .functions.scalars import is_finite, normalize_hydrophone
from .operators import aggregations as agg
from .operators import timeseries as ts_ops
from .operators.planner import (
    INTERVALS,
    MAX_AGGREGATION_POINTS,
    MAX_WINDOW_DAYS,
    check_point_cap,
    expected_point_count,
    resolve_interval,
    to_naive_utc,
    validate_interval_fits,
    validate_window,
)
from .operators.validation import integrity_probe, validate_request
from .sources.catalog import build_catalog

_ISO = "yyyy-MM-dd'T'HH:mm:ss"


def _memoized(fn, maxsize: int):
    """``lru_cache`` that hands each caller a deep copy of the cached payload.

    A raw ``lru_cache`` returns the *same* dict object to every caller; a
    consumer that mutates its response (e.g. appends to ``out['points']``)
    would silently poison the cache for all later identical requests. The
    cached object stays private; ``cache_info``/``cache_clear`` are
    re-exported for tests and operational cache busting.
    """
    cached = lru_cache(maxsize=maxsize)(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return copy.deepcopy(cached(*args, **kwargs))

    wrapper.cache_info = cached.cache_info
    wrapper.cache_clear = cached.cache_clear
    return wrapper


def _norm_slug(name: str) -> str:
    """Driver-side mirror of ``functions.scalars.normalize_hydrophone``
    (reference ``app/services/get_options.py:22-26``)."""
    slug = name.strip().upper().replace(" ", "_").replace("-", "_")
    if not slug:
        raise RequestValidationError("hydrophone name must be non-empty")
    return slug


class Engine:
    """Analytics engine over a materialized domain root
    (see ``sources.domain.materialize_domain`` for the layout)."""

    def __init__(self, spark: SparkSession, root: str, key_lister=None):
        self.spark = spark
        self.root = root
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Archive-key source is pluggable (sources/listing.py), resolved
        # through auto_lister — the selection point that makes the
        # executor-sharded walk the default whenever the namespace exposes
        # prefixes. Production: Engine(key_lister=auto_lister(
        # pager_factory=lambda: s3_pager(boto3.client('s3'), bucket),
        # prefixes=[f'archive/{h}/' for h in hydros])); the sandbox
        # default resolves to the staged parquet listing.
        if key_lister is None:
            from .sources.listing import auto_lister

            key_lister = auto_lister(path=f"{root}/archive_keys.parquet")
        # catalog: tiny (one row per product), cached and reused by every
        # preflight validation (reference C4/C5)
        self._catalog = build_catalog(key_lister.list_keys(spark)).cache()
        self._catalog.count()  # materialize once
        # memoized request entry points (reference lru_cache sizes,
        # app/services/get_options.py:54, get_timeseries.py:233,287,
        # get_aggregations.py:310-548)
        self.options = _memoized(self._options, 16)
        self.broadband_timeseries = _memoized(self._broadband_timeseries, 128)
        self.psd_timeseries = _memoized(self._psd_timeseries, 128)
        self.broadband_aggregation = _memoized(self._broadband_aggregation, 64)
        self.band_aggregation = _memoized(self._band_aggregation, 64)
        self.psd_heatmap = _memoized(self._psd_heatmap, 64)
        self.daily_summary = _memoized(self._daily_summary, 64)
        self.daily_broadband_summary = _memoized(self._daily_broadband_summary, 64)

    # ------------------------------------------------------------------ scans

    def _data(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.root}/data")

    def _scan(
        self,
        freq_type: str,
        delta_f: int | None,
        delta_t: int,
        hydrophone_slug: str,
        start: datetime,
        end: datetime,
    ) -> DataFrame:
        """Pruned product scan: every predicate here lands on a partition
        column or the parquet ``ts`` row-group stats — the Catalyst
        replacement for the reference's filename pruning (SURVEY.md §4)."""
        df = self._data().filter(
            (F.col("freq_type") == freq_type)
            & (F.col("delta_t") == delta_t)
            & (normalize_hydrophone(F.col("hydrophone")) == hydrophone_slug)
        )
        if delta_f is not None:
            df = df.filter(F.col("delta_f") == delta_f)
        return ts_ops.window_filter(df, start, end)

    def _matching_file_count(
        self, slug: str, freq_type: str, delta_f: int | None, delta_t: int,
        start: datetime, end: datetime,
    ) -> int:
        """Catalog-side probe for the integrity check (reference
        ``_matching_file_count``, ``get_timeseries.py:71-81``)."""
        rows = self._catalog.filter(
            (F.col("hydrophone") == slug)
            & (F.col("freq_type") == freq_type)
            & (F.col("delta_t") == delta_t)
            & F.col("delta_f").eqNullSafe(F.lit(delta_f))
            & (F.lit(start) <= F.col("last_end"))
            & (F.lit(end) >= F.col("first_start"))
        ).collect()
        return int(sum(r["file_count"] for r in rows))

    # ----------------------------------------------------------- cap preflight

    def _precollect_point_cap(
        self,
        bucketed: DataFrame,
        start: datetime,
        end: datetime,
        interval_s: int,
        what: str,
        time_col: str | None = None,
    ) -> None:
        """Enforce the 2,000-point cap BEFORE any ``.collect()``.

        Two tiers, so the common (accepted) request costs zero extra jobs:

        1. Arithmetic bound: a tumbling-window aggregation over
           ``[start, end)`` can produce at most
           ``ceil(window/interval) + 1`` aligned buckets (the +1 covers a
           start that is not bucket-aligned). If that bound already fits the
           cap, the collect is provably bounded — skip the probe.
        2. Exact DF-side count: when the bound exceeds the cap the *actual*
           bucket count may still be small (sparse archives), so reject only
           on a real count — a scalar aggregate job that never materializes
           rows on the driver. This replaces the reference's
           collect-then-check (``app/services/get_aggregations.py:506-510``),
           whose failure mode at scale is materializing millions of buckets
           driver-side only to raise.

        ``time_col`` counts distinct bucket timestamps instead of rows for
        long-form results that carry one row per (bucket, band) cell.
        """
        bound = expected_point_count(start, end, interval_s) + 1
        if bound <= MAX_AGGREGATION_POINTS:
            return
        probe = bucketed.select(time_col).distinct() if time_col else bucketed
        check_point_cap(probe.count(), what)

    # ---------------------------------------------------------------- options

    def _options(self, hydrophone: str | None = None) -> dict:
        """Archive inventory (reference GET /options,
        ``app/services/get_options.py:216-224``)."""
        cat = self._catalog
        if hydrophone is not None:
            cat = cat.filter(F.col("hydrophone") == _norm_slug(hydrophone))
        else:
            # C7: the all-hydrophone listing omits the untrustworthy sandbox
            # archive; an explicit request still reaches it (reference
            # ``app/services/get_options.py:59-64``, ``README.md:66-70``)
            cat = cat.filter(F.col("hydrophone") != "SANDBOX")
        rows = cat.collect()
        if hydrophone is not None and not rows:
            raise UnknownHydrophoneError(f"unknown hydrophone {hydrophone!r}")
        out: dict = {}
        for r in rows:
            h = out.setdefault(
                r["hydrophone"],
                {"broadband": {}, "octave_bands": {}, "delta_hz": {}},
            )
            coverage = {
                "first_start": r["first_start"].isoformat(),
                "last_end": r["last_end"].isoformat(),
                "file_count": r["file_count"],
            }
            if r["freq_type"] == "broadband":
                h["broadband"][r["delta_t"]] = coverage
            else:
                h[r["freq_type"]][(r["delta_f"], r["delta_t"])] = coverage
        return out

    # ------------------------------------------------------------- timeseries

    def _broadband_timeseries(
        self,
        hydrophone: str,
        start: datetime,
        end: datetime,
        delta_t: int = 1,
        validate: bool = True,
    ) -> dict:
        """Reference GET /timeseries/broadband
        (``app/services/get_timeseries.py:233-271``)."""
        slug = _norm_slug(hydrophone)
        start, end = to_naive_utc(start), to_naive_utc(end)
        if delta_t <= 0:
            raise RequestValidationError("delta_t must be positive")
        validate_window(start, end, max_days=MAX_WINDOW_DAYS)
        if validate:
            validate_request(
                self.spark, self._catalog, slug, "broadband", None, delta_t,
                start, end,
            )
        pts_df = (
            self._scan("broadband", None, delta_t, slug, start, end)
            .filter(is_finite(F.col("value")))
            .select(F.date_format("ts", _ISO).alias("ts"), "value")
            .orderBy("ts")
        )
        points = [(r["ts"], float(r["value"])) for r in pts_df.collect()]
        integrity_probe(
            len(points),
            self._matching_file_count(slug, "broadband", None, delta_t, start, end)
            if not points
            else 1,
        )
        return {
            "hydrophone": slug,
            "delta_t": delta_t,
            "points": points,
            "point_count": len(points),
            "expected_point_count": expected_point_count(start, end, delta_t),
        }

    def _psd_timeseries(
        self,
        hydrophone: str,
        start: datetime,
        end: datetime,
        delta_t: int = 1,
        delta_f: str = "3oct",
        validate: bool = True,
    ) -> dict:
        """Reference GET /timeseries/psd
        (``app/services/get_timeseries.py:287-335``): times × frequencies ×
        matrix envelope; band columns discovered from the data."""
        slug = _norm_slug(hydrophone)
        start, end = to_naive_utc(start), to_naive_utc(end)
        freq_type, freq_value = _parse_delta_f(delta_f)
        validate_window(start, end, max_days=MAX_WINDOW_DAYS)
        if validate:
            validate_request(
                self.spark, self._catalog, slug, freq_type, freq_value,
                delta_t, start, end,
            )
        scan = self._scan(freq_type, freq_value, delta_t, slug, start, end)
        bands = [
            r["band_hz"]
            for r in scan.select("band_hz").distinct().orderBy("band_hz").collect()
        ]
        if not bands:
            integrity_probe(
                0,
                self._matching_file_count(
                    slug, freq_type, freq_value, delta_t, start, end
                ),
            )
            return {
                "hydrophone": slug, "delta_t": delta_t, "delta_f": delta_f,
                "times": [], "frequencies": [], "values": [],
            }
        wide = ts_ops.psd_matrix(
            scan.select("ts", "band_hz", "value"), bands
        ).collect()
        times = [r["ts"].isoformat() for r in wide]
        values = [
            [_json_float(r[ts_ops._band_col(b)]) for b in bands] for r in wide
        ]
        return {
            "hydrophone": slug,
            "delta_t": delta_t,
            "delta_f": delta_f,
            "times": times,
            "frequencies": [str(b) for b in bands],
            "values": values,
        }

    # ------------------------------------------------------------ aggregations

    def _broadband_aggregation(
        self,
        hydrophone: str,
        start: datetime,
        end: datetime,
        interval: str = "auto",
        delta_t: int = 1,
        validate: bool = True,
    ) -> dict:
        """Reference GET /aggregations/broadband
        (``app/services/get_aggregations.py:468-523``): tumbling-window mean
        as ONE global plan — no month chunking, no last-wins merge (U1)."""
        slug = _norm_slug(hydrophone)
        start, end = to_naive_utc(start), to_naive_utc(end)
        interval = resolve_interval(start, end, interval)
        validate_interval_fits(start, end, interval)
        if validate:
            validate_request(
                self.spark, self._catalog, slug, "broadband", None, delta_t,
                start, end,
            )
        scan = self._scan("broadband", None, delta_t, slug, start, end)
        bucketed = agg.resample_mean(scan, INTERVALS[interval])
        self._precollect_point_cap(
            bucketed, start, end, INTERVALS[interval], "broadband aggregation"
        )
        buckets = (
            bucketed.select(
                F.date_format("bucket_ts", _ISO).alias("t"), "mean_value"
            )
            .orderBy("t")
            .collect()
        )
        check_point_cap(len(buckets), "broadband aggregation")
        points = [
            (r["t"], float(r["mean_value"]))
            for r in buckets
            if math.isfinite(r["mean_value"])
        ]
        return {
            "hydrophone": slug, "interval": interval, "points": points,
            "point_count": len(points),
        }

    def _band_aggregation(
        self,
        hydrophone: str,
        start: datetime,
        end: datetime,
        interval: str = "auto",
        delta_t: int = 1,
        delta_f: str = "3oct",
        band_low: float = 63.0,
        band_high: float = 8000.0,
        validate: bool = True,
    ) -> dict:
        """Band-range mean series (reference ``_mean_band_range`` P4/A4,
        ``app/services/get_aggregations.py:57-75``): arithmetic dB mean with
        null-skip — not power integration."""
        slug = _norm_slug(hydrophone)
        start, end = to_naive_utc(start), to_naive_utc(end)
        freq_type, freq_value = _parse_delta_f(delta_f)
        interval = resolve_interval(start, end, interval)
        validate_interval_fits(start, end, interval)
        if validate:
            validate_request(
                self.spark, self._catalog, slug, freq_type, freq_value,
                delta_t, start, end,
            )
        scan = self._scan(freq_type, freq_value, delta_t, slug, start, end)
        n_bands = scan.filter(
            F.col("band_hz").between(band_low, band_high)
        ).select("band_hz").distinct().count()
        if n_bands == 0:
            raise RequestValidationError(
                f"no PSD bands in range [{band_low}, {band_high}]"
            )
        bucketed = agg.band_mean(scan, INTERVALS[interval], band_low, band_high)
        self._precollect_point_cap(
            bucketed, start, end, INTERVALS[interval], "band aggregation"
        )
        buckets = (
            bucketed.select(F.date_format("bucket_ts", _ISO).alias("t"), "mean_value")
            .orderBy("t")
            .collect()
        )
        check_point_cap(len(buckets), "band aggregation")
        return {
            "hydrophone": slug, "interval": interval,
            "band_low": float(band_low), "band_high": float(band_high),
            "points": [
                (r["t"], float(r["mean_value"]))
                for r in buckets
                if math.isfinite(r["mean_value"])
            ],
        }

    def _psd_heatmap(
        self,
        hydrophone: str,
        start: datetime,
        end: datetime,
        interval: str = "auto",
        delta_t: int = 1,
        delta_f: str = "3oct",
        validate: bool = True,
    ) -> dict:
        """Reference GET /aggregations/psd
        (``app/services/get_aggregations.py:548-619``): the day-chunk loop +
        last-wins merge + schema check becomes one
        groupBy(bucket, band).agg(avg) plan (SURVEY.md §3.2)."""
        slug = _norm_slug(hydrophone)
        start, end = to_naive_utc(start), to_naive_utc(end)
        freq_type, freq_value = _parse_delta_f(delta_f)
        if freq_type == "broadband":
            raise RequestValidationError(
                "psd heatmap requires a banded delta_f (e.g. '3oct')"
            )
        interval = resolve_interval(start, end, interval)
        validate_interval_fits(start, end, interval)
        if validate:
            validate_request(
                self.spark, self._catalog, slug, freq_type, freq_value,
                delta_t, start, end,
            )
        scan = self._scan(freq_type, freq_value, delta_t, slug, start, end)
        cell_df = agg.resample_mean(scan, INTERVALS[interval], keys=["band_hz"])
        self._precollect_point_cap(
            cell_df, start, end, INTERVALS[interval], "psd heatmap",
            time_col="bucket_ts",
        )
        cells = cell_df.collect()
        times = sorted({r["bucket_ts"] for r in cells})
        check_point_cap(len(times), "psd heatmap")
        bands = sorted({r["band_hz"] for r in cells})
        by_cell = {(r["bucket_ts"], r["band_hz"]): r["mean_value"] for r in cells}
        return {
            "hydrophone": slug, "interval": interval, "delta_f": delta_f,
            "times": [t.isoformat() for t in times],
            "frequencies": [str(b) for b in bands],
            "values": [
                [_json_float(by_cell.get((t, b))) for b in bands] for t in times
            ],
        }

    def _daily_summary(
        self,
        hydrophone: str,
        start_date: datetime,
        num_days: int = 7,
        interval: str = "15m",
        delta_t: int = 1,
        delta_f: str = "3oct",
    ) -> dict:
        """Reference GET /aggregations/daily-summary
        (``app/services/get_aggregations.py:310-404``): time-of-day
        mean/min/max/count series from ONE grouped pass (A5/A7/A8); count is
        mean-of-day-counts (``README.md:137``)."""
        slug = _norm_slug(hydrophone)
        start = to_naive_utc(start_date)
        end = start + timedelta(days=num_days)
        freq_type, freq_value = _parse_delta_f(delta_f)
        if interval not in INTERVALS:
            raise RequestValidationError(f"unknown interval {interval!r}")
        scan = self._scan(freq_type, freq_value, delta_t, slug, start, end)
        series = agg.daily_summary_series(
            agg.daily_summary(scan, INTERVALS[interval])
        ).collect()
        check_point_cap(len(series), "daily summary")

        def tod_label(s: int) -> str:
            return f"{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}"

        out = {"mean": [], "min": [], "max": [], "count": []}
        for r in series:
            label = tod_label(int(r["tod_s"]))
            for key, col in (
                ("mean", "mean_series"), ("min", "min_series"),
                ("max", "max_series"), ("count", "count_series"),
            ):
                v = r[col]
                if v is not None and math.isfinite(v):
                    out[key].append((label, float(v)))
        return {
            "hydrophone": slug, "interval": interval, "num_days": num_days,
            "series": out,
        }

    def _daily_broadband_summary(
        self,
        hydrophone: str,
        start_date: datetime,
        num_days: int = 7,
        delta_t: int = 1,
    ) -> dict:
        """Reference GET /aggregations/daily-broadband-summary
        (``app/services/get_aggregations.py:412-464``): one true broadband
        mean per calendar day (A6)."""
        slug = _norm_slug(hydrophone)
        start = to_naive_utc(start_date)
        end = start + timedelta(days=num_days)
        scan = self._scan("broadband", None, delta_t, slug, start, end)
        days = agg.daily_broadband(scan).collect()
        check_point_cap(len(days), "daily broadband summary")
        return {
            "hydrophone": slug, "num_days": num_days,
            "points": [
                (r["day"].isoformat(), float(r["mean_value"]))
                for r in days
                if math.isfinite(r["mean_value"])
            ],
        }


def _parse_delta_f(delta_f: str) -> tuple[str, int | None]:
    """Driver-side delta_f selector parse (reference
    ``app/services/get_timeseries.py:84-98``)."""
    s = delta_f.strip().lower()
    if s == "broadband":
        return "broadband", None
    if s.endswith("oct") and s[:-3].isdigit():
        return "octave_bands", int(s[:-3])
    if s.endswith("hz") and s[:-2].isdigit():
        return "delta_hz", int(s[:-2])
    raise RequestValidationError(f"invalid delta_f selector {delta_f!r}")


def _json_float(v) -> float | None:
    """Non-finite → None at the serialization edge (reference P6,
    ``README.md:138``)."""
    if v is None or not math.isfinite(v):
        return None
    return float(v)
