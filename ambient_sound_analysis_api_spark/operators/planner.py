"""Driver-side request planning: interval resolution and window guards.

These are the pieces of the reference that are *not* relational — pure
parameter arithmetic that happens before any scan (SURVEY.md §2.9). They are
ported as plain Python, unchanged in spirit: no DataFrame is involved.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

from ..errors import (
    PointCapExceededError,
    RequestValidationError,
    WindowTooLargeError,
)

# Supported aggregation intervals, finest→coarsest
# (reference rule table app/services/get_aggregations.py:24-39).
INTERVALS: dict[str, int] = {
    "10s": 10,
    "1m": 60,
    "5m": 300,
    "15m": 900,
    "1h": 3600,
    "1d": 86400,
}

# Reference constants (app/services/get_aggregations.py:40-41,
# get_timeseries.py:19).
MAX_AGGREGATION_POINTS = 2000
AUTO_INTERVAL_TARGET_POINTS = 1000
MAX_WINDOW_DAYS = 31


def to_naive_utc(ts: datetime) -> datetime:
    """tz-aware → UTC → drop tzinfo; naive passes through.

    Parity with ``_to_naive_utc`` (``app/services/get_timeseries.py:30-33``);
    the session timezone is pinned to UTC so naive timestamps are unambiguous.
    """
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts


def expected_point_count(start: datetime, end: datetime, delta_t: int) -> int:
    """``ceil((end-start)/delta_t)`` (reference
    ``app/services/get_timeseries.py:36-40``)."""
    if delta_t <= 0:
        raise RequestValidationError("delta_t must be positive")
    span = (end - start).total_seconds()
    return math.ceil(span / delta_t)


def validate_window(
    start: datetime,
    end: datetime,
    *,
    max_days: int | None = None,
) -> None:
    """``end > start``; optional raw-window day cap.

    Parity with reference guards ``app/services/get_timeseries.py:43-53``
    (31-day cap applies to raw timeseries only; aggregations bypass it,
    ``docs/agent-context.md:180-182``).
    """
    if end <= start:
        raise RequestValidationError("end must be after start")
    if max_days is not None and (end - start) > timedelta(days=max_days):
        raise WindowTooLargeError(
            f"window exceeds the {max_days}-day limit for raw timeseries"
        )


def resolve_interval(start: datetime, end: datetime, interval: str) -> str:
    """Interval resolution incl. the ``auto`` point-budget planner.

    ``auto`` picks the *finest* interval whose estimated point count
    ``ceil(window/interval)`` is ≤ AUTO_INTERVAL_TARGET_POINTS; a window
    shorter than the finest interval is an error; if nothing fits, the
    coarsest wins. Parity with ``_resolve_interval``
    (``app/services/get_aggregations.py:138-163``).
    """
    if interval != "auto":
        if interval not in INTERVALS:
            raise RequestValidationError(
                f"unknown interval {interval!r}; expected one of "
                f"{sorted(INTERVALS)} or 'auto'"
            )
        return interval
    window_s = (end - start).total_seconds()
    finest = min(INTERVALS.values())
    if window_s < finest:
        raise RequestValidationError(
            "window is shorter than the finest supported interval"
        )
    for label, secs in sorted(INTERVALS.items(), key=lambda kv: kv[1]):
        if math.ceil(window_s / secs) <= AUTO_INTERVAL_TARGET_POINTS:
            return label
    return max(INTERVALS.items(), key=lambda kv: kv[1])[0]


def check_point_cap(n_points: int, what: str = "aggregation") -> None:
    """Reject (never truncate) outputs above the 2,000-point cap
    (reference ``app/services/get_aggregations.py:364-374, 506-510,
    596-600``)."""
    if n_points > MAX_AGGREGATION_POINTS:
        raise PointCapExceededError(
            f"{what} would produce {n_points} points, which exceeds the "
            f"limit of {MAX_AGGREGATION_POINTS}"
        )


def validate_interval_fits(start: datetime, end: datetime, interval: str) -> None:
    """Window must be at least one bucket wide
    (reference ``app/services/get_aggregations.py:166-180``)."""
    if (end - start).total_seconds() < INTERVALS[interval]:
        raise RequestValidationError("window is shorter than the interval")
