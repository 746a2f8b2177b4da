"""Stdlib HTTP front for the Engine — the reference's FastAPI surface
without the dependency.

The reference is "Thin FastAPI wrapper around orcasound_noise"
(``README.md:2``, ``app/main.py:14-18``); this module is the equivalent
thin wrapper around :class:`~ambient_sound_analysis_api_spark.serving.Engine`
using only ``http.server`` (FastAPI is not available in this environment;
swapping this for FastAPI changes no Engine code). Route table, query-param
names, response envelopes, side-band count headers (``X-Point-Count`` etc.,
reference ``app/api/timeseries.py:30-31``, ``app/api/aggregations.py:91,
125-126``) and the 400 error mapping mirror the reference.

Serving is driver-side by design: each request runs a bounded Spark job and
collects only the capped payload (SURVEY.md §2.9). The HTTP layer is
single-process like the reference; horizontal scale comes from running
multiple fronts against the same Spark cluster / data root.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .errors import EngineError, RequestValidationError
from .serving import Engine


def _parse_ts(value: str) -> datetime:
    try:
        return datetime.fromisoformat(value)
    except ValueError as exc:
        raise RequestValidationError(f"invalid timestamp {value!r}") from exc


def _q(params: dict, name: str, default=None, cast=None):
    if name not in params:
        if default is None and cast is not None and name in ("start", "end", "start_date"):
            raise RequestValidationError(f"missing required parameter {name!r}")
        return default
    raw = params[name][0]
    if cast is None:
        return raw
    try:
        if cast is bool:
            return raw.lower() not in ("false", "0", "no")
        return cast(raw)
    except (TypeError, ValueError) as exc:
        raise RequestValidationError(f"invalid value for {name!r}: {raw!r}") from exc


def _jsonable(obj):
    """Recursively make Engine payloads JSON-ready: tuple dict keys (the
    ``(delta_f, delta_t)`` coverage maps) become ``"f,t"`` strings, mirroring
    how the reference's Pydantic layer flattens them."""
    if isinstance(obj, dict):
        return {
            (",".join(map(str, k)) if isinstance(k, tuple) else str(k)): _jsonable(v)
            for k, v in obj.items()
        }
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


def make_handler(engine: Engine):
    """Build the request-handler class bound to one Engine instance."""

    class Handler(BaseHTTPRequestHandler):
        # route → (engine method name, param spec); spec = (name, cast, default)
        def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
            url = urlparse(self.path)
            params = parse_qs(url.query)
            try:
                body, headers = self._dispatch(url.path, params)
            except RequestValidationError as exc:
                self._send(400, {"detail": str(exc)})
                return
            except EngineError as exc:
                self._send(502, {"detail": str(exc)})
                return
            self._send(200, body, headers)

        def _dispatch(self, path: str, p: dict):
            e = engine
            if path == "/options":
                return e.options(_q(p, "hydrophone")), {}
            if path == "/timeseries/broadband":
                out = e.broadband_timeseries(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start", cast=str)),
                    _parse_ts(_q(p, "end", cast=str)),
                    _q(p, "delta_t", 1, int),
                    _q(p, "validate", True, bool),
                )
                return out, {
                    "X-Point-Count": len(out["points"]),
                    "X-Expected-Point-Count": out["expected_point_count"],
                }
            if path == "/timeseries/psd":
                out = e.psd_timeseries(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start", cast=str)),
                    _parse_ts(_q(p, "end", cast=str)),
                    _q(p, "delta_t", 1, int),
                    _q(p, "delta_f", "3oct", str),
                    _q(p, "validate", True, bool),
                )
                return out, {
                    "X-Time-Count": len(out["times"]),
                    "X-Frequency-Count": len(out["frequencies"]),
                }
            if path == "/aggregations/broadband":
                out = e.broadband_aggregation(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start", cast=str)),
                    _parse_ts(_q(p, "end", cast=str)),
                    _q(p, "interval", "auto", str),
                    _q(p, "delta_t", 1, int),
                    _q(p, "validate", True, bool),
                )
                return out, {"X-Point-Count": len(out["points"])}
            if path == "/aggregations/band":
                out = e.band_aggregation(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start", cast=str)),
                    _parse_ts(_q(p, "end", cast=str)),
                    _q(p, "interval", "auto", str),
                    _q(p, "delta_t", 1, int),
                    _q(p, "delta_f", "3oct", str),
                    _q(p, "band_low", 63.0, float),
                    _q(p, "band_high", 8000.0, float),
                )
                return out, {"X-Point-Count": len(out["points"])}
            if path == "/aggregations/psd":
                out = e.psd_heatmap(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start", cast=str)),
                    _parse_ts(_q(p, "end", cast=str)),
                    _q(p, "interval", "auto", str),
                    _q(p, "delta_t", 1, int),
                    _q(p, "delta_f", "3oct", str),
                    _q(p, "validate", True, bool),
                )
                return out, {
                    "X-Time-Count": len(out["times"]),
                    "X-Frequency-Count": len(out["frequencies"]),
                }
            if path == "/aggregations/daily-summary":
                out = e.daily_summary(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start_date", cast=str)),
                    _q(p, "num_days", 7, int),
                    _q(p, "interval", "15m", str),
                    _q(p, "delta_t", 1, int),
                    _q(p, "delta_f", "3oct", str),
                )
                return out, {}
            if path == "/aggregations/daily-broadband-summary":
                out = e.daily_broadband_summary(
                    _q(p, "hydrophone", "", str),
                    _parse_ts(_q(p, "start_date", cast=str)),
                    _q(p, "num_days", 7, int),
                    _q(p, "delta_t", 1, int),
                )
                return out, {}
            raise RequestValidationError(f"unknown route {path}")

        def _send(self, status: int, body: dict, headers: dict | None = None) -> None:
            payload = json.dumps(_jsonable(body), default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            for k, v in (headers or {}).items():
                self.send_header(k, str(v))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt: str, *args) -> None:  # quiet test output
            pass

    return Handler


def serve(engine: Engine, port: int = 0) -> ThreadingHTTPServer:
    """Start the API on a daemon thread; returns the server (``.server_port``
    for the bound port, ``.shutdown()`` to stop)."""
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
