"""End-to-end coverage for the linear-band (``delta_hz``) product family.

The reference's selector grammar maps ``"50hz"`` → ``freq_type='delta_hz',
freq_value=50`` with band columns ``0, 50, 100, …``
(``app/services/get_timeseries.py:84-98``, ``docs/upstream-notes.md:142``).
The engine's catalog/serving layers have always parsed the grammar; this
module proves a linear-Hz product actually FLOWS — staged archive +
partitioned data → catalog → preflight validation → ``/timeseries/psd`` and
``/aggregations/psd`` → JSON envelope + X-headers — the path a dashboard
user selecting ``delta_f=50hz`` exercises.
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.http_api import serve
from ambient_sound_analysis_api_spark.serving import Engine
from ambient_sound_analysis_api_spark.sources.domain import materialize_domain
from ambient_sound_analysis_api_spark.sources.ingest import write_partitioned

WS, WE = "2024-01-05T00:00:00", "2024-01-07T00:00:00"
HZ_BANDS = [float(b) for b in range(0, 550, 50)]  # 0, 50, …, 500


def _stage_50hz_product(spark, root: str) -> None:
    """Append a 50hz linear-band product for hydrophone 'click' (hourly
    samples over Jan 2024) to an already-materialized domain root."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(hours=h), b, float(b) / 10.0 + (h % 24))
        for h in range(31 * 24)
        for b in HZ_BANDS
    ]
    long_df = spark.createDataFrame(
        rows, "ts timestamp, band_hz double, value double"
    ).select(
        F.lit("click").alias("hydrophone"),
        F.lit(1).cast("int").alias("delta_t"),
        F.lit("delta_hz").alias("freq_type"),
        F.lit(50).cast("int").alias("delta_f"),
        "ts", "band_hz", "value",
    )
    write_partitioned(long_df, f"{root}/data", mode="append")

    keys_path = f"{root}/archive_keys.parquet"
    existing = [r["key"] for r in spark.read.parquet(keys_path).collect()]
    existing.append(
        "archive/click/20240101T000000_20240201T000000_1s_50hz.parquet"
    )
    spark.createDataFrame([(k,) for k in existing], "key string").write.mode(
        "overwrite"
    ).parquet(keys_path)


@pytest.fixture(scope="module")
def api50(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hz_domain"))
    materialize_domain(spark, sf_dir, root)
    _stage_50hz_product(spark, root)
    httpd = serve(Engine(spark, root), validate_responses=True)
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return json.loads(resp.read()), dict(resp.headers)


def test_options_lists_delta_hz_product(api50):
    body, _ = _get(f"{api50}/options")
    assert "delta_hz" in body["CLICK"]
    assert "50,1" in body["CLICK"]["delta_hz"]


def test_psd_timeseries_50hz(api50):
    body, headers = _get(
        f"{api50}/timeseries/psd?hydrophone=click&start={WS}&end={WE}"
        f"&delta_f=50hz"
    )
    assert body["delta_f"] == "50hz"
    assert body["frequencies"] == [str(b) for b in HZ_BANDS]
    assert int(headers["X-Frequency-Count"]) == len(HZ_BANDS)
    assert int(headers["X-Time-Count"]) == len(body["times"]) == 48
    assert body["times"] == sorted(body["times"])
    # staged value law: value = band/10 + hour-of-day
    first = dict(zip(body["frequencies"], body["values"][0]))
    assert first["500.0"] == pytest.approx(50.0 + 0.0)


def test_psd_heatmap_50hz(api50):
    body, headers = _get(
        f"{api50}/aggregations/psd?hydrophone=click&start={WS}&end={WE}"
        f"&interval=1h&delta_f=50hz"
    )
    assert body["delta_f"] == "50hz"
    assert body["frequencies"] == [str(b) for b in HZ_BANDS]
    assert len(body["times"]) == int(headers["X-Time-Count"]) == 48
    assert all(len(row) == len(HZ_BANDS) for row in body["values"])
    # hourly buckets of hourly samples: mean == the staged value law
    cell = dict(zip(body["frequencies"], body["values"][0]))
    assert cell["100.0"] == pytest.approx(10.0 + 0.0)


def test_3oct_unaffected_by_staged_hz_product(api50):
    """The octave product still serves its own bands — no cross-product
    bleed from the staged linear-band data."""
    body, _ = _get(
        f"{api50}/aggregations/psd?hydrophone=view&start={WS}&end={WE}"
        f"&interval=1h&delta_f=3oct"
    )
    assert "0.0" not in body["frequencies"]
    assert body["delta_f"] == "3oct"


def test_unstaged_hz_resolution_rejected(api50):
    """delta_f=25hz parses but has no archive coverage → preflight 400."""
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(
            f"{api50}/timeseries/psd?hydrophone=click&start={WS}&end={WE}"
            f"&delta_f=25hz"
        )
    assert exc.value.code == 400
