from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.sources.catalog import (
    build_catalog,
    key_matches_hydrophone,
    keys_from_listing,
    parse_archive_keys,
)

KEYS = [
    # well-formed: 2 months broadband @1s, 1 month 3oct @1s, 1 month 50hz @10s
    "arch/orcasound_lab/20200101T000000_20200201T000000_1s_broadband.parquet",
    "arch/orcasound_lab/20200201T000000_20200301T000000_1s_broadband.parquet",
    "arch/orcasound_lab/20200101T000000_20200201T000000_1s_3oct.parquet",
    "arch/orcasound_lab/20200101T000000_20200201T000000_10s_50hz.parquet",
    # reference failure modes (docs/upstream-notes.md:19-25; get_options.py:111-120)
    "arch/orcasound_lab/bush.parquet",              # malformed → skipped
    "arch/orcasound_lab/readme.txt",                # non-parquet → filtered
    "arch/orcasound_lab/ancient_20200101T000000_20200201T000000_1s_broadband.parquet",
]


def test_parse_skips_malformed_and_filters(spark):
    parsed = parse_archive_keys(keys_from_listing(spark, KEYS)).collect()
    assert len(parsed) == 4
    assert all(r["hydrophone"] == "ORCASOUND_LAB" for r in parsed)


def test_catalog_coverage(spark):
    cat = build_catalog(keys_from_listing(spark, KEYS)).collect()
    by_key = {(r["freq_type"], r["delta_f"], r["delta_t"]): r for r in cat}
    bb = by_key[("broadband", None, 1)]
    assert bb["file_count"] == 2
    assert bb["first_start"] == datetime(2020, 1, 1)
    assert bb["last_end"] == datetime(2020, 3, 1)
    assert ("octave_bands", 3, 1) in by_key
    assert ("delta_hz", 50, 10) in by_key


def test_key_matches_hydrophone(spark):
    df = spark.createDataFrame(
        [
            ("bucket/orcasound_lab/a.parquet",),
            ("bucket/hydrophone=orcasound_lab/a.parquet",),
            ("bucket/sunset_bay/a.parquet",),
        ],
        "key string",
    )
    kept = df.filter(key_matches_hydrophone(F.col("key"), "orcasound_lab")).collect()
    assert len(kept) == 2
