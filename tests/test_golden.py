"""Golden-file gate for the deterministic no-SQL-oracle queries.

These queries (MinHash/SimHash/LSH/FFT families) are exactly reproducible —
fixed hash functions, seeded planes, synthesized PCM — so their committed
sf0.001 goldens must match byte-for-byte on every run. Staleness handling
(driver-side testdata regeneration) must downgrade gracefully, never FAIL
against outputs of different inputs.
"""

from __future__ import annotations

import json

import pytest

import __spark_entry__ as entrymod
from ambient_sound_analysis_api_spark.golden import (
    GOLDEN_QUERIES,
    check_golden,
    golden_path,
    load_golden,
)
from ambient_sound_analysis_api_spark.oracle_compare import fetch_spark_pandas


@pytest.mark.parametrize("name", sorted(GOLDEN_QUERIES))
def test_golden_matches_current_output(spark, sf_dir, name):
    golden = load_golden(name, sf_dir)
    assert golden is not None, (
        f"missing committed golden {golden_path(name, sf_dir)}; run "
        "scripts/check_oracle.py --update-golden"
    )
    cols, rows = fetch_spark_pandas(entrymod.queries()[name](spark, sf_dir))
    status, problems = check_golden(golden, sf_dir, cols, rows)
    assert status == "ok", f"{name}: {status} {problems}"


def test_stale_inputs_detected_not_failed(spark, sf_dir, tmp_path):
    """A golden recorded against different input bytes reports 'stale', not
    a value mismatch — the downgrade path for driver testdata regens."""
    name = "sim_lsh_hyperplane"
    golden = dict(load_golden(name, sf_dir))
    golden["inputs"] = {"embeddings": "0" * 64}
    cols, rows = fetch_spark_pandas(entrymod.queries()[name](spark, sf_dir))
    status, problems = check_golden(golden, sf_dir, cols, rows)
    assert status == "stale"
    assert "regenerate" in problems[0]


def test_fresh_inputs_wrong_hash_fails(spark, sf_dir):
    """Same inputs + different recorded output = a real regression: FAIL."""
    name = "sim_lsh_multiprobe"
    golden = dict(load_golden(name, sf_dir))
    golden["value_hash"] = "deadbeef" * 8
    cols, rows = fetch_spark_pandas(entrymod.queries()[name](spark, sf_dir))
    status, problems = check_golden(golden, sf_dir, cols, rows)
    assert status == "fail"
    assert any("value-hash" in p for p in problems)


def test_golden_files_are_self_describing():
    for name in GOLDEN_QUERIES:
        g = load_golden(name, "/root/testdata/sf0.001")
        assert g is not None
        assert set(g) >= {"query", "inputs", "n_rows", "columns", "value_hash"}
        assert g["query"] == name and g["n_rows"] > 0
        json.dumps(g)  # round-trippable
