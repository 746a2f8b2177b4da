"""Round-15 fixes: bench contention-guard keying + ADVICE cache hygiene.

The round-14 judged bench was a drift-2.397 contended run printed RAW
because the quiet-representative record was keyed on the git HEAD — and
the commit that published the record moved HEAD, invalidating it. These
pin the round-15 re-keying (working-tree source fingerprint, per-cpus
records, contended baselines skipped) and the ADVICE-flagged cache
behaviors.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_baseline_skips_contended_round_files(tmp_path):
    """A committed round record stamped contended must not become the
    drift baseline: normalizing against contention inverts the guard
    (an equally-contended run reads drift ~1.0 and evades the >1.25
    substitution threshold)."""
    doc = {
        "parsed": {
            "metric": "headline_total_runtime",
            "value": 100.0,
            "queries": {"q": 1.0},
            "sf": 0.1,
            "contended": True,
        }
    }
    p = tmp_path / "BENCH_r98.json"
    p.write_text(json.dumps(doc))
    assert bench._parse_baseline_file(str(p)) is None
    doc["parsed"].pop("contended")
    p.write_text(json.dumps(doc))
    got = bench._parse_baseline_file(str(p))
    assert got is not None and got[1] == {"q": 1.0}


def test_code_fingerprint_is_deterministic_and_source_keyed(tmp_path):
    """Same tree → same fingerprint; non-source artifacts (logs, JSON)
    don't participate, so committing a bench log cannot invalidate the
    quiet-representative record (the round-14 failure mode)."""
    a = bench._code_fingerprint()
    b = bench._code_fingerprint()
    assert a == b
    assert len(a) == 16 and all(c in "0123456789abcdef" for c in a)
    # the walk only hashes .py files under the package + the two entry
    # points — nothing under logs/ — so a changed log leaves it fixed
    logs = os.path.join(REPO, "logs")
    probe = os.path.join(logs, "_fingerprint_probe.tmp")
    os.makedirs(logs, exist_ok=True)
    try:
        with open(probe, "w") as f:
            f.write("x")
        assert bench._code_fingerprint() == a
    finally:
        if os.path.exists(probe):
            os.remove(probe)


def test_kcenter_error_path_releases_caches(spark):
    """kcenter_greedy must not leak its per-round persist when k exceeds
    the distinct input rows (round-14 ADVICE: the raw persist survived
    the ValueError and release_caches could not free it)."""
    from ambient_sound_analysis_api_spark.operators.clustering import (
        kcenter_greedy,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = {t.id() for t in jsc.getRDDStorageInfo()}
    with pytest.raises(ValueError, match="exceeds"):
        kcenter_greedy(df, k=5)
    after = {t.id() for t in jsc.getRDDStorageInfo()}
    assert after <= before, "error path left a persisted round frame live"


def test_standardize_skips_persist_when_already_cached(spark):
    """standardize must not stack a second cache entry on a frame the
    caller already persisted (round-14 ADVICE)."""
    from ambient_sound_analysis_api_spark.operators import caching
    from ambient_sound_analysis_api_spark.operators.mlfit import standardize

    df = spark.createDataFrame(
        [(0.0, 1.0), (1.0, 3.0), (2.0, 5.0)], "a double, b double"
    ).persist()
    try:
        df.count()
        tracked_before = len(caching._TRACKED)
        out = standardize(df, ["a", "b"])
        out.count()
        assert len(caching._TRACKED) == tracked_before, (
            "standardize tracked_persist-ed an already-cached frame"
        )
    finally:
        df.unpersist()


def test_bpe_apply_long_merge_list_truncates_lineage(spark):
    """bpe_apply past _APPLY_CHECKPOINT_EVERY merges must still produce
    the greedy-left encoding (the checkpoint is transparent)."""
    from ambient_sound_analysis_api_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "abababab abab"), (2, "abab")], "doc_id long, text string"
    )
    # 13 merges (> _APPLY_CHECKPOINT_EVERY = 12): first merge is real,
    # the rest are no-ops on this corpus — output must equal the
    # single-merge encoding
    merges = [("a", "b")] + [("q", chr(ord("a") + i)) for i in range(12)]
    assert len(merges) > lm._APPLY_CHECKPOINT_EVERY

    def seqs(out_rows):
        # compare (word, freq, ordered symbol sequence): the raw position
        # column is re-densified every round (with or without the
        # checkpoint), so no-op rounds legally renumber it
        by_word: dict = {}
        for r in sorted(out_rows, key=lambda r: (r["word"], r["i"])):
            by_word.setdefault((r["word"], r["freq"]), []).append(r["s"])
        return by_word

    long_out = seqs(lm.bpe_apply(docs, merges).collect())
    short_out = seqs(lm.bpe_apply(docs, [("a", "b")]).collect())
    assert long_out == short_out
