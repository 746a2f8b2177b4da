"""Round-11 hardening: ADVICE-item regression tests.

- ``incremental_minhash_pairs`` defends against id overlap between the
  delta batch and the standing corpus (the disjoint-id contract is now
  enforced by an anti-join, not assumed).
- ``bench._load_baseline`` degrades to no-baseline on a dangling
  ``--baseline`` flag instead of crashing the run.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_minhash_overlapping_ids(spark):
    """An id present in BOTH new_df and corpus_df must contribute exactly
    one signature row (the new version), not duplicate candidate pairs
    with conflicting est_jaccard (ADVICE round-10)."""
    from ambient_sound_analysis_api_spark.operators.dedup import (
        incremental_minhash_pairs,
    )

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [
            (1, text_a),
            (2, text_a + " tail"),
            # id 3's CORPUS version: unrelated text
            (3, "completely different corpus content with many words here"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # id 3 re-submitted in the delta with near-dup-of-1 text
            (3, text_a + " x"),
            (10, text_a),
        ],
        "doc_id long, text string",
    )
    out = incremental_minhash_pairs(
        new, corpus, num_hashes=32, bands=8, n=3, threshold=0.3
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    # no duplicated pair rows despite the id-3 overlap
    assert len(pairs) == len(set(pairs))
    # the pair (1, 3) must reflect the NEW id-3 text (near-dup of 1);
    # the corpus version of id 3 shares no shingles with doc 1
    m = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out}
    assert (1, 3) in m and m[(1, 3)] >= 0.3
    # and every (1,3)/(3,10) row is tagged with exactly one side
    sides = {
        (r["id_a"], r["id_b"]): r["side"] for r in out
    }
    assert sides[(1, 3)] == "cross"
    if (3, 10) in sides:
        assert sides[(3, 10)] == "batch"


def test_bench_baseline_flag_bounds():
    """`--baseline` as the trailing argument degrades to None (with a
    stderr note), never IndexError (ADVICE round-10)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench._load_baseline(["--baseline"]) is None
    assert bench._load_baseline(["--no-baseline"]) is None


def test_ivfpq_stale_eviction_tombstones(tmp_path):
    """Evicting a stale persisted index defers the rmtree to process
    exit: the old directory must still exist right after eviction (a
    lazy DataFrame may reference it) and be listed for atexit reclaim
    (ADVICE round-10)."""
    from ambient_sound_analysis_api_spark import registry as R

    old = tmp_path / "stale_idx"
    old.mkdir()
    (old / "part-0.parquet").write_bytes(b"x")
    stale_key = ((str(tmp_path / "t.parquet"), 1, 1), 4, 8, 2, "cellidx")
    fresh_key = ((str(tmp_path / "t.parquet"), 2, 2), 4, 8, 2, "cellidx")
    R._IVFPQ_INDEX_MEMO[stale_key] = str(old)
    try:
        # replicate the registry eviction path: same table path, new
        # fingerprint → stale entry tombstoned, not rmtree'd
        stale = [
            k for k in R._IVFPQ_INDEX_MEMO
            if k[0][0] == fresh_key[0][0] and k[0] != fresh_key[0]
        ]
        for k in stale:
            R._IVFPQ_TOMBSTONES.append(R._IVFPQ_INDEX_MEMO.pop(k))
        R._IVFPQ_INDEX_MEMO[fresh_key] = str(tmp_path / "fresh_idx")
        assert old.exists(), "stale dir must survive until process exit"
        assert str(old) in R._IVFPQ_TOMBSTONES
        R._cleanup_index_stores()
        assert not old.exists(), "atexit hook must reclaim tombstones"
        assert not R._IVFPQ_TOMBSTONES and not R._IVFPQ_INDEX_MEMO
    finally:
        R._IVFPQ_INDEX_MEMO.pop(stale_key, None)
        R._IVFPQ_INDEX_MEMO.pop(fresh_key, None)
