"""Round-9 hardening: fit-memo eviction precision and the
embedding_near_pairs truncation warning (the knn_graph contract)."""

from __future__ import annotations

import warnings


def test_memo_put_same_fingerprint_params_coexist():
    """Two fits of the SAME dataset with different params must coexist —
    eviction is for stale fingerprints only, not sibling param keys
    (evicting siblings would turn the memo into refit-per-invocation)."""
    from ambient_sound_analysis_api_spark.registry import _memo_put

    memo: dict = {}
    fp = (("/x/embeddings.parquet", 111, 222),)
    k1 = fp + (4, 8, 2)
    k2 = fp + (8, 16, 2)
    _memo_put(memo, k1, "a")
    _memo_put(memo, k2, "b")
    assert memo == {k1: "a", k2: "b"}

    # a regenerated dataset (new fingerprint, same path) evicts ALL old
    # fingerprints for that path, regardless of params
    fp2 = (("/x/embeddings.parquet", 999, 222),)
    k3 = fp2 + (4, 8, 2)
    _memo_put(memo, k3, "c")
    assert memo == {k3: "c"}

    # other table paths are never touched
    other = (("/y/documents.parquet", 1, 1), 7)
    _memo_put(memo, other, "d")
    _memo_put(memo, fp2 + (8, 16, 2), "e")
    assert other in memo and k3 in memo


def test_embedding_near_pairs_warns_when_cap_engages(spark):
    from ambient_sound_analysis_api_spark.operators.dedup import (
        embedding_near_pairs,
    )

    rows = [(i, 0, [float(i % 3) + 1.0, 1.0]) for i in range(12)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        embedding_near_pairs(emb, threshold=0.0, max_block_size=4)
        assert any("hash-split" in str(x.message) for x in w)
    # lazy opt-out stays silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        embedding_near_pairs(
            emb, threshold=0.0, max_block_size=4, warn_on_truncation=False
        )
        assert not any("hash-split" in str(x.message) for x in w)
    # under-cap blocks stay silent too
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        embedding_near_pairs(emb, threshold=0.0, max_block_size=100)
        assert not any("hash-split" in str(x.message) for x in w)
