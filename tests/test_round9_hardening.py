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


def test_representative_pairs_expand_equals_raw(spark):
    """Row-for-row equivalence: expanding the collapsed representative
    pairs through the membership table reconstructs exactly the raw
    ngram_jaccard_pairs output (same n/threshold, uncapped universe),
    and sum(n_expanded) equals the raw pair count."""
    from ambient_sound_analysis_api_spark.operators import dedup

    base = [
        ("the quick brown fox jumps over the lazy dog today", 3),
        ("the quick brown fox jumps over the lazy cat today", 2),
        ("completely different text about spark query engines here", 1),
        ("tiny", 2),  # < 3 tokens: shingle-less, pairs with nothing
    ]
    rows, did = [], 0
    for txt, copies in base:
        for _ in range(copies):
            rows.append((did, txt))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    raw = dedup.ngram_jaccard_pairs(
        df, n=3, threshold=0.2, max_shingle_df=None
    )
    rep = dedup.representative_near_pairs(
        df, n=3, threshold=0.2, max_shingle_df=None
    )
    membership = dedup.doc_representatives(df)
    expanded = dedup.expand_representative_pairs(rep, membership)

    a = sorted((r.id_a, r.id_b, r.jaccard) for r in raw.collect())
    b = sorted((r.id_a, r.id_b, r.jaccard) for r in expanded.collect())
    assert a == b and len(a) > 0

    rep_rows = rep.collect()
    assert sum(r.n_expanded for r in rep_rows) == len(a)
    # shape: 1 cross rep-pair (dog≈cat), diagonals for the two multi-copy
    # shingled groups; the shingle-less 'tiny' group emits NO diagonal
    cross = [r for r in rep_rows if r.id_a != r.id_b]
    diag = [r for r in rep_rows if r.id_a == r.id_b]
    assert len(cross) == 1 and cross[0].n_expanded == 6  # 3 × 2 copies
    assert len(diag) == 2
    assert {r.n_expanded for r in diag} == {3, 1}  # C(3,2), C(2,2)
