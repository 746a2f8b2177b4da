"""Round-10 scale compositions: representative-first clustering and the
identical-vector collapse for the embedding-cosine pair family.

Both promote the round-9 collapse pattern to the operators a crawl
pipeline actually runs: clustering consumes the REPRESENTATIVE near-dup
graph (cost bounded by distinct-text count), and the embedding pair scan
collapses bit-identical vectors before the within-block join. The tests
pin the equivalence contracts: same cluster assignment as the raw
pipeline, and row-for-row pair reconstruction via the expansion helper.
"""

from __future__ import annotations

import pytest


def _dup_heavy_docs(spark):
    base = [
        ("the quick brown fox jumps over the lazy dog today", 4),
        ("the quick brown fox jumps over the lazy cat today", 3),
        ("a completely different text about spark query engines here", 2),
        ("spark query engines here are a completely different topic today",
         1),
        ("tiny", 3),  # < 3 tokens: shingle-less — invisible to Jaccard
    ]
    rows, did = [], 0
    for txt, copies in base:
        for _ in range(copies):
            rows.append((did, txt))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_representative_clusters_equal_raw_pipeline(spark):
    """(doc_id, cluster_id) must match connected components over the RAW
    pair graph exactly for every doc the shingle representation can see
    (uncapped universe, so both pipelines share Jaccard semantics) — and
    must IMPROVE on it for exact copies of shingle-less docs, which the
    Jaccard graph leaves as singletons but the content-hash collapse
    correctly merges."""
    from ambient_sound_analysis_api_spark.operators import dedup
    from ambient_sound_analysis_api_spark.operators.graph import (
        connected_components,
    )

    df = _dup_heavy_docs(spark)
    raw_edges = dedup.ngram_jaccard_pairs(
        df, n=3, threshold=0.2, max_shingle_df=None
    )
    raw = connected_components(
        raw_edges, df.select("doc_id"), node_col="doc_id"
    )
    rep = dedup.representative_clusters(
        df, n=3, threshold=0.2, max_shingle_df=None
    )
    a = dict(sorted((r.doc_id, r.cluster_id) for r in raw.collect()))
    b = dict(sorted((r.doc_id, r.cluster_id) for r in rep.collect()))
    assert len(b) == df.count() == len(a)
    # shingled docs (ids 0-9): identical assignment
    assert {d: c for d, c in a.items() if d < 10} == {
        d: c for d, c in b.items() if d < 10
    }
    # dog≈cat near-dups + their copies merge into one cluster at doc 0
    assert {b[i] for i in range(7)} == {0}
    # the 'tiny' copies (10-12): raw leaves singletons, rep merges them
    assert [a[i] for i in (10, 11, 12)] == [10, 11, 12]
    assert [b[i] for i in (10, 11, 12)] == [10, 10, 10]


def test_representative_clusters_match_registry_raw_at_sf(spark, sf_dir):
    """At the test SF the shingle-df cap never binds, so the
    representative-first registry query must equal the raw
    dedup_clusters registry query row-for-row."""
    from ambient_sound_analysis_api_spark.registry import queries

    qs = queries()
    raw = sorted(map(tuple, qs["dedup_clusters"](spark, sf_dir).collect()))
    rep = sorted(
        map(
            tuple,
            qs["dedup_clusters_representative"](spark, sf_dir).collect(),
        )
    )
    assert raw == rep and len(raw) > 0


def _dup_heavy_emb(spark):
    rows = []
    vid = 0
    # block 0: vector A ×4 copies, near-dup A' ×2, orthogonal-ish B ×1
    for _ in range(4):
        rows.append((vid, 0, [1.0, 0.0, 1.0, 0.5])); vid += 1
    for _ in range(2):
        rows.append((vid, 0, [1.0, 0.1, 1.0, 0.5])); vid += 1
    rows.append((vid, 0, [-1.0, 1.0, 0.0, -0.5])); vid += 1
    # block 1: identical copies of A again (must NOT pair with block 0)
    for _ in range(3):
        rows.append((vid, 1, [1.0, 0.0, 1.0, 0.5])); vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_vector_representatives_membership(spark):
    from ambient_sound_analysis_api_spark.operators.dedup import (
        vector_representatives,
    )

    emb = _dup_heavy_emb(spark)
    m = {
        r.vec_id: (r.rep_id, r.n_copies)
        for r in vector_representatives(emb, block_col="label").collect()
    }
    assert m[0] == (0, 4) and m[3] == (0, 4)      # A copies in block 0
    assert m[4] == (4, 2) and m[5] == (4, 2)      # A' copies
    assert m[6] == (6, 1)                          # singleton B
    assert m[7] == (7, 3) and m[9] == (7, 3)      # A copies in block 1


def test_representative_embedding_pairs_expand_equals_raw(spark):
    """Expanding the collapsed embedding pairs through the per-block
    vector membership reconstructs the raw blocked pair set row-for-row,
    with no cross-block pairs between identical vectors."""
    from ambient_sound_analysis_api_spark.operators import dedup

    emb = _dup_heavy_emb(spark)
    raw = dedup.embedding_near_pairs(
        emb, threshold=0.3, max_block_size=None, warn_on_truncation=False
    )
    rep = dedup.representative_embedding_pairs(emb, threshold=0.3)
    membership = dedup.vector_representatives(emb, block_col="label")
    expanded = dedup.expand_representative_pairs(
        rep, membership, id_col="vec_id", score_col="cosine_sim"
    )

    a = sorted((r.id_a, r.id_b, r.cosine_sim) for r in raw.collect())
    b = sorted((r.id_a, r.id_b, r.cosine_sim) for r in expanded.collect())
    assert a == b and len(a) > 0

    rep_rows = rep.collect()
    assert sum(r.n_expanded for r in rep_rows) == len(a)
    diag = {r.id_a: r.n_expanded for r in rep_rows if r.id_a == r.id_b}
    # C(4,2)=6 for A in block 0, C(2,2)=1 for A', C(3,2)=3 in block 1
    assert diag == {0: 6, 4: 1, 7: 3}
    # cross rows never bridge blocks: ids 0-6 are block 0, 7-9 block 1
    cross = [r for r in rep_rows if r.id_a != r.id_b]
    assert all((r.id_a < 7) == (r.id_b < 7) for r in cross)
    # output bounded by distinct-(block, vector) pairs: 1 cross row
    # (A≈A', 4×2 copies) + 3 diagonals stand for all 18 raw pairs
    assert len(cross) == 1 and cross[0].n_expanded == 8
    assert len(a) == 6 + 1 + 3 + 8  # A-clique + A'-clique + blk1 + A×A'


def test_representative_embedding_pairs_zero_vector_clique(spark):
    """Cosine is undefined for the all-zero vector: the RAW operator
    raises DIVIDE_BY_ZERO under ANSI the moment a zero vector meets any
    candidate, while the collapsed form turns an isolated all-zero copy
    clique into one lone representative (meets nothing) and emits no
    diagonal — degrading to 'no pairs' instead of a failed stage."""
    import pytest as _pytest

    from ambient_sound_analysis_api_spark.operators import dedup

    rows = [(0, 0, [1.0, 0.5]), (1, 0, [1.0, 0.5])] + [
        (i, 1, [0.0, 0.0]) for i in range(2, 5)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        dedup.embedding_near_pairs(
            emb, threshold=0.3, max_block_size=None,
            warn_on_truncation=False,
        ).collect()
    rep = dedup.representative_embedding_pairs(emb, threshold=0.3).collect()
    # one diagonal for the identical nonzero pair, nothing for the zeros
    assert [(r.id_a, r.id_b, r.n_expanded) for r in rep] == [(0, 0, 1)]


def test_representative_embedding_pairs_registry_consistency(spark, sf_dir):
    """On the (dup-free) synthetic embeddings the rep query must equal
    the raw dedup_embedding_cosine plus all-1 multiplicity columns."""
    from ambient_sound_analysis_api_spark.registry import queries

    qs = queries()
    raw = sorted(
        map(tuple, qs["dedup_embedding_cosine"](spark, sf_dir).collect())
    )
    rep = qs["dedup_embedding_cosine_rep"](spark, sf_dir).collect()
    assert all(
        r.n_copies_a == 1 and r.n_copies_b == 1 and r.n_expanded == 1
        for r in rep
    )
    assert sorted((r.id_a, r.id_b, r.cosine_sim) for r in rep) == raw
