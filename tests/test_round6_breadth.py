"""Unit tests for the round-6 breadth additions: PageRank over the dup
graph, BPE merge-pair counting, preference-pair assembly, and the
cross-source shingle-containment matrix."""

from __future__ import annotations

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.contamination import (
    source_overlap_matrix,
)
from ambient_sound_analysis_api_spark.operators.graph import pagerank
from ambient_sound_analysis_api_spark.operators.lm import bpe_pair_counts
from ambient_sound_analysis_api_spark.registry import (
    q_pipeline_preference_pairs,
)


def _pr(spark, edges, n_nodes, **kw):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = spark.range(n_nodes).select(F.col("id").alias("id"))
    return {
        r.id: r for r in pagerank(e, n, node_col="id", **kw).collect()
    }


def test_pagerank_isolated_nodes_hold_teleport_floor(spark):
    """With no edges at all, every node keeps (1-d)/N forever."""
    out = _pr(spark, [(0, 1)], 4)
    # nodes 2,3 are isolated: rank = 0.15/4, degree 0
    assert out[2].degree == 0 and out[3].degree == 0
    assert abs(out[2].pagerank - 0.15 / 4) < 1e-9
    assert out[2].pagerank == out[3].pagerank


def test_pagerank_symmetry_and_hub_dominance(spark):
    """A star graph: the hub out-ranks every leaf; leaves tie exactly
    (identical structural position → identical rounded rank)."""
    edges = [(0, i) for i in range(1, 6)]
    out = _pr(spark, edges, 6)
    assert out[0].degree == 5
    leaf_ranks = {out[i].pagerank for i in range(1, 6)}
    assert len(leaf_ranks) == 1
    assert out[0].pagerank > leaf_ranks.pop()


def test_pagerank_two_cliques_rank_by_size(spark):
    """Members of a larger clique accumulate more mass than members of a
    smaller one (degree drives rank within this undirected variant)."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(10, 11)]
    out = _pr(spark, k4 + k2, 12)
    assert out[0].pagerank > out[10].pagerank


def test_bpe_pairs_weighted_by_word_frequency(spark):
    """'aba' contributes (a,b) and (b,a) once per occurrence; with two
    occurrences plus one 'ab', (a,b) totals 3 and (b,a) totals 2."""
    docs = spark.createDataFrame(
        [(0, "aba aba ab"), (1, "xy")], "doc_id long, text string"
    )
    out = {(r.a, r.b): r.pair_freq for r in bpe_pair_counts(docs).collect()}
    # (a,b): once in each of 2 'aba' + once in 'ab' = 3
    assert out[("a", "b")] == 3
    assert out[("b", "a")] == 2
    assert out[("x", "y")] == 1


def test_bpe_repeated_symbol_counts_every_adjacency(spark):
    """'aaa' carries TWO (a,a) adjacencies — positions, not distinct pairs."""
    docs = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    out = {(r.a, r.b): r.pair_freq for r in bpe_pair_counts(docs).collect()}
    assert out[("a", "a")] == 2


def test_bpe_single_char_words_dropped(spark):
    docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    assert bpe_pair_counts(docs).count() == 0


def test_preference_pairs_margin_positive_and_deterministic(spark, sf_dir):
    rows = q_pipeline_preference_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.chosen_value > r.rejected_value
        assert r.chosen_id != r.rejected_id
        assert abs(r.margin - round(r.chosen_value - r.rejected_value, 6)) < 1e-12
    # one pair per (user, type) group
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))


def test_source_overlap_containment_bounds_and_direction(spark):
    """B's shingles are a subset of A's larger set: containment(B→A) = 1,
    containment(A→B) < 1; a disjoint source C never appears."""
    a_text = "alpha beta gamma delta epsilon zeta"
    b_text = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(0, a_text, "A"), (1, b_text, "B"), (2, "one two three four", "C")],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(docs, n=3).collect()
    }
    # A has 4 3-gram shingles, B has 2 (both present in A)
    assert out[("B", "A")].containment == 1.0
    assert out[("A", "B")].n_overlap == 2
    assert abs(out[("A", "B")].containment - 0.5) < 1e-9
    assert ("A", "C") not in out and ("C", "A") not in out
