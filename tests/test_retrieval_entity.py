"""Unit tests for the retrieval/entity-resolution breadth additions:
FastSS deletion-neighborhood fuzzy matching, inverted-index build, BM25
scoring, PMI collocations, the blocked kNN graph, and item
co-occurrence statistics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.entity import (
    deletion_variants,
    fuzzy_name_pairs,
)
from ambient_sound_analysis_api_spark.operators.lm import pmi_collocations
from ambient_sound_analysis_api_spark.operators.retrieval import (
    bm25_topk,
    inverted_index,
)
from ambient_sound_analysis_api_spark.operators.similarity import knn_graph


# ---------------------------------------------------------------- entity


def test_deletion_variants_contents(spark):
    row = (
        spark.createDataFrame([("abc",)], "s string")
        .select(deletion_variants(F.col("s")).alias("v"))
        .collect()[0]
    )
    assert sorted(row.v) == ["ab", "abc", "ac", "bc"]


def _pairs(spark, names):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rid long, rname string"
    )
    out = fuzzy_name_pairs(df, id_col="rid", name_col="rname")
    return {(r.id_a, r.id_b): r.dist for r in out.collect()}


def test_fuzzy_pairs_catch_all_edit_kinds(spark):
    """Substitution, deletion, and insertion neighbors are all found;
    distance-2 names are not (exactness, not just recall)."""
    got = _pairs(spark, ["smith", "smyth", "smth", "smiith", "jones"])
    # smith~smyth (sub), smith~smth (del), smith~smiith (ins)
    assert got[(0, 1)] == 1 and got[(0, 2)] == 1 and got[(0, 3)] == 1
    # smyth~smth: delete y -> smth, distance 1 as well
    assert got[(1, 2)] == 1
    assert (0, 4) not in got and (1, 4) not in got
    # smyth~smiith is distance 2: must be excluded by verification
    assert (1, 3) not in got


def test_fuzzy_pairs_equal_names_distance_zero(spark):
    got = _pairs(spark, ["dup", "dup", "other"])
    assert got == {(0, 1): 0}


# ------------------------------------------------------------- retrieval


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_inverted_index_counts_and_cap(spark):
    docs = _docs(spark, ["a a b", "a c", "a b", "a", "a"])
    idx = {
        r.term: r
        for r in inverted_index(docs, min_df=1, postings_cap=3).collect()
    }
    assert idx["a"].df == 5 and idx["a"].cf == 6
    assert idx["a"].postings_head == "0,1,2"  # sorted, capped at 3
    assert idx["b"].df == 2 and idx["b"].postings_head == "0,2"
    assert "c" in idx


def test_inverted_index_min_df_prunes(spark):
    docs = _docs(spark, ["a b", "a"])
    terms = {r.term for r in inverted_index(docs, min_df=2).collect()}
    assert terms == {"a"}


def test_bm25_rare_term_outscores_common(spark):
    """A doc hitting the rare query term beats a doc hitting the ubiquitous
    one (idf dominates at equal tf/dl)."""
    docs = _docs(
        spark,
        ["rare common x", "common x y", "common y z", "common z w"],
    )
    out = bm25_topk(docs, ["rare", "common"], k=4).collect()
    assert out[0].doc_id == 0 and out[0].n_terms_hit == 2
    scores = {r.doc_id: r.bm25 for r in out}
    assert scores[0] > max(scores[d] for d in (1, 2, 3))


def test_bm25_length_normalization(spark):
    """Same tf, longer doc → lower score (the b·dl/avgdl penalty)."""
    docs = _docs(spark, ["q", "q pad pad pad pad pad pad", "other"])
    scores = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["q"], k=5).collect()}
    assert scores[0] > scores[1]
    assert 2 not in scores


def test_pmi_perfect_collocation_beats_independent(spark):
    """Tokens that only ever occur together carry higher PMI than a pair
    of independently frequent tokens."""
    texts = ["zig zag filler%d" % i for i in range(30)]
    texts += ["common1 common2" if i % 2 else "common2 common1" for i in range(40)]
    docs = _docs(spark, texts)
    out = {
        (r.a, r.b): r.pmi
        for r in pmi_collocations(docs, min_count=15).collect()
    }
    assert ("zig", "zag") in out
    # zig zag: perfectly dependent; common1/common2 orderings split counts
    indep = [v for k, v in out.items() if "common" in k[0]]
    assert all(out[("zig", "zag")] > v for v in indep)


def test_pmi_value_matches_formula(spark):
    docs = _docs(spark, ["x y"] * 30)
    row = pmi_collocations(docs, min_count=1).collect()
    got = {(r.a, r.b): r for r in row}[("x", "y")]
    # n_ab=30, n_bi=30, c_x=c_y=30, n_uni=60
    expect = round(math.log((30 / 30) / ((30 / 60) * (30 / 60))), 6)
    assert got.n_ab == 30 and abs(got.pmi - expect) < 1e-9


# ------------------------------------------------------------- knn graph


def test_knn_graph_blocked_and_ranked(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 0),
            (3, [1.0, 0.0], 1),  # identical to 0 but different block
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = knn_graph(emb, k=1).collect()
    best = {r.src_id: r for r in rows}
    # neighbors never cross blocks: 0's best is 1, not the identical 3
    assert best[0].nbr_id == 1 and best[0].rank == 1
    # block of size 1 yields no rows for vec 3 (no partner in label 1)
    assert 3 not in {r.src_id for r in rows}
    # k cap: exactly one row per src in block 0
    assert sorted(r.src_id for r in rows) == [0, 1, 2]


def test_knn_graph_k_cap_and_no_self(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = knn_graph(emb, k=2).collect()
    per_src = {}
    for r in rows:
        assert r.src_id != r.nbr_id
        per_src.setdefault(r.src_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2] for v in per_src.values())


# -------------------------------------------------------- co-occurrence


def test_item_cooccurrence_exact_small_case(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import (
        q_rec_item_cooccurrence,
    )

    out = q_rec_item_cooccurrence(spark, sf_dir).collect()
    assert out, "expected event-type pairs"
    for r in out:
        assert r.type_a < r.type_b
        assert 0 < r.n_ab <= min(r.n_a, r.n_b)
        expect_j = round(r.n_ab / (r.n_a + r.n_b - r.n_ab), 4)
        assert abs(r.jaccard - expect_j) < 1e-9


def test_knn_graph_max_block_size_bounds_fanout(spark):
    """With a capacity bound, every sub-block is <= cap so per-source
    candidate fan-out is bounded; results stay deterministic and
    self-free, and sources only pair within their own sub-block."""
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0], 0) for i in range(12)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = knn_graph(emb, k=2, max_block_size=4).collect()
    assert rows, "capped path must still produce neighbors"
    per_src = {}
    for r in rows:
        assert r.src_id != r.nbr_id
        per_src.setdefault(r.src_id, []).append(r.nbr_id)
    # fan-out respects k
    assert all(len(v) <= 2 for v in per_src.values())
    # determinism: second run identical
    rows2 = knn_graph(emb, k=2, max_block_size=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # sub-blocks partition the block: a pair in the capped graph must
    # also be a pair of the exact graph run with unbounded k (same block)
    exact = {
        (r.src_id, r.nbr_id)
        for r in knn_graph(emb, k=11, max_block_size=None).collect()
    }
    assert all((r.src_id, r.nbr_id) in exact for r in rows)


def test_knn_graph_capacity_cap_is_default_on(spark):
    """The probe-proven O(block²) blowup means the capacity bound must be
    the DEFAULT; exact within-block semantics are the explicit opt-out."""
    import inspect

    default = inspect.signature(knn_graph).parameters["max_block_size"].default
    assert default is not None and default >= 64
    # a block larger than the cap gets hash-split: with cap=4 on a
    # 12-row block, no source can pair with all 11 others
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0], 0) for i in range(12)],
        "vec_id long, embedding array<float>, label int",
    )
    capped = knn_graph(emb, k=11, max_block_size=4).collect()
    per_src: dict = {}
    for r in capped:
        per_src.setdefault(r.src_id, set()).add(r.nbr_id)
    assert max(len(v) for v in per_src.values()) < 11


def test_bm25_eval_ndcg_mrr_hand_computed(spark):
    """3-doc corpus, 2-term query: the doc covering BOTH terms (rel 1)
    must outrank the single-term docs, so NDCG@10 and MRR are exactly 1.0
    with one relevant hit; a query no doc fully covers scores all-zero."""
    from ambient_sound_analysis_api_spark.operators.retrieval import bm25_eval

    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    rows = {
        r["query_id"]: r
        for r in bm25_eval(
            docs, [(1, ["x", "y"]), (2, ["x", "z"])], k=10
        ).collect()
    }
    assert rows[1]["ndcg_at_k"] == 1.0
    assert rows[1]["mrr_at_k"] == 1.0
    assert rows[1]["n_rel_at_k"] == 1
    # no doc contains both 'x' and 'z': every grade is 0
    assert rows[2]["ndcg_at_k"] == 0.0
    assert rows[2]["mrr_at_k"] == 0.0
    assert rows[2]["n_rel_at_k"] == 0


def test_bm25_eval_references_hit_the_postings_cache(spark, sf_dir):
    """The query batch must NOT multiply corpus tokenize scans: dl and tf
    are persisted, so every one of their multiple plan references reads
    the cache (InMemoryTableScan) and the parquet tokenize executes only
    while building each cache. (Textual 'Scan parquet' counting is
    useless here — the cached child plan's description still contains the
    scan node it was built from.)"""
    from ambient_sound_analysis_api_spark.operators.caching import (
        release_caches,
    )
    from ambient_sound_analysis_api_spark.operators.retrieval import bm25_eval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bm25_eval(docs, [(1, ["vector"]), (2, ["merge"]), (3, ["hash"])])
    try:
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # stats+score read dl from cache; df+score read tf from cache —
        # at least 4 cache reads replace what were re-tokenize scans
        assert plan.count("InMemoryTableScan") >= 4
    finally:
        release_caches()
