"""Round-14 optimization equivalence pins.

Each optimization that changed an operator's internals gets a direct
equivalence test against the shape it replaced, on an inline corpus built
to exercise the tricky cases (duplicate groups, shared shingles, greedy-
left overlap runs), so a future refactor cannot silently drift from the
pre-optimization semantics the oracles were proven against.
"""

from __future__ import annotations

import pyspark.sql.functions as F


DOCS = [
    # duplicate clique (exact copies) + near-dups sharing shingles
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "the quick brown fox jumps over the lazy cat again and again"),
    (4, "a completely different document about spark query planning"),
    (5, "another document about spark query planning and shuffles"),
    # overlap-run stress for greedy-left BPE apply ("aaaa" chains)
    (6, "aaaa aaa aa baaa aab banana bananas"),
    (7, "aaaa aaa aa baaa aab banana bananas"),
    (8, "short"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pair_intersections_match_self_join(spark):
    """The posting-group pair generator must emit exactly the self-join's
    (id_a, id_b, inter) multiset — the shape the jaccard oracles replay."""
    from ambient_sound_analysis_api_spark.functions.text import (
        token_ngram_hashes,
    )
    from ambient_sound_analysis_api_spark.operators.dedup import (
        _pair_intersections,
    )

    df = _docs_df(spark)
    sh = df.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(token_ngram_hashes(F.col("text"), 3))
        ).alias("shingle"),
    )
    groups = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    got = {
        (r["id_a"], r["id_b"]): r["inter"]
        for r in _pair_intersections(groups).collect()
    }
    a, b = sh.alias("a"), sh.alias("b")
    want = {
        (r["id_a"], r["id_b"]): r["inter"]
        for r in (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .agg(F.count("*").alias("inter"))
            .collect()
        )
    }
    assert got == want and got  # non-trivial: shared shingles exist


def test_connected_components_edge_induced_equals_full(spark):
    """Edge-induced iteration + singleton attach must reproduce the full
    min-label fixpoint, including singletons keeping their own id."""
    from ambient_sound_analysis_api_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        # two components (one a chain, one a triangle) + singletons 7, 9
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 8), (5, 8)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 6, 7, 8, 9)], "id long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges, nodes, node_col="id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 5, 7: 7, 9: 9}


def test_bpe_apply_matches_trainer_symbols(spark):
    """bpe_apply over the trained merge list must produce the identical
    final symbol table bpe_train(return_symbols=True) ends with — the
    equivalence the memoized encode entry relies on."""
    from ambient_sound_analysis_api_spark.operators.lm import (
        bpe_apply,
        bpe_train,
    )

    docs = _docs_df(spark)
    mdf, sym_trainer = bpe_train(docs, n_rounds=3, return_symbols=True)
    merges = [(r["a"], r["b"]) for r in mdf.orderBy("round").collect()]
    assert merges  # the inline corpus must actually train merges
    want = sorted(
        map(tuple, sym_trainer.select("word", "freq", "i", "s").collect())
    )
    got = sorted(
        map(
            tuple,
            bpe_apply(docs, merges).select("word", "freq", "i", "s").collect(),
        )
    )
    assert got == want


def test_scd2_apply_unchanged_by_persists(spark):
    """scd2_apply's cached batch frames must not change the applied
    history (no-op suppression, close+open, insert)."""
    from ambient_sound_analysis_api_spark.operators.scd import scd2_apply

    current = spark.createDataFrame(
        [
            (1, "a", "2024-01-01", None),
            (2, "b", "2024-01-01", None),
            (3, "c", "2023-01-01", "2024-01-01"),  # closed history row
            (3, "c2", "2024-01-01", None),
        ],
        "k long, v string, valid_from string, valid_to string",
    )
    changes = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "new")], "k long, v string"
    )
    rows = sorted(
        map(
            tuple,
            scd2_apply(
                current,
                changes,
                key_cols=["k"],
                compare_cols=["v"],
                effective_date="2024-06-01",
            ).collect(),
        )
    )
    assert rows == sorted(
        [
            (1, "a", "2024-01-01", None),          # no-op stays open
            (2, "b", "2024-01-01", "2024-06-01"),  # closed
            (2, "B", "2024-06-01", None),          # new version opened
            (3, "c", "2023-01-01", "2024-01-01"),  # closed history intact
            (3, "c2", "2024-01-01", None),         # untouched open row
            (4, "new", "2024-06-01", None),        # insert
        ]
    )
