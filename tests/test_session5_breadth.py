"""Unit tests for the session-5 breadth batch: block dedup + rebuild,
hard-negative mining, curriculum ordering, YoY growth, value histogram."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.dedup import block_dedup_rebuild
from ambient_sound_analysis_api_spark.operators.similarity import hard_negatives
from ambient_sound_analysis_api_spark.registry import (
    q_agg_value_histogram,
    q_pipeline_curriculum_order,
    q_tpcds_yoy_growth,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# block_dedup_rebuild


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_block_dedup_removes_shared_block_and_rebuilds(spark):
    # 4-token blocks; docs 1 and 2 share their first block exactly.
    shared = "alpha beta gamma delta"
    rows = [
        (1, f"{shared} one two three four"),
        (2, f"{shared} five six seven eight"),
        (3, "nine ten eleven twelve"),
    ]
    out = {
        r["doc_id"]: r
        for r in block_dedup_rebuild(
            _docs(spark, rows), block_tokens=4, max_df=1
        ).collect()
    }
    assert out[1]["n_blocks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "one two three four"
    assert out[2]["clean_text"] == "five six seven eight"
    # untouched doc keeps everything, order preserved
    assert out[3]["n_kept"] == 1 and out[3]["clean_text"] == rows[2][1]


def test_block_dedup_all_boilerplate_doc_goes_empty(spark):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "x y z w a b c d")]
    out = {
        r["doc_id"]: r
        for r in block_dedup_rebuild(
            _docs(spark, rows), block_tokens=4, max_df=1
        ).collect()
    }
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""
    # doc 3's first block survives; its second block is the shared one
    assert out[3]["clean_text"] == "x y z w"


def test_block_dedup_order_preserved_across_dropped_middle(spark):
    # the shared block sits in the MIDDLE of doc 1; rebuild must stitch
    # the outer blocks back together in original order
    rows = [
        (1, "p q r s a b c d t u v w"),
        (2, "a b c d"),
    ]
    out = {
        r["doc_id"]: r
        for r in block_dedup_rebuild(
            _docs(spark, rows), block_tokens=4, max_df=1
        ).collect()
    }
    assert out[1]["clean_text"] == "p q r s t u v w"


def test_block_dedup_max_df_threshold(spark):
    # max_df=2 keeps blocks shared by exactly two docs
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "e f g h")]
    out = {
        r["doc_id"]: r
        for r in block_dedup_rebuild(
            _docs(spark, rows), block_tokens=4, max_df=2
        ).collect()
    }
    assert out[1]["n_kept"] == 1 and out[2]["n_kept"] == 1


def test_block_dedup_partial_tail_block(spark):
    rows = [(1, "a b c d e f")]  # 4-token blocks -> one full + one 2-token
    out = block_dedup_rebuild(_docs(spark, rows), block_tokens=4).collect()[0]
    assert out["n_blocks"] == 2
    assert out["clean_text"] == "a b c d e f"


# ---------------------------------------------------------------------------
# hard_negatives


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hard_negatives_rank_band_and_self_exclusion(spark):
    # query [1,0]; candidates along a fan so cosine strictly decreases
    # with id. rank band 2..3 must pick ids 3 and 4 (1 and 2 are ranks 0?)
    rows = [(0, [1.0, 0.0])] + [
        (i, [math.cos(i * 0.1), math.sin(i * 0.1)]) for i in range(1, 8)
    ]
    out = hard_negatives(_emb(spark, rows), [0], rank_lo=2, rank_hi=3).collect()
    assert [r["neg_id"] for r in out] == [2, 3]
    assert all(r["query_id"] == 0 for r in out)
    ranks = [r["neg_rank"] for r in out]
    assert ranks == [2, 3]


def test_hard_negatives_multiple_queries_independent(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
        (4, [0.5, 0.5]),
    ]
    out = hard_negatives(_emb(spark, rows), [0, 1], rank_lo=1, rank_hi=1).collect()
    by_q = {r["query_id"]: r["neg_id"] for r in out}
    assert by_q[0] == 2  # closest to x-axis query
    assert by_q[1] == 3  # closest to y-axis query


# ---------------------------------------------------------------------------
# registry-level checks on the real tables


def test_curriculum_order_deterministic_and_staged(spark):
    a = q_pipeline_curriculum_order(spark, SF).collect()
    b = q_pipeline_curriculum_order(spark, SF).collect()
    assert a == b
    for r in a:
        q = r["quality"]
        expected = 0 if q >= 0.70 else 1 if q >= 0.55 else 2 if q >= 0.40 else 3
        assert r["stage"] == expected
    # positions are dense 1..k within each (stage, shard)
    from collections import defaultdict

    groups = defaultdict(list)
    for r in a:
        groups[(r["stage"], r["shard"])].append(r["pos"])
    for pos_list in groups.values():
        assert sorted(pos_list) == list(range(1, len(pos_list) + 1))


def test_yoy_growth_lag_math(spark):
    rows = q_tpcds_yoy_growth(spark, SF).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r)
    for nation_rows in by_nation.values():
        assert nation_rows[0]["prev_revenue"] is None
        for prev, cur in zip(nation_rows, nation_rows[1:]):
            assert cur["prev_revenue"] == prev["revenue"]
            if cur["prev_revenue"]:
                assert (
                    abs(
                        cur["yoy_growth"]
                        - round(cur["revenue"] / cur["prev_revenue"] - 1.0, 4)
                    )
                    < 1e-9
                )


def test_value_histogram_bins_consistent(spark):
    rows = q_agg_value_histogram(spark, SF).collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    from ambient_sound_analysis_api_spark.functions.scalars import is_finite

    ev = spark.read.parquet(f"{SF}/events.parquet")
    finite = ev.filter(is_finite(F.col("value"))).count()
    assert total == finite
    for r in rows:
        assert r["bin_lo"] == r["bin"] * 10.0


# ---------------------------------------------------------------------------
# batch 2: transitions, winsorize, exemplars, chat render


def test_event_transitions_probabilities_normalize(spark):
    from ambient_sound_analysis_api_spark.registry import q_agg_event_transitions

    rows = q_agg_event_transitions(spark, SF).collect()
    assert rows
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        assert r["n"] > 0 and 0.0 <= r["p"] <= 1.0
        by_from[r["from_type"]] += r["p"]
    for total in by_from.values():
        assert abs(total - 1.0) < 0.01  # p rounded to 4dp per row


def test_winsorized_stats_bounds_and_mean(spark):
    from ambient_sound_analysis_api_spark.registry import q_agg_winsorized_stats

    rows = q_agg_winsorized_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert r["lo"] <= r["winsorized_mean"] <= r["hi"]
        assert r["n_clipped"] >= 0


def test_cluster_exemplars_shape(spark):
    from ambient_sound_analysis_api_spark.registry import q_emb_cluster_exemplars

    rows = q_emb_cluster_exemplars(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 8
    for cl_rows in by_cluster.values():
        assert [r["exemplar_rank"] for r in cl_rows] == [1, 2, 3]
        dists = [r["sq_dist"] for r in cl_rows]
        assert dists == sorted(dists)


def test_chat_render_token_split_and_determinism(spark):
    from ambient_sound_analysis_api_spark.registry import q_pipeline_chat_render

    a = q_pipeline_chat_render(spark, SF).collect()
    b = q_pipeline_chat_render(spark, SF).collect()
    assert a == b
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_toks = {r["doc_id"]: len(r["text"].lower().split()) for r in docs}
    for r in a:
        assert len(r["rendered_md5"]) == 32
        assert r["n_user_tokens"] == min(n_toks[r["doc_id"]], 30)
        assert r["n_user_tokens"] + r["n_asst_tokens"] == n_toks[r["doc_id"]]


# ---------------------------------------------------------------------------
# batch 3: bloom prefilter, prefix recall, diversity metrics


def test_bloom_prefilter_fp_envelope(spark):
    from ambient_sound_analysis_api_spark.registry import q_pipeline_bloom_prefilter

    rows = q_pipeline_bloom_prefilter(spark, SF).collect()
    assert rows
    # Bloom filters admit false positives but never false negatives:
    # every exactly-shared gram must be flagged
    for r in rows:
        assert r["n_exact"] <= r["n_flagged"] <= r["n_grams"]
    assert sum(r["n_exact"] for r in rows) > 0  # the probe actually fires


def test_prefix_recall_full_dim_is_control(spark):
    from ambient_sound_analysis_api_spark.registry import q_emb_prefix_recall

    rows = {r["prefix_dim"]: r for r in q_emb_prefix_recall(spark, SF).collect()}
    assert set(rows) == {16, 32, 64}
    assert rows[64]["n_overlap"] == 10 and rows[64]["recall_at_10"] == 1.0
    for r in rows.values():
        assert 0 <= r["n_overlap"] <= 10


def test_diversity_metrics_invariants(spark):
    import math

    from ambient_sound_analysis_api_spark.registry import (
        q_pipeline_diversity_metrics,
    )

    r = q_pipeline_diversity_metrics(spark, SF).collect()[0]
    assert r["n_docs"] > 0 and r["n_sources"] > 0 and r["n_langs"] > 0
    # Shannon entropy is bounded by log2(k); Gini lives in [0, 1)
    assert 0.0 <= r["source_entropy_bits"] <= math.log2(r["n_sources"]) + 1e-9
    assert 0.0 <= r["source_gini"] < 1.0
    assert 0.0 < r["top_source_share"] <= 1.0


# ---------------------------------------------------------------------------
# batch 4: quality-keep canonicalization, mixture weights, anomaly z-score


def test_canonical_best_quality_partitions_corpus(spark):
    from ambient_sound_analysis_api_spark.registry import (
        q_pipeline_canonical_best_quality,
    )

    rows = q_pipeline_canonical_best_quality(spark, SF).collect()
    assert sum(r["n_members"] for r in rows) == 500  # clusters tile the corpus
    for r in rows:
        assert r["n_members"] >= 1
        assert 0.0 <= r["keep_quality"] <= 1.0


def test_mixture_weights_normalize(spark):
    from ambient_sound_analysis_api_spark.registry import (
        q_pipeline_mixture_weights,
    )

    rows = q_pipeline_mixture_weights(spark, SF).collect()
    assert len(rows) == 20
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01
    assert abs(sum(r["weight_t05"] for r in rows) - 1.0) < 0.01
    # alpha=0.5 tempering pulls weights toward uniform: sources below the
    # mean share gain weight, sources above lose it
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r["share"] < mean_share - 0.001:
            assert r["weight_t05"] > r["share"]
        if r["share"] > mean_share + 0.001:
            assert r["weight_t05"] < r["share"]


def test_anomaly_zscore_warmup_and_flags(spark):
    from ambient_sound_analysis_api_spark.registry import q_ts_anomaly_zscore

    rows = q_ts_anomaly_zscore(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["n_ref"] >= 12
        if r["z"] is None:
            assert r["is_anomaly"] is False
    assert any(r["z"] is not None for r in rows)
