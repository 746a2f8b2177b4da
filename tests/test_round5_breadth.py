"""Unit tests for the round-5 breadth additions: z-score embedding audit,
per-user history assembly, and the time-hierarchy GROUPING SETS query."""

from __future__ import annotations

from ambient_sound_analysis_api_spark.operators.quantize import (
    zscore_outlier_report,
)
from ambient_sound_analysis_api_spark.registry import (
    q_agg_time_grouping_sets,
    q_pipeline_user_histories,
)


def test_zscore_flags_the_broken_vector(spark):
    """9 vectors at 0 plus one at 100: mean=10, std=30 → the outlier sits at
    z=3 (flagged), the rest at z=-1/3 (clean)."""
    rows = [(i, [0.0]) for i in range(9)] + [(99, [100.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in zscore_outlier_report(emb).collect()}
    assert out[99].n_outlier_dims == 1
    assert abs(out[99].max_abs_z - 3.0) < 1e-6
    for i in range(9):
        assert out[i].n_outlier_dims == 0
        assert abs(out[i].max_abs_z - 1 / 3) < 1e-6


def test_zscore_constant_dimension_is_not_an_outlier(spark):
    """A zero-variance dimension contributes z=0 everywhere, never NaN."""
    emb = spark.createDataFrame(
        [(1, [5.0, 0.0]), (2, [5.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in zscore_outlier_report(emb).collect()}
    # dim 0 constant → z = 0; dim 1 has two symmetric points → |z| = 1
    assert out[1].n_outlier_dims == 0 and out[2].n_outlier_dims == 0
    assert abs(out[1].max_abs_z - 1.0) < 1e-6


def test_user_histories_order_cap_and_span(spark, sf_dir):
    rows = {r.user_id: r for r in q_pipeline_user_histories(spark, sf_dir).collect()}
    assert rows  # non-empty at sf0.001
    for r in rows.values():
        seq_len = len(r.seq.split(">")) if r.seq else 0
        assert seq_len == min(r.n_events, 100)
        assert r.first_ts <= r.last_ts


def test_grouping_sets_levels_are_consistent(spark, sf_dir):
    """The grand total must equal the sum of the per-year level, and the
    per-type yearly level must roll up the detail level."""
    out = q_agg_time_grouping_sets(spark, sf_dir).collect()
    grand = [r for r in out if r.etype == "ALL" and r.y == -1 and r.m == -1]
    per_year = [r for r in out if r.etype == "ALL" and r.y != -1]
    detail = [r for r in out if r.etype != "ALL" and r.m != -1]
    type_year = [r for r in out if r.etype != "ALL" and r.m == -1]
    assert len(grand) == 1
    assert grand[0].n_events == sum(r.n_events for r in per_year)
    assert sum(r.n_events for r in detail) == sum(r.n_events for r in type_year)


def test_event_funnel_orderings(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import q_agg_event_funnel

    rows = q_agg_event_funnel(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.stage in (1, 2, 3)
        if r.t_click is not None:
            assert r.t_click > r.t_view
        if r.t_purchase is not None:
            assert r.stage == 3 and r.t_purchase > r.t_click
        if r.t_click is None:
            assert r.t_purchase is None and r.stage == 1


def test_retention_cohort_week0_dominates(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import q_agg_retention_cohorts

    rows = q_agg_retention_cohorts(spark, sf_dir).collect()
    assert rows
    week0 = {r.cohort: r.n_active for r in rows if r.wk == 0}
    for r in rows:
        assert r.wk >= 0 and r.n_active >= 1
        # every cohort member is active in week 0 (their first event),
        # so no later week can exceed the cohort size
        assert r.n_active <= week0[r.cohort]


def test_percentile_envelope_ordering(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import (
        q_agg_band_percentile_envelope,
    )

    rows = q_agg_band_percentile_envelope(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p05 <= r.p50 <= r.p95
        assert r.n > 0


def test_ngram_novelty_bounds_and_hapax_consistency(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import q_text_ngram_novelty

    rows = q_text_ngram_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_shingles
        assert 0.0 <= r.novelty <= 1.0


def test_asof_forward_and_tolerance(spark):
    import pytest
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10"), (2, "2024-01-20")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("2024-01-12", 100.0), ("2024-02-25", 200.0)], "rts string, v double"
    ).withColumn("rts", F.to_timestamp("rts"))
    l2 = left.withColumn("k", F.lit(1))
    r2 = right.withColumn("k", F.lit(1))
    fwd = {
        r.id: r.v
        for r in asof_join(
            l2, r2, "k", "ts", "rts", ["v"], direction="forward"
        ).collect()
    }
    # id 1 → nearest later right is 01-12; id 2 → 02-25
    assert fwd == {1: 100.0, 2: 200.0}
    tol = {
        r.id: r.v
        for r in asof_join(
            l2, r2, "k", "ts", "rts", ["v"],
            direction="forward", tolerance="INTERVAL 7 DAYS",
        ).collect()
    }
    # id 2's nearest later order is 36 days away → nulled by tolerance
    assert tol == {1: 100.0, 2: None}
    with pytest.raises(ValueError):
        asof_join(l2, r2, "k", "ts", "rts", ["v"], direction="sideways")


def test_asof_nearest_row_nulls_are_the_answer(spark):
    """A NULL value in the nearest right row must come back as NULL — not
    be papered over by an older row's value (merge_asof row semantics)."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-03-01")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts")).withColumn("k", F.lit(1))
    right = spark.createDataFrame(
        [("2024-01-01", 5.0), ("2024-03-01", None)], "rts string, v double"
    ).withColumn("rts", F.to_timestamp("rts")).withColumn("k", F.lit(1))
    out = asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    assert out[0].v is None


def test_weighted_sample_rejects_nonpositive_weight(spark):
    import pytest
    from pyspark.sql import functions as F
    from pyspark.errors import PySparkRuntimeError

    from ambient_sound_analysis_api_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame([(1, 10), (2, 0)], "id long, w long")
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(df, F.col("w"), 2, F.col("id")).collect()


def test_chunk_windows_cover_and_overlap(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import (
        q_pipeline_chunk_windows,
    )

    rows = q_pipeline_chunk_windows(spark, sf_dir).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, chunks in by_doc.items():
        idxs = sorted(c.chunk_idx for c in chunks)
        assert idxs == list(range(len(idxs)))  # contiguous chunk indices
        for c in chunks:
            assert 1 <= c.n_tokens <= 64
        # with stride 48 < width 64 the last TWO chunks may be short
        # (the penultimate start can sit within 64 tokens of the end);
        # everything earlier must be full-width, and any non-final chunk
        # holds at least stride+1 tokens
        ordered = sorted(chunks, key=lambda c: c.chunk_idx)
        assert all(c.n_tokens == 64 for c in ordered[:-2])
        assert all(c.n_tokens >= 49 for c in ordered[:-1])


def test_span_corruption_mask_accounting(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import (
        q_pipeline_span_corruption,
    )

    rows = q_pipeline_span_corruption(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 3 masked per full 17-block plus the (capped) remainder
        expect = (r.n_tokens // 17) * 3 + min(3, r.n_tokens % 17)
        assert r.n_masked == expect
        assert 0 < r.n_masked <= r.n_tokens
        assert len(r.input_md5) == 32 and len(r.target_md5) == 32
    # mask rate across the corpus sits near 3/17, biased slightly above
    # it because short remainder blocks still mask up to 3 tokens
    tot = sum(r.n_tokens for r in rows)
    masked = sum(r.n_masked for r in rows)
    assert 3 / 17 <= masked / tot < 3 / 17 + 0.05
