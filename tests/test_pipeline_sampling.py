"""Tests for deterministic sampling/splitting and the vocab/TF-IDF queries
(registry section 9, operators/sampling.py).

The properties that matter: membership is a pure function of the key
(stable under repartitioning and re-runs), fractions land near their
targets, the sample and split decisions are independent, and the scored
outputs are deterministic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.sampling import (
    N_BUCKETS,
    hash_bucket,
    hash_split,
    stratified_sample,
)
from ambient_sound_analysis_api_spark.registry import (
    _table,
    q_pipeline_split,
    q_pipeline_stratified,
    q_text_tfidf_topk,
    q_text_vocab_topk,
)


def test_hash_split_labels_every_row_near_target_fractions(spark, sf_dir):
    docs = _table(spark, sf_dir, "documents")
    out = hash_split(docs, F.col("doc_id"), train=0.8, valid=0.1)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert set(counts) == {"train", "valid", "test"}
    # binomial tolerance at n=500: ±6 sigma ≈ ±0.11 absolute
    assert abs(counts["train"] / total - 0.8) < 0.12
    assert abs(counts["valid"] / total - 0.1) < 0.1


def test_hash_split_is_stable_under_repartitioning(spark, sf_dir):
    docs = _table(spark, sf_dir, "documents")
    a = {
        r.doc_id: r.split
        for r in hash_split(docs, F.col("doc_id")).select("doc_id", "split").collect()
    }
    b = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(13), F.col("doc_id"))
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_stratified_sample_is_deterministic_subset(spark, sf_dir):
    docs = _table(spark, sf_dir, "documents")
    fracs = {"en": 0.5, "es": 0.25, "de": 0.25, "fr": 0.125, "zh": 0.125}
    s1 = sorted(r.doc_id for r in stratified_sample(docs, F.col("doc_id"), fracs, "lang").collect())
    s2 = sorted(r.doc_id for r in stratified_sample(docs, F.col("doc_id"), fracs, "lang").collect())
    assert s1 == s2
    assert 0 < len(s1) < docs.count()
    # unknown strata are dropped entirely
    none = stratified_sample(docs, F.col("doc_id"), {"xx": 1.0}, "lang").count()
    assert none == 0


def test_mixture_sample_hits_target_proportions(spark):
    """mixture_sample keeps ~budget·w rows per source, keeps everything from
    an undersized source (never oversamples), drops unweighted sources, and
    is run-to-run deterministic."""
    from ambient_sound_analysis_api_spark.operators.sampling import (
        mixture_sample,
    )

    rows = (
        [(i, "web") for i in range(4000)]
        + [(10_000 + i, "books") for i in range(1000)]
        + [(20_000 + i, "tiny") for i in range(20)]     # under its target
        + [(30_000 + i, "junk") for i in range(500)]    # unweighted
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"web": 0.5, "books": 0.4, "tiny": 0.1}
    out = mixture_sample(df, F.col("doc_id"), "source", weights, budget=1000)
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert "junk" not in counts
    assert counts["tiny"] == 20                      # kept whole, not replicated
    assert abs(counts["web"] - 500) < 75             # ~budget·w, hash noise
    assert abs(counts["books"] - 400) < 75
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in mixture_sample(
            df, F.col("doc_id"), "source", weights, budget=1000
        ).collect()
    )
    assert a == b


def test_sample_and_split_buckets_are_independent(spark, sf_dir):
    """Chars 1-3 and 4-6 of the md5 must not correlate: the sampled subset's
    split fractions should match the global split fractions."""
    docs = _table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs, F.col("doc_id"), {l: 0.5 for l in ["en", "es", "de", "fr", "zh"]}, "lang"
    )
    out = hash_split(sampled, F.col("doc_id"))
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert abs(counts.get("train", 0) / total - 0.8) < 0.15


def test_split_buckets_cover_the_space(spark):
    df = spark.range(0, 5000).select(F.col("id"))
    b = df.select(hash_bucket(F.col("id")).alias("b"))
    mn, mx = b.agg(F.min("b"), F.max("b")).collect()[0]
    assert 0 <= mn and mx < N_BUCKETS
    assert mx - mn > N_BUCKETS * 0.9  # spread across nearly the whole range


def test_vocab_topk_is_sorted_and_bounded(spark, sf_dir):
    rows = q_text_vocab_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 200
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_tfidf_yields_one_top_term_per_sampled_doc(spark, sf_dir):
    docs = _table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    rows = q_text_tfidf_topk(spark, sf_dir).collect()
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)


def test_registry_split_totals_match_table(spark, sf_dir):
    total = _table(spark, sf_dir, "documents").count()
    rows = q_pipeline_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == total
    strat = q_pipeline_stratified(spark, sf_dir).collect()
    assert sum(r.n_sampled for r in strat) < total


def test_mixture_sample_rejects_high_cardinality_source(spark):
    """A mis-keyed source_col (per-row ids) fails loudly at the max_sources
    guard instead of collecting one row per distinct value onto the driver."""
    import pytest

    from ambient_sound_analysis_api_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("source"),
    )
    with pytest.raises(ValueError, match="distinct values"):
        mixture_sample(
            df, F.col("doc_id"), "source", {"web": 1.0}, budget=10,
            max_sources=50,
        )
    # at or under the bound: works as before
    out = mixture_sample(
        df, F.col("doc_id"), "source", {"7": 1.0}, budget=10,
        max_sources=100,
    )
    assert out.count() == 1


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 1000 if i < 100 else 10) for i in range(1100)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = weighted_sample(df, F.col("w"), 100, F.col("id")).collect()
    heavy = sum(1 for r in out if r.w == 1000)
    # 100 heavy rows carry ~50% of total mass but are 9% of rows; a
    # weighted draw of 100 must pick far more of them than the ~9 a
    # uniform draw would (deterministic, so this is a fixed number)
    assert heavy > 30
    # deterministic: re-running yields the identical sample
    again = weighted_sample(df, F.col("w"), 100, F.col("id")).collect()
    assert [r.id for r in out] == [r.id for r in again]


def test_epoch_manifest_independent_deterministic_draws(spark):
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.sampling import (
        epoch_manifest,
    )

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out = epoch_manifest(df, F.col("id"), n_epochs=3, frac=0.5).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, set()).add(r.id)
    assert set(by_epoch) == {0, 1, 2}
    for e, ids in by_epoch.items():
        assert 0.4 < len(ids) / 2000 < 0.6  # ~frac per epoch
    # distinct md5 windows → epochs draw (near-)independently: the pairwise
    # overlap of two 50% draws sits near 25%, far from 50% (identical draws)
    inter01 = len(by_epoch[0] & by_epoch[1]) / 2000
    assert 0.15 < inter01 < 0.35
    # deterministic: replay yields the identical manifest
    again = epoch_manifest(df, F.col("id"), n_epochs=3, frac=0.5).collect()
    assert sorted((r.epoch, r.id) for r in out) == sorted(
        (r.epoch, r.id) for r in again
    )


def test_epoch_manifest_rejects_bad_frac(spark):
    import pytest
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.sampling import (
        epoch_manifest,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        epoch_manifest(df, F.col("id"), frac=0.0)
