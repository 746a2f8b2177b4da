"""Unit tests for the round-5 additions: incremental (cross-batch) dedup
and corpus bigram language-model scoring."""

from __future__ import annotations

import math

from ambient_sound_analysis_api_spark.operators.dedup import incremental_dedup
from ambient_sound_analysis_api_spark.operators.lm import bigram_lm_scores


def test_incremental_dedup_drops_corpus_hits_and_batch_copies(spark):
    corpus = spark.createDataFrame(
        [(1, "hello world"), (2, "already here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "hello world"),        # exact dup of corpus → dropped
            (11, "  Already   HERE "),  # normalized dup of corpus → dropped
            (12, "brand new doc"),      # fresh, kept
            (13, "brand new doc"),      # within-batch copy → collapsed
            (14, "another fresh one"),  # fresh, kept
        ],
        "doc_id long, text string",
    )
    out = {r.keep_id: r for r in incremental_dedup(batch, corpus).collect()}
    assert set(out) == {12, 14}
    assert out[12].n_batch_copies == 2
    assert out[14].n_batch_copies == 1


def test_incremental_dedup_empty_batch(spark):
    corpus = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    batch = corpus.filter("doc_id < 0")
    assert incremental_dedup(batch, corpus).count() == 0


def test_bigram_lm_scores_hand_computed(spark):
    """c(a)=3, V=4 (a,b,c,solo); P(b|a)=(2+1)/(3+4), P(c|a)=(1+1)/(3+4)."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    # doc 4 has a single token → no bigrams → absent
    assert set(out) == {1, 2, 3}
    assert out[1].n_bigrams == 1
    assert abs(out[1].avg_logprob - round(math.log(3 / 7), 6)) < 1e-9
    assert out[2].avg_logprob == out[1].avg_logprob
    assert abs(out[3].avg_logprob - round(math.log(2 / 7), 6)) < 1e-9


def test_bigram_lm_scores_templated_text_scores_higher(spark):
    """Docs made of corpus-frequent bigrams outscore one made of hapax
    bigrams — the signal a curation pipeline actually thresholds on."""
    rows = [(i, "the quick brown fox") for i in range(10)]
    rows.append((99, "zyx wvu tsr qpo"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(docs).collect()}
    assert out[0] > out[99]
