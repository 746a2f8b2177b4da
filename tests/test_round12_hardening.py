"""Round-12 hardening: pins the four ADVICE-r11 fixes.

1. evalmetrics treats NULL labels as negatives (cells partition the
   input; parity with CASE-WHEN oracles).
2. Score quantization survives |score| >= 10^4 (decimal(16,6), no
   silent NULL-group collapse under non-ANSI Spark).
3. zipf_fit emits NULL regression columns (not an error / engine-
   divergent 0-division) on degenerate corpora.
4. filtered_topk keeps working on fixtures whose ids don't start at 0
   (registry now derives the query id via min(vec_id)).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_confusion_cells_partition_input_with_null_labels(spark):
    from ambient_sound_analysis_api_spark.operators.evalmetrics import (
        confusion_sweep,
    )

    df = spark.createDataFrame(
        [(0.9, "en"), (0.8, None), (0.2, "fr"), (0.1, None)],
        "s double, lang string",
    )
    r = confusion_sweep(
        df,
        F.col("s"),
        F.when(F.col("lang") == "en", 1).otherwise(
            F.when(F.col("lang").isNotNull(), 0)
        ),
        thresholds=[0.5],
    ).collect()[0]
    # NULL labels coalesce to negative: 0.8 -> fp, 0.1 -> tn
    assert (r.tp, r.fp, r.fn, r.tn) == (1, 1, 0, 2)
    assert r.tp + r.fp + r.fn + r.tn == df.count()


def test_binary_auc_null_labels_count_as_negative(spark):
    from ambient_sound_analysis_api_spark.operators.evalmetrics import (
        binary_auc,
    )

    base = spark.createDataFrame(
        [(0.9, 1), (0.7, None), (0.3, None), (0.1, 0)],
        "s double, y int",
    )
    r = binary_auc(base, F.col("s"), F.col("y")).collect()[0]
    assert (r.n_pos, r.n_neg) == (1, 3)
    assert r.auc == pytest.approx(1.0, abs=1e-6)


def test_binary_auc_survives_large_scores(spark):
    from ambient_sound_analysis_api_spark.operators.evalmetrics import (
        binary_auc,
    )

    # raw (uncalibrated) scores >= 10^4 used to NULL-collapse under the
    # old decimal(10,6) cast; now they keep distinct score groups
    df = spark.createDataFrame(
        [(99999.5, 1), (12345.0, 1), (10000.0, 0), (-20000.0, 0)],
        "s double, y int",
    )
    r = binary_auc(df, F.col("s"), F.col("y")).collect()[0]
    assert r.n_scores == 4
    assert r.auc == pytest.approx(1.0, abs=1e-6)


def test_token_budget_select_large_scores(spark):
    from ambient_sound_analysis_api_spark.operators.sampling import (
        token_budget_select,
    )

    df = spark.createDataFrame(
        [("a", 50000.0, 10), ("a", 20000.0, 10), ("b", 1.0, 10), ("b", 0.5, 10)],
        "source string, q double, nt int",
    )
    out = token_budget_select(
        df, F.col("q"), F.col("nt"), budget_frac=0.5
    ).collect()
    # top-half of the token mass = the two large-score docs, both source a
    assert len(out) == 1
    assert out[0].source == "a" and out[0].n_docs == 2
    assert out[0].q_cut == pytest.approx(20000.0)


def test_zipf_fit_degenerate_corpus_yields_null_fit(spark):
    from ambient_sound_analysis_api_spark.operators.lm import zipf_fit

    one_token = spark.createDataFrame(
        [("d1", "aaa aaa aaa")], "doc_id string, text string"
    )
    r = zipf_fit(one_token).collect()[0]
    assert r.n_ranks == 1
    assert r.slope is None and r.intercept is None and r.r2 is None
    assert r.top_freq == 3


def test_filtered_topk_nonzero_based_ids(spark):
    from ambient_sound_analysis_api_spark.operators.similarity import (
        filtered_topk,
    )

    rows = [
        (100, 0, [1.0, 0.0]),
        (101, 0, [0.9, 0.1]),
        (102, 1, [0.0, 1.0]),
        (103, 3, [0.8, 0.2]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    qid = emb.agg(F.min("vec_id")).first()[0]
    assert qid == 100
    out = filtered_topk(
        emb, query_id=qid, predicate=F.col("label") % 3 == 0, k=2, post_k=3
    ).collect()
    assert [r.vec_id for r in out] == [101, 103]
    assert all(r.in_postfilter for r in out)
