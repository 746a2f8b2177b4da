"""Data-quality expectation suite (operators/expectations.py): fused
single-pass table checks, FK integrity, and the report contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.expectations import (
    Check,
    referential_expectation,
    table_expectations,
)


def test_table_expectations_single_pass_and_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -3.0), (3, None, 7.0), (3, "d", 1.0)],
        "k int, name string, bal double",
    )
    rep = {
        r.constraint: r
        for r in table_expectations(
            df,
            "t",
            [
                Check("name_complete", "completeness", column="name"),
                Check("k_unique", "uniqueness", column="k"),
                Check(
                    "bal_nonneg",
                    "satisfies",
                    column="bal",
                    predicate=F.col("bal") >= 0,
                    threshold=0.7,
                ),
            ],
        ).collect()
    }
    assert rep["name_complete"].metric == pytest.approx(0.75)
    assert rep["name_complete"].passed == 0  # threshold 1.0
    assert rep["k_unique"].metric == pytest.approx(0.75)  # 3 distinct / 4
    assert rep["bal_nonneg"].metric == pytest.approx(0.75)
    assert rep["bal_nonneg"].passed == 1  # 0.75 >= 0.7
    assert rep["bal_nonneg"].target == "t.bal"

    # the whole suite is ONE aggregation pass: a single scan in the plan
    plan_df = table_expectations(
        df, "t", [Check("a", "completeness", column="name"),
                  Check("b", "uniqueness", column="k")]
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("simple")
    assert buf.getvalue().count("Scan ") <= 1

    with pytest.raises(ValueError, match="unknown check kind"):
        table_expectations(df, "t", [Check("x", "nope", column="k")])


def test_table_expectations_empty_table_reports_zero(spark):
    df = spark.createDataFrame([], "k int, name string")
    rows = table_expectations(
        df, "t", [Check("c", "completeness", column="name")]
    ).collect()
    assert rows[0].metric == 0.0 and rows[0].passed == 0


def test_referential_expectation_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    r = referential_expectation(
        child, parent, fk="fk", pk="pk", name="fk_ok", target="child->parent"
    ).collect()[0]
    # 3 resolved of 4 (the NULL fk counts as resolved; 99 is the orphan)
    assert r.metric == pytest.approx(0.75)
    assert r.passed == 0

    clean = referential_expectation(
        child.filter("fk IS NULL OR fk = 10"), parent,
        fk="fk", pk="pk", name="fk_ok", target="child->parent",
    ).collect()[0]
    assert clean.metric == 1.0 and clean.passed == 1
