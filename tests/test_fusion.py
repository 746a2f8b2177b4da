"""Hybrid retrieval fusion (round-11): RRF and weighted-score fusion.

Semantics on hand-built lists, and the plan contract the VERDICT asked
for: fusion joins the two top-k branch lists on doc_id and adds ZERO
corpus scans beyond what the branches themselves cost.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.retrieval import (
    rrf_fuse,
    weighted_score_fuse,
)

import pytest


@pytest.fixture(autouse=True)
def _drain_operator_caches(spark):
    """bm25 branches persist the tokenized dl/tf tables over the raw
    documents read — drain tracked caches after each test so cached
    subtrees don't plan-match into later scan-counting suites."""
    yield
    from ambient_sound_analysis_api_spark.operators.caching import (
        release_caches,
    )

    release_caches()


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_fuse_semantics(spark):
    """RRF: 1/(60+rank) per list; docs in one list only still score;
    agreement across lists beats a single #1."""
    a = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranking(spark, [(2, 1), (3, 2), (9, 3)])
    out = rrf_fuse({"a": a, "b": b}, k=10, k0=60).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 2: 1/62 + 1/61 (both lists) must beat doc 1: 1/61 (one list)
    assert out[0]["doc_id"] == 2 and out[0]["n_lists"] == 2
    assert by_id[1]["n_lists"] == 1 and by_id[1]["b_rank"] is None
    assert by_id[9]["a_rank"] is None and by_id[9]["b_rank"] == 3
    # exact 6dp-rounded arithmetic
    assert abs(by_id[2]["rrf_score"] - (0.016129 + 0.016393)) < 1e-9
    assert abs(by_id[1]["rrf_score"] - 0.016393) < 1e-9
    # ranked by fused score desc with doc_id tie-break
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_k_cut_and_tie_break(spark):
    """The k cut keeps the top-k by fused score; equal scores break by
    doc_id ascending."""
    a = _ranking(spark, [(10, 1), (20, 1)])  # same rank in disjoint lists
    b = _ranking(spark, [(30, 1)])
    out = rrf_fuse({"a": a, "b": b}, k=2, k0=60).collect()
    assert [r["doc_id"] for r in out] == [10, 20]


def test_weighted_fuse_semantics(spark):
    """Min-max normalization within each list, weight scaling, missing
    side contributes zero, constant list normalizes to 1.0."""
    a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 7.0), (4, 7.0)], "doc_id long, score double"
    )  # constant list: every member normalizes to 1.0
    out = weighted_score_fuse({"a": (a, 0.7), "b": (b, 0.3)}, k=10).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert abs(by_id[1]["fused_score"] - 0.7) < 1e-9          # max of a
    assert abs(by_id[2]["fused_score"] - (0.35 + 0.3)) < 1e-9  # mid a + b
    assert abs(by_id[3]["fused_score"] - 0.0) < 1e-9           # min of a
    assert abs(by_id[4]["fused_score"] - 0.3) < 1e-9           # b only
    assert by_id[2]["n_lists"] == 2 and by_id[4]["n_lists"] == 1


def test_fusion_adds_no_corpus_scans(spark, sf_dir):
    """The fused plan's scan count equals the sum of the two branches'
    scan counts: fusion joins two 20-row lists on doc_id and never
    re-reads the corpus (VERDICT round-10 task 2 done-condition)."""
    from ambient_sound_analysis_api_spark.registry import (
        _fusion_branches,
        queries,
    )

    def scan_count(df) -> int:
        n = 0
        stack = [df._jdf.queryExecution().executedPlan()]
        while stack:
            node = stack.pop()
            cls = node.getClass().getSimpleName()
            if cls == "AdaptiveSparkPlanExec":
                stack.append(node.inputPlan())
                continue
            if "FileSourceScan" in cls or "InMemoryTableScan" in cls:
                n += 1
                # a cached-plan description still contains its scan
                # subtree; don't descend (round-8 NOTES)
                continue
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return n

    bm, dense = _fusion_branches(spark, sf_dir)
    branch_scans = scan_count(bm) + scan_count(dense)
    fused = queries()["retrieval_rrf_fusion"](spark, sf_dir)
    assert scan_count(fused) == branch_scans
    # and the fusion join itself is the full-outer join of the two lists
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
