"""Streamed takedown admission (streaming/takedown.py): exactly-once
contract + serve equivalence to rebuild-without-deleted.

The crash matrix (staging invisible, rename-is-commit, replay gate) is
shared with the document/embedding admitters and pinned live in
tests/test_streaming_crash_recovery.py; here we pin the takedown-specific
pieces: admission idempotence, absence semantics (no takedown root ->
None, no anti-join), cross-batch distinct, and the end-to-end hash
contract (also oracle-checked by streaming_bm25_takedown /
streaming_ann_takedown in the registry).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.streaming.takedown import (
    admit_takedown_batch,
    read_streamed_takedowns,
)


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="takedown_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_admit_is_idempotent_and_distinct(spark, tmp_root):
    ids = spark.createDataFrame(
        [(3,), (10,), (3,), (17,)], "doc_id long"
    )
    assert admit_takedown_batch(spark, ids, 0, tmp_root, "doc_id") is True
    # replay of the same batch id: the existence probe gates it out
    assert admit_takedown_batch(spark, ids, 0, tmp_root, "doc_id") is False
    out = read_streamed_takedowns(spark, tmp_root, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [3, 10, 17]


def test_absent_root_reads_none(spark, tmp_root):
    assert (
        read_streamed_takedowns(spark, f"{tmp_root}/never", "doc_id") is None
    )


def test_union_is_distinct_across_batches(spark, tmp_root):
    a = spark.createDataFrame([(1,), (2,)], "vec_id long")
    b = spark.createDataFrame([(2,), (3,)], "vec_id long")
    assert admit_takedown_batch(spark, a, 0, tmp_root, "vec_id")
    assert admit_takedown_batch(spark, b, 1, tmp_root, "vec_id")
    out = read_streamed_takedowns(spark, tmp_root, "vec_id")
    assert sorted(r.vec_id for r in out.collect()) == [1, 2, 3]


def test_staging_never_leaks(spark, tmp_root):
    """A crashed (never-renamed) staging dir is invisible to the reader:
    simulate by creating the dot-prefixed dir shape directly."""
    ids = spark.createDataFrame([(5,)], "doc_id long")
    assert admit_takedown_batch(spark, ids, 0, tmp_root, "doc_id")
    ghost = spark.createDataFrame([(99,)], "doc_id long")
    ghost.coalesce(1).write.parquet(f"{tmp_root}/.staging-batch-1-deadbeef")
    out = read_streamed_takedowns(spark, tmp_root, "doc_id")
    assert [r.doc_id for r in out.collect()] == [5]


def test_bm25_streamed_takedown_matches_survivor_rebuild(spark, sf_dir):
    """Streamed takedown serve == one-shot bm25_topk over the surviving
    corpus — the rebuild-without-deleted contract, end to end."""
    from ambient_sound_analysis_api_spark.operators.retrieval import bm25_topk
    from ambient_sound_analysis_api_spark.registry import (
        q_streaming_bm25_takedown,
    )

    got = q_streaming_bm25_takedown(spark, sf_dir).collect()
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 7 != 3)
    )
    want = bm25_topk(docs, ["vector", "hash", "merge"], k=20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ann_streamed_takedown_drops_exactly_the_ids(spark, sf_dir):
    """The served ANN index is the never-admitted-the-deleted index:
    row-identical to the unfiltered grown index minus the takedown set."""
    from ambient_sound_analysis_api_spark.registry import (
        q_streaming_ann_ingest,
        q_streaming_ann_takedown,
    )

    full = q_streaming_ann_ingest(spark, sf_dir).collect()
    got = q_streaming_ann_takedown(spark, sf_dir).collect()
    survivors = [
        tuple(r) for r in full if (r.vec_id - 1_000_000) % 30 != 3
    ]
    assert [tuple(r) for r in got] == survivors
    assert len(got) < len(full)  # the takedown set is nonempty
