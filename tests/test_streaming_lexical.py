"""Exactly-once contract for the streamed lexical (BM25) store —
mirrors tests/test_streaming_ann.py's crash matrix for the sparse twin."""

from __future__ import annotations

import os

from ambient_sound_analysis_api_spark.operators.retrieval import bm25_topk
from ambient_sound_analysis_api_spark.streaming.lexical import (
    admit_document_batch, bm25_streamed_topk,
)

TEXTS = [
    "vector hash merge engine spark parquet",
    "hash hash hash table lookup vector",
    "merge sort join shuffle partition",
    "vector space model retrieval ranking",
]


def _docs(spark, lo, hi):
    rows = [(i, TEXTS[i % len(TEXTS)] + f" filler{i}") for i in range(lo, hi)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streamed_admission_equals_one_shot(spark, tmp_path):
    root = str(tmp_path / "store")
    assert admit_document_batch(spark, _docs(spark, 0, 6), 0, root)
    assert admit_document_batch(spark, _docs(spark, 6, 10), 1, root)
    got = bm25_streamed_topk(
        spark, root, ["vector", "hash", "merge"], k=20
    ).collect()
    want = bm25_topk(
        _docs(spark, 0, 10), ["vector", "hash", "merge"], k=20
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "store")
    assert admit_document_batch(spark, _docs(spark, 0, 6), 0, root)
    before = bm25_streamed_topk(spark, root, ["vector"], k=5).collect()
    # crash replay: same batch id re-offered (even with different rows —
    # the gate is the committed target, not the content)
    assert not admit_document_batch(spark, _docs(spark, 0, 6), 0, root)
    assert not admit_document_batch(spark, _docs(spark, 6, 10), 0, root)
    after = bm25_streamed_topk(spark, root, ["vector"], k=5).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    assert len(os.listdir(root)) == 1  # exactly one committed batch dir


def test_crashed_staging_is_invisible_to_readers(spark, tmp_path):
    root = str(tmp_path / "store")
    assert admit_document_batch(spark, _docs(spark, 0, 6), 0, root)
    # simulate a crashed admission: a staged-but-never-renamed directory
    crashed = os.path.join(root, ".staging-batch-1-deadbeef0123")
    os.makedirs(os.path.join(crashed, "postings"))
    os.makedirs(os.path.join(crashed, "doclens"))
    got = bm25_streamed_topk(spark, root, ["vector"], k=5).collect()
    want = bm25_topk(_docs(spark, 0, 6), ["vector"], k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the replayed batch still commits normally alongside the debris
    assert admit_document_batch(spark, _docs(spark, 6, 10), 1, root)
    got2 = bm25_streamed_topk(spark, root, ["vector"], k=5).collect()
    want2 = bm25_topk(_docs(spark, 0, 10), ["vector"], k=5).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2]
