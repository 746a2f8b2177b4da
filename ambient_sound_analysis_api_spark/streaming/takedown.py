"""Stream-fed takedown (deletion) admission for the streamed stores.

The reference engine serves an append-only archive and has no deletion
surface at all (SURVEY.md §4 — its S3 catalog only ever grows); this
module is extension charter, completing the streamed half of the store
lifecycle the batch verbs already cover (``retrieval.bm25_delete_docs``,
``pq.ivfpq_delete_ids``): real corpora shrink continuously — takedowns,
opt-outs, re-dedup verdicts — and the delete feed is a STREAM in
production, not a monthly batch job.

Design: deletions are data, not mutations. A micro-batch of ids is
admitted into its own ``batch=<id>`` directory under a DEDICATED
takedown root (a sibling of the code/postings store — sharing the store
root would poison its hive partition discovery with a second partition
column), via the exact stage-then-rename contract of
``admit_embedding_batch`` / ``admit_document_batch``: the rename is the
commit, its target's existence is the replay gate, and the dot-prefixed
staging directory is invisible to readers at every crash point. Nothing
in the admitted index is rewritten — a takedown batch is O(ids), never
O(corpus).

Serving anti-joins the union of admitted takedown batches (takedown-
sized, broadcast by the planner at real scale) against the index rows,
and derives every corpus statistic (BM25 df / N / avgdl) AFTER the
anti-join — so a streamed-takedown serve is hash-equal to a from-scratch
build over the surviving corpus. That equivalence IS the correctness
contract, oracle-checked by ``streaming_bm25_takedown`` /
``streaming_ann_takedown`` (registry.py) against rebuild-without-deleted
SQL, and the admission idempotence is pinned in
``tests/test_streaming_takedown.py``.

Cross-engine/scale notes: admission cost is independent of corpus size;
the serve-time anti-join stays until a compaction pass
(``bm25_compact_segments`` / ``ivfpq_compact_segments``) folds the
tombstones out physically — stream admits the verdicts, batch compaction
reclaims the bytes, the same split every LSM-shaped store uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def admit_takedown_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    takedown_root: str,
    id_col: str,
) -> bool:
    """Admit ONE micro-batch of takedown ids; returns False when the
    batch was already admitted (crash replay) or a concurrent admission
    of the same batch id won the rename race. Ids are deduplicated
    within the batch (re-deleting an already-deleted doc is a no-op by
    construction — the anti-join is set semantics)."""
    import uuid

    from ..operators.atomic_swap import _fs_and_path

    jvm = spark._jvm
    target = f"{takedown_root}/batch={batch_id}"
    fs, dst = _fs_and_path(spark, target)
    if fs.exists(dst):
        return False
    staging = (
        f"{takedown_root}/.staging-batch-{batch_id}-{uuid.uuid4().hex[:12]}"
    )
    # takedown batches are id-sized: one file keeps the store at
    # O(batches) files instead of O(batches * shuffle partitions)
    batch_df.select(id_col).distinct().coalesce(1).write.parquet(staging)
    fs.mkdirs(dst.getParent())
    src = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.rename(src, dst):
        # lost the race after our existence probe: the winner committed
        # the identical id set (distinct of the same batch)
        fs.delete(src, True)
        return False
    return True


def streamed_takedown_ingest(
    spark: SparkSession,
    stream: DataFrame,
    takedown_root: str,
    id_col: str,
):
    """Attach the exactly-once takedown sink to a streaming DataFrame of
    ids; returns the (unstarted) ``DataStreamWriter`` so callers choose
    the trigger."""

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        admit_takedown_batch(spark, batch_df, batch_id, takedown_root, id_col)

    return stream.writeStream.foreachBatch(admit)


def read_streamed_takedowns(
    spark: SparkSession, takedown_root: str, id_col: str
) -> "DataFrame | None":
    """The union of every admitted takedown batch's ids, distinct across
    batches, or None when no batch was ever admitted (absence is the
    common case — most serves carry no tombstones, and None lets the
    caller skip the anti-join entirely instead of anti-joining an empty
    frame)."""
    from ..operators.atomic_swap import _fs_and_path

    fs, root = _fs_and_path(spark, takedown_root)
    if not fs.exists(root):
        return None
    return (
        spark.read.parquet(f"{takedown_root}/batch=*")
        .select(id_col)
        .distinct()
    )
