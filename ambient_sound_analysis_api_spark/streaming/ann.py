"""Stream-fed incremental ANN index maintenance.

Composes the streaming ingest discipline (``streaming/dual.py``'s
id-gated ``foreachBatch`` pattern) with the no-refit delta encode
(``operators/pq.py::ivfpq_delta_index``): each micro-batch of new
embeddings is cell-assigned and PQ-encoded against the STANDING model
(coarse centroids + codebooks — never refit inside the hot path) and
admitted into a partitioned code store exactly once.

Exactly-once here needs no meta file at all: each batch's codes land in
their own ``batch=<id>`` partition directory via stage-then-rename —
the rename is the commit, and its target's existence IS the replay
gate. Crash anywhere:

- before the rename → only a staging dir exists; readers (who scan
  ``batch=*``) never see it, and the replayed batch overwrites staging
  and commits;
- after the rename → the replayed batch finds ``batch=<id>`` present
  and skips (idempotent admission).

The store layout is ``<root>/batch=<id>/cell=<c>/*.parquet`` — standard
two-level hive partitioning, so a serving scan prunes to the probed
cells across ALL admitted batches with one partition filter, and the
"grown index" is always the plain union of batch directories (proven
batch-equivalent to a one-shot encode in ``tests/test_streaming_ann.py``
and hash-checked end-to-end by the ``streaming_ann_ingest`` registry
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def admit_embedding_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_root: str,
    cents: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """Encode + admit ONE micro-batch into the streamed code store;
    returns False when the batch was already admitted (crash replay) or
    a concurrent admission of the same batch id won the rename race.
    The encode is ``ivfpq_delta_index`` — exact-decimal cell assignment
    plus the codegen code projection, no refit, no corpus scan."""
    import uuid

    from ..operators.atomic_swap import _fs_and_path
    from ..operators.pq import ivfpq_delta_index

    jvm = spark._jvm
    target = f"{store_root}/batch={batch_id}"
    fs, dst = _fs_and_path(spark, target)
    if fs.exists(dst):
        return False
    codes = ivfpq_delta_index(
        batch_df, cents, codebooks, id_col=id_col, vec_col=vec_col
    )
    # dot-prefixed staging: partition discovery ignores hidden dirs, so a
    # crashed (never-renamed) staging can NEVER pollute the batch=*
    # partition column or leak rows to readers — a sibling
    # "batch=<id>.__staging__" name would be parsed as a partition VALUE
    staging = f"{store_root}/.staging-batch-{batch_id}-{uuid.uuid4().hex[:12]}"
    codes.repartition("cell").write.partitionBy("cell").parquet(staging)
    fs.mkdirs(dst.getParent())
    src = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.rename(src, dst):
        # replay/concurrent race lost after our existence probe: the
        # other admission committed identical codes (the encode is
        # deterministic), so dropping ours is correct
        fs.delete(src, True)
        return False
    return True


def streamed_ann_ingest(
    spark: SparkSession,
    stream: DataFrame,
    store_root: str,
    cents: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Attach the exactly-once admission sink to a streaming DataFrame of
    new embeddings; returns the (unstarted) ``DataStreamWriter`` so
    callers choose the trigger (``availableNow`` for catch-up runs,
    processing-time for live feeds)."""

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        admit_embedding_batch(
            spark, batch_df, batch_id, store_root, cents, codebooks,
            id_col=id_col, vec_col=vec_col,
        )

    return stream.writeStream.foreachBatch(admit)


def read_streamed_codes(
    spark: SparkSession,
    store_root: str,
    takedown_root: "str | None" = None,
) -> DataFrame:
    """The grown delta index: every admitted batch's codes, with
    ``batch`` and ``cell`` as partition columns — a probed-cell filter
    prunes directories across all batches.

    ``takedown_root`` points at a streamed takedown store
    (``streaming/takedown.py``); its admitted vec_ids are anti-joined
    (takedown-sized, broadcast) out of the code rows, so the served
    index is exactly the never-admitted-the-deleted index — nothing in
    the code store itself is rewritten (a takedown is O(ids), and
    ``ivfpq_compact_segments`` is the physical reclamation path)."""
    codes = spark.read.parquet(store_root)
    if takedown_root is not None:
        from .takedown import read_streamed_takedowns

        tomb = read_streamed_takedowns(spark, takedown_root, "vec_id")
        if tomb is not None:
            from pyspark.sql import functions as F

            codes = codes.join(F.broadcast(tomb), "vec_id", "left_anti")
    return codes
