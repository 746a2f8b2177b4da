"""Stream-fed lexical (BM25) index maintenance.

The sparse twin of ``streaming/ann.py``: each micro-batch of documents
is tokenized ONCE (the batch is the only thing that ever touches the
text column) into its own postings + doclens segment and admitted
exactly once via stage-then-rename — the rename is the commit, its
target's existence is the replay gate (identical contract and crash
matrix to ``admit_embedding_batch``; see that module docstring).

Store layout: ``<root>/batch=<id>/{postings,doclens}/*.parquet`` — ONE
rename commits both tables atomically (they share the staged directory),
which the two-table split of the manifest-store layout cannot give a
single micro-batch. Serving reads every admitted batch with one
glob-path scan per table and derives query-term df and corpus stats
FROM THE INDEX ROWS (never the text), so streamed admission is
hash-equal to a one-shot ``bm25_topk`` over the same documents — the
batch-equivalence contract, oracle-checked by ``streaming_bm25_ingest``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import (
    BM25_B, BM25_K1, _bm25_score_topk, term_frequencies,
)


def admit_document_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_root: str,
) -> bool:
    """Tokenize + admit ONE micro-batch of documents; returns False when
    the batch was already admitted (crash replay) or a concurrent
    admission of the same batch id won the rename race."""
    import uuid

    from ..operators.atomic_swap import _fs_and_path
    from ..functions.text import letter_tokens

    jvm = spark._jvm
    target = f"{store_root}/batch={batch_id}"
    fs, dst = _fs_and_path(spark, target)
    if fs.exists(dst):
        return False
    # dot-prefixed staging: hidden from any directory listing/partition
    # discovery, so a crashed (never-renamed) staging never leaks rows
    staging = (
        f"{store_root}/.staging-batch-{batch_id}-{uuid.uuid4().hex[:12]}"
    )
    (
        term_frequencies(batch_df)
        .repartitionByRange(4, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.parquet(f"{staging}/postings")
    )
    batch_df.select(
        "doc_id", F.size(letter_tokens(F.col("text"))).alias("dl")
    ).write.parquet(f"{staging}/doclens")
    fs.mkdirs(dst.getParent())
    src = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.rename(src, dst):
        # replay/concurrent race lost after our existence probe: the
        # winner committed identical rows (tokenize is deterministic)
        fs.delete(src, True)
        return False
    return True


def streamed_lexical_ingest(
    spark: SparkSession, stream: DataFrame, store_root: str
):
    """Attach the exactly-once admission sink to a streaming DataFrame
    of documents; returns the (unstarted) ``DataStreamWriter`` so
    callers choose the trigger."""

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        admit_document_batch(spark, batch_df, batch_id, store_root)

    return stream.writeStream.foreachBatch(admit)


def bm25_streamed_topk(
    spark: SparkSession,
    store_root: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    takedown_root: str | None = None,
) -> DataFrame:
    """BM25 top-k over the streamed store: one glob scan of every
    admitted batch's postings (term predicate pushed to the range-sorted
    files), one of the doclens; query-term df aggregates from the
    filtered postings stream and the 1-row corpus stats from doclens —
    all index rows, zero text reads. Arithmetic is the shared
    :func:`~..operators.retrieval._bm25_score_topk`, so the result is
    hash-equal to a one-shot ``bm25_topk`` over the same corpus.

    ``takedown_root`` points at a streamed takedown store
    (``streaming/takedown.py``); its admitted ids are anti-joined
    (takedown-sized, broadcast) out of BOTH index tables BEFORE df and
    corpus stats derive — so df, N and avgdl all reflect the surviving
    corpus and the serve is hash-equal to a from-scratch build without
    the deleted docs."""
    terms = [t.lower() for t in query_terms]
    tf = spark.read.parquet(f"{store_root}/batch=*/postings").filter(
        F.col("term").isin(terms)
    )
    dl = spark.read.parquet(f"{store_root}/batch=*/doclens")
    if takedown_root is not None:
        from .takedown import read_streamed_takedowns

        tomb = read_streamed_takedowns(spark, takedown_root, "doc_id")
        if tomb is not None:
            tomb = F.broadcast(tomb)
            tf = tf.join(tomb, "doc_id", "left_anti")
            dl = dl.join(tomb, "doc_id", "left_anti")
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return _bm25_score_topk(tf, df_tbl, dl, stats, k=k, k1=k1, b=b)
