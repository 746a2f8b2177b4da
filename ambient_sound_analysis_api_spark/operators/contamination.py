"""Benchmark decontamination: n-gram overlap between a training corpus and
a held-out evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C, PaLM, Llama):
any training document sharing an n-gram with a benchmark document is
flagged (and usually dropped or redacted) so evaluation numbers aren't
inflated by memorized test data. Real pipelines use 8–13-token grams; the
operator takes ``n`` as a knob.

Plan shape at 100 TB: shingle both sides to 64-bit hashes (8-byte longs on
the wire, not strings), distinct per doc, then ONE equi-join on the
shingle hash — the benchmark side is tiny relative to the corpus, so the
join is a broadcast candidate; candidates are bounded by shared shingles
(never an all-pairs product). The report aggregation is one shuffle keyed
on the flagged train doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_ngram_hashes
from .caching import tracked_persist


def contamination_report(
    df: DataFrame,
    bench_pred: Column,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs sharing any token-``n``-gram with the benchmark
    split (rows where ``bench_pred`` is true).

    Returns one row per *contaminated* training doc:
    ``(doc_id, n_shared, n_bench_docs)`` — how many distinct shingles it
    shares with the benchmark, and how many distinct benchmark docs it
    collides with (the triage signal: 1 shared gram with 1 doc is a
    boilerplate accident; hundreds across many docs is a leaked split).

    Shingles are xxhash64'd tuples (see ``token_ngram_hashes``): distinct
    counts match the string form modulo 64-bit collisions, the established
    convention of the near-dup family (``dedup.ngram_jaccard_pairs``).
    """
    # Persist the COMPACT per-doc shingle arrays: both join branches below
    # re-explode from this cache, so the corpus is tokenized/hashed ONCE
    # instead of once per branch (the same pattern as
    # ``dedup.ngram_jaccard_pairs`` — shingling is the dominant cost).
    arrs = df.select(
        F.col(id_col).alias("id"),
        bench_pred.alias("_is_bench"),
        F.array_distinct(token_ngram_hashes(F.col(text_col), n)).alias("_arr"),
    )
    # Tracked persist: callers release via ``operators.caching.release_caches``
    # once results are materialized (a long-lived session would otherwise
    # accumulate one corpus-sized cache entry per invocation).
    arrs = tracked_persist(arrs)
    exploded = arrs.select(
        "id", "_is_bench", F.explode(F.col("_arr")).alias("shingle")
    )
    bench = exploded.filter(F.col("_is_bench")).select(
        F.col("id").alias("bench_id"), "shingle"
    )
    train = exploded.filter(~F.col("_is_bench")).select("id", "shingle")
    # benchmark shingle set is model/benchmark-sized, not corpus-sized —
    # broadcast it onto the train scan so the corpus never shuffles
    joined = train.join(F.broadcast(bench), "shingle")
    return (
        joined.groupBy("id")
        .agg(
            F.countDistinct("shingle").alias("n_shared"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_shared"),
            F.col("n_bench_docs"),
        )
    )
