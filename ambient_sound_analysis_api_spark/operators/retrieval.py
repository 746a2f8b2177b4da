"""Retrieval-prep operators: inverted index build and BM25 scoring.

The RAG / retrieval side of a training-data pipeline: build the
term → postings structure a sparse retriever needs, and score documents
against a term query with BM25 (the Lucene/Okapi default). Everything
is explode → partial-agg → equi-join — the same scan-shaped plans as the
vocabulary/TF-IDF queries, so the build parallelizes with the corpus
and no Python touches the hot path.

Determinism across engines (for the DuckDB oracles): document length
and term frequencies are exact integers; ``avgdl`` is one double
division of exact integers; the ``ln`` in idf is rounded to 6 decimals
at the point it enters arithmetic (absorbing last-ulp libm differences,
the ``operators.lm`` contract) and per-term scores are summed in
DECIMAL so partition order cannot perturb the total.

Extension surface beyond the reference (SURVEY.md §7.7 charter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import letter_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def term_frequencies(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) over letter/digit-run tokens — one explode +
    one map-side-combined aggregation."""
    return (
        docs.select("doc_id", F.explode(letter_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def inverted_index(docs: DataFrame, min_df: int = 5, postings_cap: int = 20) -> DataFrame:
    """term → (df, cf, head of the sorted posting list).

    ``df`` (document frequency) and ``cf`` (collection frequency) are
    exact over the whole corpus; the posting list is capped at
    ``postings_cap`` entries so row width stays bounded no matter how
    common the term — the index row for "the" must not be a 100 MB
    string at 100 TB. The cap is enforced BEFORE any list materializes:
    a ``row_number`` window ranks postings per term and only the head
    survives into ``collect_list`` — ``slice(sort_array(collect_list))``
    would gather a stop-word's entire billion-row posting set into one
    aggregation buffer before discarding it. The window and both
    aggregations hash-partition on ``term``, so Catalyst reuses one
    exchange across them.

    The ``min_df`` filter is applied to the STATS side first and
    semi-joined into the window input, so sub-threshold terms — typically
    the overwhelming majority of the vocabulary (typos, hashes, ids) —
    never pay for ranking or list assembly; only their cheap stats row is
    computed and discarded.
    """
    from pyspark.sql import Window

    tf = term_frequencies(docs)
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).filter(F.col("df") >= min_df)
    w = Window.partitionBy("term").orderBy("doc_id")
    heads = (
        tf.join(stats.select("term"), "term", "left_semi")
        .select("term", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= postings_cap)
        .groupBy("term")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("postings_head")
        )
    )
    return stats.join(heads, "term")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k documents for a bag-of-terms query.

    Plan shape: the per-(doc,term) tf table is filtered to the query
    terms *before* its aggregation (the ``isin`` rides the explode, so
    only query-term postings shuffle); per-term document frequencies
    aggregate from that same filtered stream; corpus stats (N, avgdl)
    are a 1-row broadcast. Scoring is pure codegen arithmetic; the
    global top-k is a ``TakeOrderedAndProject`` keyed on a fixed-point
    cast of the rounded score (ADVICE round-5: never rank on raw
    doubles across engines) with doc_id tie-break.
    """
    terms = [t.lower() for t in query_terms]
    dl = docs.select(
        "doc_id", F.size(letter_tokens(F.col("text"))).alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )  # 1 row
    tf = (
        docs.select("doc_id", F.explode(letter_tokens(F.col("text"))).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    # tf (query-term postings) ⋈ dl (corpus lengths) is a plain equi-join
    # on doc_id — AQE broadcasts whichever side is small at runtime; the
    # per-term df and the 1-row corpus stats are explicit broadcasts.
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    # Lucene BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)), 6dp-rounded.
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        6,
    )
    tfnorm = (F.col("tf") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    per_term = F.round(idf * tfnorm, 6).cast("decimal(20,6)")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(per_term).cast("double").alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(
            F.col("bm25").cast("decimal(32,12)").desc(), F.col("doc_id")
        )
        .limit(k)
    )
