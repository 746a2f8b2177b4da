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


def source_overlap_matrix(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Directed cross-source shingle-containment matrix: for every ordered
    source pair (A, B), ``|shingles(A) ∩ shingles(B)| / |shingles(A)|`` —
    the corpus-composition diagnostic behind "how much of source A is
    boilerplate shared with source B" (and, run split-vs-split, the
    aggregate form of benchmark decontamination).

    Plan: one corpus scan shingles and hashes (``token_ngram_hashes`` —
    8-byte longs on the wire, never gram strings; counts agree with the
    string-keyed oracle modulo 64-bit collisions, the accepted
    ``contamination_report`` design), one distinct collapses to the
    (source, shingle-hash) universe, and the pair counts come from a
    self-equi-join on the hash — each hash key fans out at most
    |sources| × |sources| rows, so candidate volume is linear in the
    distinct universe, never quadratic in rows. Sizes ride in via a
    broadcast of the source-cardinality table (|sources| rows).
    """
    g = tracked_persist(
        df.select(
            F.col(group_col).alias("src"),
            F.explode(token_ngram_hashes(F.col(text_col), n)).alias("h"),
        ).distinct()
    )
    sizes = g.groupBy("src").agg(F.count("*").alias("n_shingles"))
    a = g.select(F.col("src").alias("source_a"), "h")
    b = g.select(F.col("src").alias("source_b"), "h")
    ov = (
        a.join(b, "h")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return ov.join(
        F.broadcast(sizes.withColumnRenamed("src", "source_a")), "source_a"
    ).select(
        "source_a",
        "source_b",
        "n_overlap",
        F.round(
            F.col("n_overlap") / F.col("n_shingles").cast("double"), 4
        ).alias("containment"),
    )


def _bench_matched_seeds(d: DataFrame, L: int, id_col: str) -> DataFrame:
    """Shared seed construction for the exact-substring contamination
    family: TRAIN positions whose L-gram also occurs in the benchmark.

    The train side (the 100 TB side) streams through the Karp-Rabin
    position generator (``dedup.kr_gram_positions`` — O(n) integer
    hashing, 8-byte keys, no substring materialization); only train
    positions whose KR hash appears in the bench KR set get the
    md5-of-substring verification against the bench md5 set, so the
    exact (md5-keyed, oracle-replayed) match semantics are unchanged
    while per-position md5 cost is paid only by the contaminated
    fraction. The bench side is the fixed-size held-out suite — hashed
    both ways over all its positions, the cheap side by construction.
    ``d`` must be shaped (id, _t, _b)."""
    from .dedup import kr_gram_positions

    kr = kr_gram_positions(d, L, id_col=id_col, text_col="_t", carry=("_b",))
    bench_kh = kr.filter(F.col("_b")).select("kh").distinct()
    cand = (
        kr.filter(~F.col("_b"))
        .join(bench_kh, "kh", "left_semi")
        .select(id_col, "o")
    )
    bench_offs = F.expr(
        f"CASE WHEN length(_t) >= {L} THEN sequence(1, length(_t) - {L} + 1) "
        "ELSE CAST(array() AS ARRAY<INT>) END"
    )
    bench_h = (
        d.filter(F.col("_b"))
        .select("_t", F.explode(bench_offs).alias("o"))
        .select(F.md5(F.expr(f"substring(_t, o, {L})")).alias("h"))
        .distinct()
    )
    return (
        cand.join(d.select(F.col(id_col), "_t"), id_col)
        .select(
            id_col, "o",
            F.md5(F.expr(f"substring(_t, o, {L})")).alias("h"),
        )
        .join(bench_h, "h", "left_semi")
        .select(id_col, "o")
    )


def substring_contamination_report(
    docs: DataFrame,
    bench_pred: Column,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-exact cross-set decontamination: maximal TRAIN-doc spans
    covered by a substring of length ≥ ``min_len`` that also occurs in
    the held-out benchmark — the exact-substring upgrade of
    :func:`contamination_report` (token 8-grams miss contamination that
    crosses token boundaries or reflows whitespace; Lee et al. 2022 run
    this family cross-set for eval hygiene).

    Same LINEAR construction as ``dedup.exact_substring_spans`` (a char
    lies in a shared ≥L substring iff a shared L-gram covers it), with
    the duplicate test replaced by membership in the benchmark's L-gram
    set — the Karp-Rabin candidate → md5-verified semi-join of
    :func:`_bench_matched_seeds` — then the per-doc gap-and-island
    union and a doc-level rollup.

    Returns flagged train docs only:
    (doc_id, n_spans, n_contaminated, contam_frac), ordered by doc_id.
    """
    from pyspark.sql import Window

    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = int(min_len)
    d = docs.select(
        F.col(id_col), F.col(text_col).alias("_t"), bench_pred.alias("_b")
    )
    seeds = _bench_matched_seeds(d, L, id_col)
    w = Window.partitionBy(id_col).orderBy("o")
    brk = F.when(F.col("o") > F.lag("o").over(w) + F.lit(L), 1).otherwise(0)
    isl = seeds.withColumn("_bk", brk).withColumn(
        "_island",
        F.sum("_bk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = isl.groupBy(id_col, "_island").agg(
        F.min("o").alias("s"), (F.max("o") + F.lit(L - 1)).alias("e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias(
            "n_contaminated"
        ),
    )
    return (
        per_doc.join(d.select(id_col, F.length("_t").alias("_len")), id_col)
        .select(
            id_col,
            "n_spans",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("_len").cast("double"), 6
            ).alias("contam_frac"),
        )
        .orderBy(id_col)
    )


def substring_decontaminate(
    docs: DataFrame,
    bench_pred: Column,
    min_len: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-exact TRAIN-SIDE SPAN REMOVAL (round-12 VERDICT #8 —
    :func:`substring_contamination_report` promoted from reporting to
    mutation): every train-doc character covered by a ≥ ``min_len``
    substring that also occurs in the held-out benchmark is removed at
    its offsets and the documents rebuilt. Span construction is the
    report's linear L-gram semi-join + gap-and-island union; the rebuild
    is the shared span fold (``dedup.rebuild_without_spans`` — no char
    explode). Returns TRAIN docs only:
    (doc_id, orig_len, n_spans, n_removed, kept_len, kept_text).

    Seed construction is the Karp-Rabin candidate → md5-verified
    semi-join shared with the report (:func:`_bench_matched_seeds`)."""
    from pyspark.sql import Window

    from .dedup import rebuild_without_spans

    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    L = int(min_len)
    d = docs.select(
        F.col(id_col), F.col(text_col).alias("_t"), bench_pred.alias("_b")
    )
    seeds = _bench_matched_seeds(d, L, id_col)
    w = Window.partitionBy(id_col).orderBy("o")
    brk = F.when(F.col("o") > F.lag("o").over(w) + F.lit(L), 1).otherwise(0)
    isl = seeds.withColumn("_bk", brk).withColumn(
        "_island",
        F.sum("_bk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = isl.groupBy(id_col, "_island").agg(
        F.min("o").alias("span_start"),
        (F.max("o") + F.lit(L - 1)).alias("span_end"),
    ).select(id_col, "span_start", "span_end")
    return rebuild_without_spans(
        docs.filter(~bench_pred), spans,
        id_col=id_col, text_col=text_col,
    )
