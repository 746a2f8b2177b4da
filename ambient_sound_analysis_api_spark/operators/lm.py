"""Corpus n-gram language-model scoring.

A CCNet-style quality signal without an external model: train add-one
(Laplace) smoothed bigram statistics over the corpus itself, then score
every document by its mean token log-probability. Documents whose bigrams
are rare in the corpus (boilerplate-free, but also gibberish) score low;
heavily templated text scores high — both tails are what a curation
pipeline inspects.

Everything is count tables + equi-joins:

- unigram/bigram count tables are one ``explode → groupBy`` each with
  map-side partial aggregation (shuffle moves (token, partial-count)
  pairs, not positions);
- scoring is two equi-joins of the per-position bigram stream against
  those tables plus a 1-row broadcast of the vocabulary size;
- the only skew risk is stop-word bigrams ("of the") concentrating a
  count-table key — harmless here because the count tables are *joined
  back* (fan-out read side), not re-aggregated on the hot key; AQE skew
  handling covers the join.

Determinism across engines: every probability is a ratio of exact
integers evaluated in one double division, its ``ln`` rounded to 6
decimals and summed in DECIMAL — so micro-batch/partition order cannot
perturb the per-doc sum, and the final per-token average is a single
IEEE division. (The 6-decimal rounding also absorbs any last-ulp
difference between libm implementations of ``ln``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score each document by mean add-one-smoothed bigram log-probability.

    P(b|a) = (c(ab) + 1) / (c(a) + V) with counts over the whole corpus and
    V = |vocabulary|. Returns (id, n_bigrams, avg_logprob) for every doc
    with at least one bigram; ``avg_logprob`` is
    ``CAST(sum_6dp_logprobs AS DOUBLE) / n_bigrams``.
    """
    from .caching import tracked_persist

    # persisted: the normalize+tokenize projection feeds four consumers
    # (unigram counts, vocabulary size, bigram counts, the scored join
    # stream) — without the cache the regexp chain ran once per consumer
    toks = tracked_persist(
        df.select(
            F.col(id_col),
            tokens(normalize_text(F.col(text_col))).alias("toks"),
        )
    )
    uni = toks.select(F.col(id_col), F.explode("toks").alias("token"))
    ug = tracked_persist(uni.groupBy("token").agg(F.count("*").alias("c_ug")))
    # |vocabulary| is BY DEFINITION the unigram table's row count — same
    # value as countDistinct(token) over the corpus without a second
    # corpus-wide aggregation pass
    vocab = ug.agg(F.count("*").alias("v"))
    bg_stream = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(concat(toks[i], ' ', toks[i + 1]) AS bigram,"
                    " toks[i] AS tok1))"
                )
            ).alias("bg"),
        )
        .select(F.col(id_col), F.col("bg.bigram"), F.col("bg.tok1"))
    )
    from pyspark.sql import Window

    # c(ab) attaches to every bigram occurrence via ONE count window on
    # the same key the former groupBy+self-join shuffled twice (round-15,
    # guide §2.4: the count and the attach share the bigram exchange);
    # identical counts, one exchange of the bigram stream instead of two
    lp = F.round(
        F.log(
            (F.col("c_bg") + F.lit(1)).cast("double")
            / (F.col("c_ug") + F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    scored = (
        bg_stream.withColumn(
            "c_bg", F.count("*").over(Window.partitionBy("bigram"))
        )
        .join(ug, bg_stream["tok1"] == ug["token"])
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), lp.alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("lp").cast("double") / F.count("*")).alias("avg_logprob"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", min_word_len: int = 2
) -> DataFrame:
    """One BPE-training merge step: corpus-weighted adjacent-symbol pair
    frequencies (Sennrich et al., 2016 — the statistic whose argmax picks
    the next merge).

    Runs on the WORD-FREQUENCY table, not the corpus: tokenizer training
    folds the corpus to distinct words first (vocabulary-sized — millions
    of rows at 100 TB, not billions), then counts each word's adjacent
    character pairs weighted by the word's corpus frequency. The fold is
    one map-side-combined ``groupBy``; pair extraction is a codegen
    ``transform(sequence(...))`` over the tiny word table; the final
    aggregation shuffles (pair, partial-sum) rows bounded by the symbol
    alphabet squared. ``substring`` pair extraction matches the oracle's
    1-based semantics exactly.

    Returns ``(a, b, merged, pair_freq)`` unranked; callers rank/limit.
    Single-character words carry no pairs and are dropped by
    ``min_word_len`` (``sequence(1, 0)`` would run DESCENDING in Spark —
    the guard is load-bearing, not cosmetic).
    """
    from ..functions.text import letter_tokens

    words = df.select(
        F.explode(letter_tokens(F.col(text_col))).alias("word")
    ).filter(F.length("word") >= min_word_len)
    wf = words.groupBy("word").agg(F.count("*").alias("freq"))
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> struct(substring(word, i, 1) AS a,"
                " substring(word, i + 1, 1) AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("freq", "p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.sum("freq").cast("long").alias("pair_freq"))
        .select("a", "b", F.concat("a", "b").alias("merged"), "pair_freq")
    )


def pmi_collocations(
    df: DataFrame, text_col: str = "text", min_count: int = 25
) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks, 1990):
    adjacent token pairs whose joint frequency beats the independence
    assumption — the statistical phrase-mining step that seeds multi-word
    vocabulary entries ("new york", "machine learning") for tokenizer and
    n-gram pipelines.

    PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p(ab) over the bigram
    stream and p(a), p(b) over the unigram stream. All counts are exact
    integers aggregated map-side; the two corpus totals ride ONE 1-row
    broadcast; the two unigram-count joins read the same count table.
    ``min_count`` prunes the noisy low-frequency tail BEFORE the joins,
    so the fan-out side of the count-table joins is the (tiny) surviving
    collocation set, not the corpus. The ``ln`` is a single IEEE
    evaluation of a ratio of exact integers, rounded to 6 decimals
    (``operators.lm`` cross-engine contract).

    Returns ``(a, b, n_ab, pmi)`` unranked; callers rank/limit.
    """
    from ..functions.text import letter_tokens

    toks = df.select(letter_tokens(F.col(text_col)).alias("toks"))
    uni = toks.select(F.explode("toks").alias("token"))
    ug = uni.groupBy("token").agg(F.count("*").alias("c_ug"))
    bg = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS a, toks[i + 1] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    totals = uni.agg(F.count("*").alias("n_uni")).crossJoin(
        toks.select(
            F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("n_bi")
        )
    )  # 1 row × 1 row
    ua = ug.select(F.col("token").alias("a"), F.col("c_ug").alias("c_a"))
    ub = ug.select(F.col("token").alias("b"), F.col("c_ug").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") / F.col("n_bi"))
            / (
                (F.col("c_a").cast("double") / F.col("n_uni"))
                * (F.col("c_b").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    # The SMALL side of the count-table joins is the pruned collocation
    # set, not the vocabulary (100M+ tokens at corpus scale — never
    # broadcast-able); the hint rides bg so only vocab partitions that
    # match stream, and AQE would pick the same plan unhinted.
    return (
        bg.hint("broadcast")
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(totals))
        .select("a", "b", "n_ab", pmi.alias("pmi"))
    )


def _bpe_symbols(df: DataFrame, text_col: str, min_word_len: int) -> DataFrame:
    """Round-0 BPE state: the word-frequency table split to one row per
    (word, freq, position, single-char symbol)."""
    from ..functions.text import letter_tokens

    words = df.select(
        F.explode(letter_tokens(F.col(text_col))).alias("word")
    ).filter(F.length("word") >= min_word_len)
    wf = words.groupBy("word").agg(F.count("*").alias("freq"))
    return wf.select(
        "word",
        "freq",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            )
        ).alias("i", "s"),
    )


# bpe_apply truncates lineage after this many merges: ~6 window ops per
# merge keeps a 12-merge chunk well under Catalyst's comfortable plan
# size, while short (in-repo) merge lists never checkpoint at all.
_APPLY_CHECKPOINT_EVERY = 12


def _bpe_apply_merge(paired: DataFrame, ba: str, bb: str) -> DataFrame:
    """Greedy-left non-overlapping application of one merge (a, b) to a
    ``(word, freq, j, s, s_next)`` paired symbol table — the
    gaps-and-islands step shared by the trainer and the apply-only
    encoder: positions where the pair matches form maximal consecutive
    chains, every ODD chain member applies, its successor is consumed.
    Returns the merged ``(word, freq, i, s)`` symbol table (lazy)."""
    from pyspark.sql import Window

    w_match = Window.partitionBy("word").orderBy("j")
    m = paired.select(
        "word",
        "freq",
        "j",
        "s",
        (
            (F.col("s") == F.lit(ba)) & (F.col("s_next") == F.lit(bb))
        ).alias("is_match"),
        F.lit(ba).alias("ba"),
        F.lit(bb).alias("bb"),
    )
    mm = m.withColumn(
        "mrn",
        F.when(
            F.col("is_match"),
            F.row_number().over(
                Window.partitionBy("word", "is_match").orderBy("j")
            ),
        ),
    )
    isl = mm.withColumn(
        "island", F.when(F.col("is_match"), F.col("j") - F.col("mrn"))
    )
    applied = isl.withColumn(
        "applied",
        F.coalesce(
            F.col("is_match")
            & (
                (
                    F.row_number().over(
                        Window.partitionBy("word", "island").orderBy("j")
                    )
                    % 2
                )
                == 1
            ),
            F.lit(False),
        ),
    )
    nxt = applied.withColumn(
        "applied_prev",
        F.lag("applied").over(w_match),
    ).filter(~F.coalesce(F.col("applied_prev"), F.lit(False)))
    return nxt.select(
        "word",
        "freq",
        F.col("j").alias("i"),
        F.when(
            F.col("applied"), F.concat(F.col("ba"), F.col("bb"))
        )
        .otherwise(F.col("s"))
        .alias("s"),
    )


def bpe_apply(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    min_word_len: int = 2,
) -> DataFrame:
    """Tokenizer APPLICATION: encode the corpus with an already-trained
    merge list — the serve-path twin of :func:`bpe_train`, with the
    counting/argmax machinery gone. The merge list is model state
    (model-sized, the k-means-centroid contract), so application is ONE
    lazy plan: no per-round pair-count aggregation, no driver collects,
    no checkpoints — every round's windows are partitioned by ``word``,
    so the whole chain runs off a single exchange. Produces the same
    ``(word, freq, i, s)`` symbol table ``bpe_train(...,
    return_symbols=True)`` returns after its final round (shared
    ``_bpe_apply_merge`` kernel — the two paths cannot diverge).

    Each merge adds ~6 window operators to the lazy plan, all partitioned
    by ``word`` (one exchange total) — fine for the short merge lists the
    in-repo models train, but a production-sized tokenizer (thousands of
    merges) would grow an analyzer-blowup-sized expression tree. Lineage
    is therefore truncated with ``localCheckpoint`` every
    ``_APPLY_CHECKPOINT_EVERY`` merges (round-14 ADVICE); below that
    bound the chain stays fully lazy, so short-list serve plans are
    unchanged."""
    from pyspark.sql import Window

    sym = _bpe_symbols(df, text_col, min_word_len)
    w_seq = Window.partitionBy("word").orderBy("i")
    for n_applied, (ba, bb) in enumerate(merges, start=1):
        cur = sym.select(
            "word", "freq", F.row_number().over(w_seq).alias("j"), "s"
        )
        paired = cur.select(
            "word",
            "freq",
            "j",
            "s",
            F.lead("s").over(
                Window.partitionBy("word").orderBy("j")
            ).alias("s_next"),
        )
        sym = _bpe_apply_merge(paired, ba, bb)
        if n_applied % _APPLY_CHECKPOINT_EVERY == 0 and n_applied < len(
            merges
        ):
            sym = sym.localCheckpoint()
    return sym


def bpe_train(
    df: DataFrame,
    n_rounds: int = 3,
    text_col: str = "text",
    min_word_len: int = 2,
    return_symbols: bool = False,
):
    """Exact multi-round BPE training (Sennrich et al. 2016): run
    ``n_rounds`` full merge iterations — count adjacent symbol pairs,
    pick the most frequent (count desc, pair asc tie-break), APPLY the
    merge to every word, repeat on the merged sequences — and return one
    row per round: ``(round, a, b, merged, pair_freq)``.

    ``pipeline_bpe_merge_pairs`` demonstrated the counting statistic;
    this is the actual trainer loop, with the part every toy version
    gets wrong done exactly: **greedy-left non-overlapping application**.
    Counting is naive-adjacent (the reference BPE convention — "aaa"
    contributes (a,a) twice), but application must consume left-to-right
    ("a a a a" + merge (a,a) → "aa aa", never "a aa a"), and regex
    replacement cannot express that on overlapping runs. Relationally it
    is gaps-and-islands: positions where the pair matches form maximal
    consecutive chains, and within each chain every ODD member (1st,
    3rd, ...) applies while its successor is consumed.

    Scale shape: everything runs on the word-FREQUENCY table (vocabulary-
    sized, the fold every real trainer does), as a per-round pipeline of
    three ``word``-partitioned windows (sequence re-index, pair lead,
    island parity) + one vocabulary-sized aggregation. The chosen merge is
    COLLECTED per round (one row — the merge table IS model state, the
    same model-sized-collect contract as the k-means centroids) and
    applied as plan literals, and the symbol table is ``localCheckpoint``ed
    each round — the repo's iterative-operator convention (``graph.py``,
    ``clustering.py``). Without the checkpoint, round N's lineage re-ran
    rounds 1..N−1's window chains once per downstream branch (~2×
    redundant work at 3 rounds, growing quadratically with rounds). Each
    round's state is (word, freq, position, symbol) — rows only ever
    shrink as merges apply.
    """
    from pyspark.sql import Window

    sym = _bpe_symbols(df, text_col, min_word_len)

    w_seq = Window.partitionBy("word").orderBy("i")
    merges = []
    for rnd in range(1, n_rounds + 1):
        # re-index to dense sequence positions j, pair up with lead
        cur = sym.select(
            "word", "freq", F.row_number().over(w_seq).alias("j"), "s"
        )
        paired = cur.select(
            "word",
            "freq",
            "j",
            "s",
            F.lead("s").over(
                Window.partitionBy("word").orderBy("j")
            ).alias("s_next"),
        )
        counts = (
            paired.filter(F.col("s_next").isNotNull())
            .groupBy("s", "s_next")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best_rows = (
            counts.orderBy(
                F.col("pair_freq").desc(), F.col("s"), F.col("s_next")
            )
            .limit(1)
            .collect()  # 1 row: the round's merge — model state
        )
        if not best_rows:
            break  # no adjacent pairs left to merge
        ba, bb, bfreq = (
            best_rows[0]["s"],
            best_rows[0]["s_next"],
            best_rows[0]["pair_freq"],
        )
        merges.append((rnd, ba, bb, ba + bb, bfreq))
        # greedy-left application (shared _bpe_apply_merge kernel), then
        # localCheckpoint: truncate the per-round window-chain lineage
        # (repo iterative-operator convention) so round N never re-executes
        # rounds 1..N-1 — needed here because each round's COUNT branch
        # re-reads sym (the apply-only bpe_apply path has one consumer
        # and stays fully lazy instead)
        sym = _bpe_apply_merge(paired, ba, bb).localCheckpoint()
    out = df.sparkSession.createDataFrame(
        merges, "round int, a string, b string, merged string, pair_freq bigint"
    )
    if return_symbols:
        # the ENCODED corpus state: (word, freq, i, s) after every trained
        # merge has been applied greedy-left — what a tokenizer-apply pass
        # over the same corpus would produce (word-frequency-level)
        return out, sym
    return out


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """Zipf-law tail fit: OLS of ln(freq) on ln(rank) over the top-N
    vocabulary.

    The classic corpus-health readout — natural text shows a log-log
    slope near −1; heavily templated/boilerplate corpora flatten the
    head, spam inflates the tail.  Plan shape: token explode + grouped
    term frequencies (the ``text_vocab_topk`` scan, map-side combined),
    a deterministic TakeOrdered top-N (freq desc, token asc — no window
    over the vocabulary), then ranks via one row_number window over the
    N-row limited list and a closed-form OLS aggregate to a single row.
    Everything after the term-frequency shuffle is N-row-sized.

    Returns ONE row: (slope, intercept, r2, n_ranks, top_freq), the
    regression columns 6dp-rounded.
    """
    from pyspark.sql import Window

    from ..functions.text import letter_tokens

    tf = (
        docs.select(F.explode(letter_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(top_n)
    )
    ranked = tf.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("token"))
        ),
    ).select(
        # 12dp DECIMAL snap before the moment sums: decimal products/sums
        # are exact and associative, so every OLS input is bit-identical
        # across engines and aggregation orders (house determinism rule:
        # never raw doubles through a reduction that feeds a hash check)
        F.log(F.col("rank").cast("double")).cast("decimal(18,12)").alias("x"),
        F.log(F.col("freq").cast("double")).cast("decimal(18,12)").alias("y"),
        "freq",
        "rank",
    )
    n = F.count("*").cast("double")
    sx, sy = F.sum("x").cast("double"), F.sum("y").cast("double")
    sxx, syy, sxy = (
        F.sum(F.col("x") * F.col("x")).cast("double"),
        F.sum(F.col("y") * F.col("y")).cast("double"),
        F.sum(F.col("x") * F.col("y")).cast("double"),
    )
    cov_n = n * sxy - sx * sy
    # nullif guards: a degenerate corpus (fewer than 2 distinct ranks
    # after the top-N cut, or all-equal frequencies) zeroes a variance —
    # NULL regression columns then signal "no fit" identically on both
    # engines instead of tripping engine-specific 0-division behavior
    var_x = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    var_y = F.nullif(n * syy - sy * sy, F.lit(0.0))
    return ranked.agg(
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round((sy - (cov_n / var_x) * sx) / n, 6).alias("intercept"),
        F.round(cov_n * cov_n / (var_x * var_y), 6).alias("r2"),
        F.count("*").cast("bigint").alias("n_ranks"),
        F.max(F.when(F.col("rank") == 1, F.col("freq"))).cast("bigint").alias("top_freq"),
    )


def rake_keyphrases(
    docs: DataFrame,
    top_n: int = 20,
    max_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs, word scores
    are degree/frequency over the candidate set, and a phrase scores the
    sum of its member word scores — the classic unsupervised
    topic-surface readout for a corpus card.

    Distributed shape: one posexplode of the letter/digit token stream
    with positions; stopword flags cut the stream into segments via a
    per-document running count (window partitioned by doc — never
    global); phrases assemble with an order-pinned ``array_sort`` over
    (pos, token) structs; word degree/frequency reduce over the exploded
    phrase-word table (map-side combined, vocabulary-sized); phrase
    scores join word scores back and reduce per distinct phrase. Output
    is the deterministic top-``top_n``.

    Simplification (documented, both engines identical): token stream is
    alphanumeric runs, so PUNCTUATION does not break phrases — only
    stopwords do; runs longer than ``max_words`` are dropped (RAKE's
    standard long-run filter, which also bounds word degree).

    Cross-engine determinism: per-word scores are single IEEE divisions
    of exact integers, 6dp-snapped into DECIMAL(20,6) before the
    per-phrase sum (fixed arity ≤ ``max_words``, decimal addition
    order-free); the top-N ranks on the DECIMAL score with phrase
    tie-break.

    Returns (phrase, n_words, n_occurrences, score) ordered by
    (score desc, phrase).
    """
    from pyspark.sql import Window

    from ..functions.text import STOPWORDS, letter_tokens

    toks = docs.select(
        F.col(id_col),
        F.posexplode(letter_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    is_stop = F.col("tok").isin(STOPWORDS)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = toks.withColumn(
        "seg", F.sum(F.when(is_stop, 1).otherwise(0)).over(w)
    ).filter(~is_stop)
    phrases = (
        seg.groupBy(id_col, "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
        .select("phrase", "n_words")
    )
    from ..operators.caching import tracked_persist

    # the candidate table feeds the word-stats reduction AND the phrase
    # rollup — persist so the tokenize/segment scan runs once
    phrases = tracked_persist(phrases)
    words = phrases.select(
        F.explode(F.split("phrase", " ")).alias("word"), "n_words"
    )
    scores = words.groupBy("word").agg(
        (
            F.sum("n_words").cast("double") / F.count("*")
        ).alias("wscore")
    )
    member = (
        phrases.groupBy("phrase", "n_words")
        .agg(F.count("*").alias("n_occurrences"))
        .select(
            "phrase", "n_words", "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("word"),
        )
    )
    return (
        member.join(scores, "word")
        .groupBy("phrase", "n_words", "n_occurrences")
        .agg(
            F.sum(
                F.round(F.col("wscore"), 6).cast("decimal(20,6)")
            ).cast("double").alias("score")
        )
        .select(
            "phrase",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
            "score",
        )
        .orderBy(
            F.col("score").cast("decimal(32,12)").desc(), F.col("phrase")
        )
        .limit(top_n)
    )
