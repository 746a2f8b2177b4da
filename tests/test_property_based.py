"""Property-based correctness: the engine's trickiest operator semantics
checked against independent pandas implementations on randomized inputs.

These harden exactly the semantics SURVEY.md §7 flags as easy to get subtly
wrong: as-of join tie/ordering behavior and calendar-aligned bucket
boundaries. Example counts are small (each example round-trips through
Spark) but the generators hit the edge cases that matter: equal timestamps,
empty sides, bucket-boundary points.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ambient_sound_analysis_api_spark.operators.aggregations import resample_mean
from ambient_sound_analysis_api_spark.operators.joins import asof_join

BASE = datetime(2024, 1, 1)

# offsets in seconds — small range forces collisions and boundary hits
offsets = st.integers(min_value=0, max_value=600)


@st.composite
def asof_inputs(draw):
    left = draw(st.lists(offsets, min_size=1, max_size=15))
    right = draw(st.lists(offsets, min_size=0, max_size=15))
    return left, right


@given(asof_inputs())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(spark, inputs):
    left_off, right_off = inputs
    left_rows = [(i, BASE + timedelta(seconds=s)) for i, s in enumerate(left_off)]
    # deduplicate right timestamps: merge_asof tie-handling on duplicate
    # right keys is positional, ours is value-deterministic; the engine
    # contract (docstring) requires a unique right ts per key, as the
    # registry's asof query enforces with a pre-reduce.
    right_rows = [
        (100 + j, ts)
        for j, ts in enumerate(
            sorted({BASE + timedelta(seconds=s) for s in right_off})
        )
    ]
    l_df = spark.createDataFrame(left_rows, "event_id long, ts timestamp").withColumn(
        "k", l_lit()
    )
    r_df = spark.createDataFrame(
        right_rows or [(None, None)], "r_id long, r_ts timestamp"
    )
    if not right_rows:
        r_df = r_df.filter("r_id is not null")
    r_df = r_df.withColumn("k", l_lit())

    got = {
        r["event_id"]: r["r_id"]
        for r in asof_join(
            l_df, r_df, on="k", left_ts="ts", right_ts="r_ts", right_values=["r_id"]
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "ts"]).sort_values(
        ["ts", "event_id"]
    )
    rp = pd.DataFrame(right_rows, columns=["r_id", "r_ts"]).sort_values("r_ts")
    if right_rows:
        exp_df = pd.merge_asof(
            lp, rp, left_on="ts", right_on="r_ts", direction="backward"
        )
        expected = {
            int(r.event_id): (None if pd.isna(r.r_id) else int(r.r_id))
            for r in exp_df.itertuples()
        }
    else:
        expected = {int(i): None for i, _ in left_rows}
    assert got == expected


def l_lit():
    from pyspark.sql import functions as F

    return F.lit("k")


@given(st.lists(st.tuples(offsets, st.floats(-100, 100)), min_size=1, max_size=30))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_resample_mean_matches_pandas_resample(spark, points):
    rows = [(BASE + timedelta(seconds=s), float(v)) for s, v in points]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r["bucket_ts"]: r["mean_value"]
        for r in resample_mean(df, 60).collect()
    }
    pdf = pd.DataFrame(rows, columns=["ts", "value"]).set_index("ts")
    exp = pdf.resample("60s").mean().dropna()
    expected = {ts.to_pydatetime(): v for ts, v in exp["value"].items()}
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-9)


@given(st.lists(offsets, min_size=1, max_size=25))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sessionize_matches_gaps_and_islands(spark, secs):
    from ambient_sound_analysis_api_spark.operators.aggregations import sessionize

    gap = 60
    rows = [("u", BASE + timedelta(seconds=s)) for s in sorted(set(secs))]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    got = sorted(
        (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap, keys=["user"]).collect()
    )
    # reference: break strictly when the gap exceeds the threshold
    expected = []
    cur = [rows[0][1]]
    for _, ts in rows[1:]:
        if (ts - cur[-1]).total_seconds() > gap:
            expected.append((cur[0], cur[-1], len(cur)))
            cur = [ts]
        else:
            cur.append(ts)
    expected.append((cur[0], cur[-1], len(cur)))
    assert got == sorted(expected)


# ---------------------------------------------------------------------------
# round-11 eval metrics: structural invariants on randomized inputs


@st.composite
def scored_labels(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    scores = draw(
        st.lists(
            st.integers(min_value=0, max_value=9),
            min_size=n, max_size=n,
        )
    )
    labels = draw(
        st.lists(st.integers(min_value=0, max_value=1), min_size=n, max_size=n)
    )
    # need at least one of each class for AUC to be defined
    if all(y == 1 for y in labels):
        labels[0] = 0
    if all(y == 0 for y in labels):
        labels[0] = 1
    return scores, labels


@given(scored_labels())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_auc_invariant_under_monotone_score_transform(spark, inputs):
    """AUC is a rank statistic: any strictly increasing transform of the
    scores must leave it unchanged (catches accidental use of score
    VALUES rather than order in the rank reduction)."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.evalmetrics import binary_auc

    scores, labels = inputs
    rows = [(s / 10.0, y) for s, y in zip(scores, labels)]
    df = spark.createDataFrame(rows, "s double, y int")
    a1 = binary_auc(df, F.col("s"), F.col("y") == 1).collect()[0]
    # strictly increasing affine transform, still within DECIMAL(10,6)
    a2 = binary_auc(
        df, F.col("s") * 0.5 + 0.25, F.col("y") == 1
    ).collect()[0]
    assert a1.auc == a2.auc
    assert (a1.n_pos, a1.n_neg) == (a2.n_pos, a2.n_neg)


@given(scored_labels())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_auc_matches_pairwise_definition(spark, inputs):
    """The histogram/midrank reduction must equal the O(P·N) textbook
    definition: mean over (pos, neg) pairs of [s_p > s_n] + 0.5·[s_p = s_n]."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.evalmetrics import binary_auc

    scores, labels = inputs
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    expected = wins / (len(pos) * len(neg))
    df = spark.createDataFrame(
        [(s / 10.0, y) for s, y in zip(scores, labels)], "s double, y int"
    )
    got = binary_auc(df, F.col("s"), F.col("y") == 1).collect()[0].auc
    assert got == pytest.approx(expected, abs=1e-6)


@given(scored_labels())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_confusion_cells_partition_the_corpus(spark, inputs):
    """tp+fp+fn+tn == n at every threshold, and recall is monotonically
    non-increasing in the threshold."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.evalmetrics import (
        confusion_sweep,
    )

    scores, labels = inputs
    df = spark.createDataFrame(
        [(s / 10.0, y) for s, y in zip(scores, labels)], "s double, y int"
    )
    rows = confusion_sweep(
        df, F.col("s"), F.col("y") == 1, thresholds=[0.2, 0.5, 0.8]
    ).collect()
    n = len(scores)
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == n
    recalls = [r.rec for r in sorted(rows, key=lambda r: r.threshold)]
    vals = [x for x in recalls if x is not None]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=3, max_size=24))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cusum_shift_invariant_under_constant_offset(spark, vals):
    """Adding a constant to every bucket must not move the changepoint
    or the shift estimate (CUSUM centers on the global mean)."""
    from datetime import datetime, timedelta

    from ambient_sound_analysis_api_spark.operators.timeseries import (
        cusum_changepoint,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(minutes=5 * i), float(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "bucket_ts timestamp, xb double")
    r1 = cusum_changepoint(df).collect()[0]
    df2 = spark.createDataFrame(
        [(t, v + 1000.0) for t, v in rows], "bucket_ts timestamp, xb double"
    )
    r2 = cusum_changepoint(df2).collect()[0]
    assert r1.cp_ts == r2.cp_ts
    assert r1.max_abs_cusum == pytest.approx(r2.max_abs_cusum, abs=1e-5)
    if r1.shift is not None and r2.shift is not None:
        assert r1.shift == pytest.approx(r2.shift, abs=1e-5)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=15,
    ),
    st.sampled_from([0.25, 0.5, 0.75, 1.0]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_token_budget_selection_monotone_in_budget(spark, docs, frac):
    """A larger budget must select a superset of score classes (q_cut is
    non-increasing in budget_frac), and the selected token mass must
    respect the budget."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.sampling import (
        token_budget_select,
    )

    rows = [("s", q / 10.0, nt) for q, nt in docs]
    df = spark.createDataFrame(rows, "source string, q double, nt int")
    total = sum(nt for _, nt in docs)
    out = token_budget_select(df, F.col("q"), F.col("nt"), budget_frac=frac).collect()
    sel = sum(r.n_tokens for r in out)
    assert sel <= frac * total + 1e-9
    if frac < 1.0:
        bigger = token_budget_select(
            df, F.col("q"), F.col("nt"), budget_frac=1.0
        ).collect()
        sel_big = sum(r.n_tokens for r in bigger)
        assert sel_big >= sel
        assert sel_big == total  # frac=1 admits every class


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=2,
        max_size=20,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rebalance_conserves_membership(spark, points):
    """Rebalancing moves vectors, never creates or destroys them:
    Σ n_primary = Σ n_final = n, Σ n_in = Σ n_out, and no cell ends
    above cap unless it RECEIVED spill (second hops are uncapped)."""
    from pyspark.sql import functions as F

    from ambient_sound_analysis_api_spark.operators.caching import (
        release_caches,
    )
    from ambient_sound_analysis_api_spark.operators.clustering import (
        rebalance_overflow,
    )

    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(points)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[-10.0, 0.0], [10.0, 0.0], [0.0, 15.0]]
    try:
        out = rebalance_overflow(df, cents, cap_factor=1.0).collect()
    finally:
        release_caches()
    n = len(points)
    assert sum(r.n_primary for r in out) == n
    assert sum(r.n_final for r in out) == n
    assert sum(r.n_in for r in out) == sum(r.n_out for r in out)
    for r in out:
        assert r.n_final == r.n_primary - r.n_out + r.n_in
        if r.n_final > r.cap:
            assert r.n_in > 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=3,
        max_size=20,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rebalance_fixpoint_conserves_and_caps(spark, points):
    """The fixpoint cascade conserves membership (Σ n_primary =
    Σ n_final = n) and, when it reports stable, EVERY cell is ≤ cap —
    the guarantee the one-pass variant can't make. With cap_factor ≥ 1
    and k·cap ≥ n a quiescent state exists, so 3 centroids × ≤20 points
    must stabilize within k rounds."""
    from ambient_sound_analysis_api_spark.operators.caching import (
        release_caches,
    )
    from ambient_sound_analysis_api_spark.operators.clustering import (
        rebalance_fixpoint,
    )

    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(points)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[-10.0, 0.0], [10.0, 0.0], [0.0, 15.0]]
    try:
        out = rebalance_fixpoint(df, cents, cap_factor=1.0, max_rounds=3).collect()
    finally:
        release_caches()
    n = len(points)
    assert sum(r.n_primary for r in out) == n
    assert sum(r.n_final for r in out) == n
    for r in out:
        assert 0 <= r.n_moved <= r.n_final
    stable = out[0].stable
    if stable:
        for r in out:
            assert r.n_final <= r.cap


def _brute_covered_positions(texts: dict[int, str], L: int) -> dict[int, set]:
    """O(n²) reference: per doc, the 1-based positions covered by an
    L-gram that occurs >= 2 times anywhere in the corpus."""
    from collections import Counter

    counts: Counter = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            counts[t[i:i + L]] += 1
    covered: dict[int, set] = {d: set() for d in texts}
    for d, t in texts.items():
        for i in range(len(t) - L + 1):
            if counts[t[i:i + L]] >= 2:
                covered[d].update(range(i + 1, i + L + 1))
    return covered


@given(
    st.lists(
        st.text(alphabet="ab", min_size=0, max_size=14),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=2, max_value=5),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_spans_match_bruteforce(spark, texts, L):
    """The linear L-gram construction's covered positions equal the
    brute-force duplicated-substring coverage on adversarial tiny
    alphabets (aa…ab self-overlap, cross- and within-doc repeats)."""
    from ambient_sound_analysis_api_spark.operators.dedup import (
        exact_substring_spans,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    spans = exact_substring_spans(docs, min_len=L).collect()
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in spans:
        got[r.doc_id].update(range(r.span_start, r.span_end + 1))
    want = _brute_covered_positions(dict(enumerate(texts)), L)
    assert got == want
