"""Unit tests for triangle counting, PSI drift monitoring, and the
one-pass table profiler."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.diagnostics import (
    drift_psi,
    table_profile,
)
from ambient_sound_analysis_api_spark.operators.graph import triangle_stats


def _tri(spark, edges):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.node: r for r in triangle_stats(e).collect()}


def test_triangle_single_with_pendant(spark):
    """Triangle 0-1-2 plus pendant 2-3: each triangle member counts one
    triangle; the pendant counts zero; clustering is exact."""
    out = _tri(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert out[0].triangles == 1 and out[1].triangles == 1
    assert out[2].triangles == 1 and out[3].triangles == 0
    assert out[0].clustering == 1.0  # deg 2: 2*1/(2*1)
    assert abs(out[2].clustering - round(2 * 1 / (3 * 2), 6)) < 1e-9
    assert out[3].clustering == 0.0  # degree-1 node


def test_triangle_shared_edge_counted_per_triangle(spark):
    """Two triangles sharing edge 0-1: the shared endpoints count 2."""
    out = _tri(spark, [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)])
    assert out[0].triangles == 2 and out[1].triangles == 2
    assert out[2].triangles == 1 and out[3].triangles == 1


def test_triangle_star_has_none(spark):
    """A star is triangle-free regardless of hub degree — and the hub's
    oriented out-degree is 0 under degree ordering, so the wedge join
    generates nothing at the hub (the scale property under test)."""
    out = _tri(spark, [(0, i) for i in range(1, 7)])
    assert all(r.triangles == 0 for r in out.values())
    assert out[0].degree == 6


def test_triangle_k4_complete(spark):
    """K4 has 4 triangles; every vertex sits in 3; clustering 1.0."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = _tri(spark, edges)
    assert all(out[i].triangles == 3 for i in range(4))
    assert all(out[i].clustering == 1.0 for i in range(4))


def test_triangle_out_degree_guard_trips_on_clique(spark):
    """A clique pushes oriented out-degree to ~q/2 per member; with the
    guard set below that, the wedge stage fails fast with an actionable
    message instead of emitting Θ(q³) wedges."""
    import pytest

    q = 12  # members keep up to q-1 oriented out-edges
    edges = [(a, b) for a in range(q) for b in range(a + 1, q)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(Exception, match="guard_max_out_degree"):
        triangle_stats(e, guard_max_out_degree=4).collect()
    # disabled guard → exact result: K12 has C(11,2) triangles per node
    out = {
        r.node: r
        for r in triangle_stats(e, guard_max_out_degree=None).collect()
    }
    assert all(out[i].triangles == 55 for i in range(q))
    # default guard (4096) untripped on the same graph, same answer
    out2 = {r.node: r for r in triangle_stats(e).collect()}
    assert all(out2[i].triangles == 55 for i in range(q))


def _psi_events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )


def test_psi_identical_distributions_near_zero(spark):
    rows = []
    for day in (2, 16):  # one point per period, same values
        for v in (1.0, 5.0, 9.0) * 10:
            rows.append((datetime(2024, 1, day), "t", v))
    ev = _psi_events(spark, rows)
    out = drift_psi(
        ev, (datetime(2024, 1, 1), datetime(2024, 1, 15)),
        datetime(2024, 1, 29),
    ).collect()[0]
    assert out.n_a == 30 and out.n_b == 30
    assert abs(out.psi) < 1e-9


def test_psi_shifted_distribution_flags(spark):
    rows = [(datetime(2024, 1, 2), "t", 1.0)] * 40
    rows += [(datetime(2024, 1, 20), "t", 9.0)] * 40
    ev = _psi_events(spark, rows)
    out = drift_psi(
        ev, (datetime(2024, 1, 1), datetime(2024, 1, 15)),
        datetime(2024, 1, 29),
    ).collect()[0]
    assert out.psi > 0.25  # actionable drift


def test_psi_window_bounds_exclusive(spark):
    """Rows outside [start, end) are ignored entirely."""
    rows = [(datetime(2023, 12, 31), "t", 1.0)] * 5
    rows += [(datetime(2024, 1, 2), "t", 1.0)] * 3
    rows += [(datetime(2024, 1, 20), "t", 1.0)] * 4
    rows += [(datetime(2024, 2, 5), "t", 1.0)] * 5
    ev = _psi_events(spark, rows)
    out = drift_psi(
        ev, (datetime(2024, 1, 1), datetime(2024, 1, 15)),
        datetime(2024, 1, 29),
    ).collect()[0]
    assert out.n_a == 3 and out.n_b == 4


def test_table_profile_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, None), (3, 8.0), (4, 8.0)], "a long, b double"
    )
    out = {r.column_name: r for r in table_profile(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 4 and out["a"].n_null == 0
    assert out["a"].n_distinct == 3
    assert out["a"].min_v == 1.0 and out["a"].max_v == 4.0
    assert out["b"].n_null == 1 and out["b"].n_distinct == 2
    assert out["b"].min_v == 2.0 and out["b"].max_v == 8.0


def test_table_profile_single_scan_plan(spark):
    """The profiler must read the input once: a single aggregate subtree
    (the N-way EXPAND is inside it), no union of per-column scans."""
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    buf = io.StringIO()
    with redirect_stdout(buf):
        table_profile(df, ["a", "b"]).explain("simple")
    plan = buf.getvalue()
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Union" not in plan


def test_cuped_perfect_covariate_equalizes_variants(spark):
    """When Y = 2X exactly, theta = 2 and the adjusted means of both
    variants collapse to the same value (2·global mean of X) — the
    variance-reduction identity that defines CUPED."""
    from ambient_sound_analysis_api_spark.operators.experiments import (
        cuped_adjusted_means,
    )

    rows = []
    for uid in range(40):
        x = float(1 + uid % 7)
        rows.append((datetime(2024, 1, 3), uid, x))       # pre period
        rows.append((datetime(2024, 1, 20), uid, 2 * x))  # experiment
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = cuped_adjusted_means(
        ev, datetime(2024, 1, 1), datetime(2024, 1, 15), datetime(2024, 1, 29)
    ).collect()
    assert len(out) == 2
    a, b = sorted(out, key=lambda r: r.variant)
    assert abs(a.theta - 2.0) < 1e-6 and abs(b.theta - 2.0) < 1e-6
    assert abs(a.adj_mean_y - b.adj_mean_y) < 1e-6
    assert sum(r.n_users for r in out) == 40


def test_cuped_excludes_single_period_users(spark):
    from ambient_sound_analysis_api_spark.operators.experiments import (
        cuped_adjusted_means,
    )

    rows = [
        (datetime(2024, 1, 3), 1, 5.0),   # pre only -> excluded
        (datetime(2024, 1, 20), 2, 5.0),  # post only -> excluded
        (datetime(2024, 1, 3), 3, 5.0),
        (datetime(2024, 1, 20), 3, 7.0),  # both -> kept
        (datetime(2024, 1, 4), 4, 1.0),
        (datetime(2024, 1, 21), 4, 3.0),  # both -> kept
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    out = cuped_adjusted_means(
        ev, datetime(2024, 1, 1), datetime(2024, 1, 15), datetime(2024, 1, 29)
    ).collect()
    assert sum(r.n_users for r in out) == 2


def test_covariance_matrix_exact_tiny(spark):
    from ambient_sound_analysis_api_spark.operators.linalg import (
        covariance_matrix,
    )

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {(r.i, r.j): r.c for r in covariance_matrix(emb).collect()}
    # mu = (1,1); centered = ±1 on both dims -> every cov cell = 1.0
    assert out == {(1, 1): 1.0, (1, 2): 1.0, (2, 1): 1.0, (2, 2): 1.0}


def test_pca_finds_dominant_direction(spark):
    from ambient_sound_analysis_api_spark.operators.linalg import (
        pca_top_component,
    )

    rows = [
        (t, [float(t), 0.1 * t, 0.0, 0.0]) for t in range(-10, 11)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in pca_top_component(emb, dim=4).collect()}
    # rank-1 covariance along (1, 0.1, 0, 0): loading concentrates on dim 1
    assert abs(abs(out[1].loading) - 1 / (1.01) ** 0.5) < 1e-3
    assert abs(out[2].loading / out[1].loading - 0.1) < 1e-3
    assert abs(out[3].loading) < 1e-6 and abs(out[4].loading) < 1e-6
    # unit norm
    assert abs(sum(r.loading**2 for r in out.values()) - 1.0) < 1e-6
    # Rayleigh quotient equals the data variance along the component
    var_t = sum(t * t for t in range(-10, 11)) / 21
    assert abs(out[1].eigenvalue - var_t * 1.01) < 0.05


def _bpe(spark, texts, n_rounds=2):
    from ambient_sound_analysis_api_spark.operators.lm import bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r.round, r.a, r.b, r.merged, r.pair_freq)
        for r in bpe_train(docs, n_rounds=n_rounds).orderBy("round").collect()
    ]


def test_bpe_train_two_rounds_builds_on_merged_symbol(spark):
    """Round 2 must count pairs over the MERGED sequences: after (l,l)
    wins round 1, 'hello'*N contains the pair (e, ll) — only reachable
    if the merge was actually applied."""
    out = _bpe(spark, ["hello"] * 10, n_rounds=2)
    r1 = out[0]
    # round 1: pairs he/el/ll/lo each freq 10 -> tie-break picks 'el'
    assert r1[0] == 1 and (r1[1], r1[2]) == ("e", "l") and r1[4] == 10
    # round 2 sequences are 'h el l o': candidate pairs (h,el), (el,l), (l,o)
    r2 = out[1]
    assert r2[0] == 2 and (r2[1], r2[2]) == ("el", "l")


def test_bpe_train_greedy_left_on_runs(spark):
    """'aaaa' with merge (a,a): naive counting sees 3 adjacent pairs, but
    application must produce 'aa aa' (two symbols), so round 2's top pair
    is (aa, aa) — the exact overlap semantics regex replacement gets
    wrong."""
    out = _bpe(spark, ["aaaa"] * 5, n_rounds=2)
    r1, r2 = out
    assert (r1[1], r1[2]) == ("a", "a") and r1[4] == 15  # 3 pairs x 5
    assert (r2[1], r2[2]) == ("aa", "aa") and r2[4] == 5
    # odd run: 'aaa' -> 'aa a', round 2 pair is (aa, a)
    out3 = _bpe(spark, ["aaa"] * 4, n_rounds=2)
    assert (out3[0][1], out3[0][2]) == ("a", "a") and out3[0][4] == 8
    assert (out3[1][1], out3[1][2]) == ("aa", "a") and out3[1][4] == 4


def test_bpe_train_frequency_weighting_and_tiebreak(spark):
    """Pair counts weight by word frequency; exact ties break on (a, b)
    ascending."""
    out = _bpe(spark, ["ab ab ab", "cd cd cd"], n_rounds=1)
    # (a,b) freq 3 ties (c,d) freq 3 -> (a,b) wins lexicographically
    assert (out[0][1], out[0][2], out[0][4]) == ("a", "b", 3)


def test_scd2_pit_join_matches_each_fact_exactly_once(spark, sf_dir):
    """The SCD2 non-overlap invariant: summing n_events across version
    cohorts must equal the raw fact count — no fact is duplicated across
    versions or dropped inside the validity range."""
    from pyspark.sql import functions as F2

    from ambient_sound_analysis_api_spark.registry import (
        WINDOW_START,
        _events,
        _table,
        q_pipeline_scd2_pit_join,
    )

    out = q_pipeline_scd2_pit_join(spark, sf_dir).collect()
    total_joined = sum(r.n_events for r in out)
    ev = _events(spark, sf_dir, WINDOW_START, datetime(2024, 1, 29))
    n_cust = _table(spark, sf_dir, "customer").count()
    raw = ev.filter(F2.col("user_id") < n_cust).count()
    assert total_joined == raw
    # changed cohort must appear under BOTH validity versions
    changed_versions = {r.valid_from for r in out if r.is_changed}
    assert changed_versions == {"2024-01-01", "2024-01-15"}


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    from ambient_sound_analysis_api_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 1
    toks = spark.createDataFrame(rows, "token string")
    sketch = cms_build(toks)
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "token string")
    est = {r.token: r.est_count for r in cms_estimate(sketch, keys).collect()}
    # 3 keys in 4x512 cells: no collisions -> exact
    assert est == {"a": 50, "b": 30, "c": 1}


def test_cms_absent_key_estimates_zero(spark):
    """A key never inserted must estimate 0 (its cells are empty), not be
    dropped or min'd over only-colliding cells — the CMS point-estimate
    contract for out-of-corpus probes."""
    from ambient_sound_analysis_api_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )

    toks = spark.createDataFrame([("a",)] * 5, "token string")
    sketch = cms_build(toks)
    keys = spark.createDataFrame([("a",), ("zzz_absent",)], "token string")
    est = {r.token: r.est_count for r in cms_estimate(sketch, keys).collect()}
    assert est["a"] == 5
    assert est["zzz_absent"] == 0


def test_cms_mergeable_across_shards(spark):
    """Cell-wise addition of two shard sketches equals the sketch of the
    union — the property a distributed rollup relies on."""
    from pyspark.sql import functions as F2

    from ambient_sound_analysis_api_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )

    t1 = spark.createDataFrame([("x",)] * 10 + [("y",)] * 5, "token string")
    t2 = spark.createDataFrame([("x",)] * 7 + [("z",)] * 3, "token string")
    merged = (
        cms_build(t1)
        .unionAll(cms_build(t2))
        .groupBy("seed", "cell")
        .agg(F2.sum("c").alias("c"))
    )
    direct = cms_build(t1.unionAll(t2))
    keys = spark.createDataFrame([("x",), ("y",), ("z",)], "token string")
    e_m = {r.token: r.est_count for r in cms_estimate(merged, keys).collect()}
    e_d = {r.token: r.est_count for r in cms_estimate(direct, keys).collect()}
    assert e_m == e_d == {"x": 17, "y": 5, "z": 3}


def test_ewma_constant_series_is_identity(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import q_ts_ewma_hourly

    rows = q_ts_ewma_hourly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ewma is not None
    # first bucket of each type has no history: ewma == c exactly
    first = {}
    for r in rows:
        first.setdefault(r.event_type, r)
    for r in first.values():
        assert r.ewma == float(r.c)


def test_corr_matrix_bounds_and_symmetric_pairs(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import (
        q_agg_hourly_corr_matrix,
    )

    rows = q_agg_hourly_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2 event-type pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
        # observed-hour grid (sparse at sf0.001: ~400 of 672 hours)
        assert r.n_hours > 300
        assert r.n_hours == rows[0].n_hours  # same grid for every pair
