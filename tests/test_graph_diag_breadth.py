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
