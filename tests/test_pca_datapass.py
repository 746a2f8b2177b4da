"""The covariance-free (data-pass) PCA path vs the exact-covariance path.

Cross-engine exactness of each path is covered by its own DuckDB oracle
(``emb_pca_top_component``, ``emb_pca_datapass``); these tests pin that the
two paths compute the SAME component (they differ only in rounding routes,
so agreement is to ~1e-5, not bit-exact) — including at d=512, where the
covariance path's per-vector d² pair expansion is exactly what the
data-pass variant exists to avoid — and that the data-pass plan really is
free of the d² self-join."""

from __future__ import annotations

import math

import pytest

from ambient_sound_analysis_api_spark.operators.linalg import (
    pca_top_component,
    pca_top_component_datapass,
)


def _synthetic(spark, n: int, d: int):
    """Deterministic rows with a planted dominant direction: component k of
    row r is sin-based noise plus a shared signal on the first two dims."""
    rows = []
    amp = math.sqrt(d)  # total noise variance grows with d; keep the
    # planted direction dominant at every tested dimensionality
    for r in range(n):
        signal = math.sin(r * 0.7)
        vec = [
            round(0.2 * math.sin(0.13 * (r * d + k)), 4) for k in range(d)
        ]
        vec[0] = round(vec[0] + amp * signal, 4)
        vec[1] = round(vec[1] - 0.5 * amp * signal, 4)
        rows.append((r, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.parametrize("n,d", [(60, 64), (40, 512)])
def test_datapass_matches_covariance_path(spark, n, d):
    emb = _synthetic(spark, n, d)
    a = {
        r["dim"]: r
        for r in pca_top_component(emb, dim=d, n_iter=3).collect()
    }
    b = {
        r["dim"]: r
        for r in pca_top_component_datapass(emb, dim=d, n_iter=3).collect()
    }
    assert set(a) == set(b) == set(range(1, d + 1))
    for i in range(1, d + 1):
        assert a[i]["loading"] == pytest.approx(b[i]["loading"], abs=2e-5)
    assert a[1]["eigenvalue"] == pytest.approx(
        b[1]["eigenvalue"], rel=1e-4
    )
    # the planted direction dominates: |loading| on dims 1-2 dwarfs noise
    assert abs(b[1]["loading"]) > 5 * max(
        abs(b[i]["loading"]) for i in range(3, d + 1)
    )


def test_datapass_plan_has_no_dsquared_self_join(spark):
    """The data-pass plan must never join the centered long-form with
    itself on vec_id to FORM PAIRS of dimensions (the d² expansion). Its
    only vec_id join attaches the 1-column per-row dot product — so no
    plan node may output (i, j) dimension pairs."""
    emb = _synthetic(spark, 20, 64)
    plan = pca_top_component_datapass(emb, dim=64, n_iter=1)._jdf.queryExecution().optimizedPlan().toString()
    # the covariance path's signature is an aggregate keyed on both i and j
    assert "i#" in plan
    assert ", j#" not in plan and "j#" not in plan