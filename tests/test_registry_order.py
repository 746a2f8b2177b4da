"""Registry ordering invariants.

``queries()`` exposes plain, uncurated source-registration order (the
``@_register`` decorator appends to ``_SPECS`` in module-definition order),
and ``oracle_sql()`` is a subset of it in the same order. These tests pin
that contract so a refactor can't silently reorder or orphan an entry.
"""

from __future__ import annotations

from ambient_sound_analysis_api_spark import registry


def test_queries_match_registration_order():
    assert list(registry.queries()) == list(registry._SPECS)


def test_query_names_unique_and_nonempty():
    names = list(registry.queries())
    assert len(names) == len(set(names))
    assert all(names)


def test_queries_and_oracles_consistent():
    q = registry.queries()
    o = registry.oracle_sql()
    assert set(o) <= set(q)
    # ordering of oracle_sql follows queries() ordering
    order = {n: i for i, n in enumerate(q)}
    keys = list(o)
    assert keys == sorted(keys, key=order.__getitem__)


def test_flagship_is_registered():
    """The driver smoke-entry must map to a registered query so correctness
    evidence covers the same code path the smoke check runs."""
    assert "agg_bucket_mean_5m" in registry.queries()


def test_bench_headline_queries_are_registered():
    """Every bench.py HEADLINE entry must resolve in the registry — a
    renamed/removed query should fail here, not at bench time in the
    driver's per-round run."""
    import bench

    q = registry.queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert missing == []


def test_golden_and_bounds_queries_are_registered():
    """The golden/bounds check sets must track the registry exactly: each
    named query exists. Bounds queries must have NO SQL oracle (the bound
    envelope is their only gate, two gates would disagree about the source
    of truth); golden queries MAY carry both since round 7 — when an SQL
    oracle exists it is the source of truth and the committed golden is a
    cross-round regression belt (check_oracle refreshes it only under
    --update-golden and otherwise runs the oracle compare)."""
    from ambient_sound_analysis_api_spark.golden import GOLDEN_QUERIES
    from ambient_sound_analysis_api_spark.sketch_bounds import BOUNDS_QUERIES

    q, o = registry.queries(), registry.oracle_sql()
    for name in list(GOLDEN_QUERIES) + list(BOUNDS_QUERIES):
        assert name in q, name
    for name in BOUNDS_QUERIES:
        assert name not in o, f"{name} has both an SQL oracle and a bound"
