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
