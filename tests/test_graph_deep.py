"""Deep-graph tests for connected_components: pointer-jumping convergence,
non-convergence failure, and a union-find cross-check on random graphs.

Pure min-label propagation needs O(diameter) rounds — a 300-node chain
would need 299, and before round 5 the operator would have returned a
silently WRONG labeling once max_iter was exhausted. With the jump step
(``lbl(u) <- lbl(lbl(u))`` from round 3 on) chains converge in
O(log diameter) rounds, and exhaustion now raises instead of mislabeling.
"""

from __future__ import annotations

import random

import pytest

from ambient_sound_analysis_api_spark.operators.graph import (
    connected_components,
)


def _cc(spark, edge_list, node_ids, **kw):
    edges = spark.createDataFrame(
        edge_list or [(None, None)], "id_a long, id_b long"
    )
    if not edge_list:
        edges = edges.filter("id_a IS NOT NULL")
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges, nodes, node_col="id", **kw).collect()
    }


def _union_find(edge_list, node_ids):
    parent = {i: i for i in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in node_ids}


def test_long_chain_converges_via_pointer_jumping(spark):
    """A 300-node chain (diameter 299) converges well inside max_iter=25:
    ~2 hook rounds + O(log 300) jump rounds — impossible for pure
    min-label propagation under the same budget."""
    n = 300
    out = _cc(spark, [(i, i + 1) for i in range(1, n)], range(1, n + 1))
    assert out == {i: 1 for i in range(1, n + 1)}


def test_unconverged_raises_not_mislabels(spark):
    """Exhausting max_iter raises: wrong cluster assignments must never be
    returned silently."""
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(
            spark, [(i, i + 1) for i in range(1, 40)], range(1, 41),
            max_iter=2,
        )


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(1, 61))
        edge_list = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(10, 70))
            }
        )
        got = _cc(spark, edge_list, nodes)
        assert got == _union_find(edge_list, nodes), f"trial {trial}"
