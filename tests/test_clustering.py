"""Deterministic k-means + SemDeDup semantic dedup (operators/clustering.py).

The fit has no SQL oracle (iterative), so the tests pin the properties the
rows-only driver check depends on: bit-identical refits, blob recovery on
separable data, degenerate-cluster survival, and pair-semantics agreement
with the oracle-green label-blocked operator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ambient_sound_analysis_api_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    kmeans_predict,
    semantic_dedup_pairs,
)


def _blobs(spark):
    """Three well-separated 2-D blobs, 4 deterministic points each; ids are
    interleaved across blobs so lowest-id seeding starts with one centroid
    in each blob."""
    pts = []
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]
    offsets = [(0.1, 0.0), (-0.1, 0.1), (0.0, -0.1), (0.1, 0.1)]
    for j, (dx, dy) in enumerate(offsets):
        for b, (cx, cy) in enumerate(centers):
            pts.append((j * 3 + b, [cx + dx, cy + dy]))
    return spark.createDataFrame(pts, "vec_id long, embedding array<double>")


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    centroids = kmeans_fit(df, k=3, n_iter=3)
    pred = {r["vec_id"]: r["cluster"] for r in kmeans_predict(df, centroids).collect()}
    # every point lands with its blob-mates (vec_id % 3 encodes the blob)
    for blob in range(3):
        members = {pred[i] for i in pred if i % 3 == blob}
        assert len(members) == 1, f"blob {blob} split across clusters"
    assert len({pred[i] for i in pred}) == 3
    # centroids converge to the exact blob means (decimal means are exact)
    for b, (cx, cy) in enumerate([(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)]):
        c = centroids[pred[b]]  # vec_id=b is in blob b
        assert c[0] == pytest.approx(cx + 0.025, abs=1e-9)
        assert c[1] == pytest.approx(cy + 0.025, abs=1e-9)


def test_kmeans_fit_is_bit_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = kmeans_fit(emb, k=8, n_iter=2)
    b = kmeans_fit(emb.repartition(7), k=8, n_iter=2)
    assert a == b  # exact float equality, across different partitionings


def test_empty_cluster_keeps_previous_centroid(spark):
    # two identical far points seed clusters 1 and 2; cluster 2 receives no
    # members (ties go to the lowest index) and must keep its seed centroid
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    centroids = kmeans_fit(df, k=3, n_iter=2)
    assert centroids[2] == [5.0, 5.0]
    pred = {r["vec_id"]: r["cluster"] for r in kmeans_predict(df, centroids).collect()}
    assert pred[1] == pred[2] == 1 and pred[0] == 0


def test_assign_ties_break_to_lowest_index(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    out = assign_clusters(df, [[0.0], [2.0]]).collect()[0]
    assert out["cluster"] == 0  # equidistant → first centroid


def test_semantic_dedup_matches_label_blocked_pairs(spark, sf_dir):
    """With k-means recovering the generator's label structure, the
    SemDeDup pairs must agree with the oracle-green label-blocked operator
    on blocks both derive; at minimum every k-means pair is a genuine
    >=threshold pair (cosine values, not block luck)."""
    from ambient_sound_analysis_api_spark.operators.dedup import (
        embedding_near_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    km = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in semantic_dedup_pairs(emb, k=8, n_iter=2, threshold=0.3).collect()
    }
    assert len(km) > 0
    label = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in embedding_near_pairs(emb, threshold=0.3).collect()
    }
    shared = set(km) & set(label)
    assert shared, "no overlap between kmeans blocks and label blocks"
    for pair in shared:
        assert km[pair] == label[pair]  # identical cosine, identical rounding


def test_registry_kmeans_queries_stable_across_runs(spark, sf_dir):
    from ambient_sound_analysis_api_spark.registry import (
        q_dedup_semantic_kmeans,
        q_emb_kmeans_profile,
    )

    p1 = [tuple(r) for r in q_emb_kmeans_profile(spark, sf_dir).collect()]
    p2 = [tuple(r) for r in q_emb_kmeans_profile(spark, sf_dir).collect()]
    assert p1 == p2 and sum(r[1] for r in p1) == 500
    d1 = [tuple(r) for r in q_dedup_semantic_kmeans(spark, sf_dir).collect()]
    d2 = [tuple(r) for r in q_dedup_semantic_kmeans(spark, sf_dir).collect()]
    assert d1 == d2 and len(d1) > 0


# ------------------------------------------------------ k-center greedy


def test_kcenter_greedy_picks_far_points(spark):
    """On a line with one far outlier and a tight cluster, the first pick
    after the seed must be the outlier; subsequent picks spread across
    the remaining extremes. Ties and distances are exact-decimal."""
    from ambient_sound_analysis_api_spark.operators.clustering import (
        kcenter_greedy,
    )

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [0.2, 0.0]),
        (3, [100.0, 0.0]),   # far outlier
        (4, [0.0, 50.0]),    # second extreme
        (5, [0.15, 0.05]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["pick"]: r for r in kcenter_greedy(emb, k=3).collect()}
    assert out[1]["vec_id"] == 0 and out[1]["min_dist"] is None
    assert out[2]["vec_id"] == 3
    assert out[2]["min_dist"] == 10000.0  # 100^2 exactly
    assert out[3]["vec_id"] == 4
    assert out[3]["min_dist"] == 2500.0   # min(50^2 to seed, ...) = 2500


def test_kcenter_greedy_tie_breaks_to_lowest_id(spark):
    from ambient_sound_analysis_api_spark.operators.clustering import (
        kcenter_greedy,
    )

    rows = [
        (0, [0.0]),
        (7, [1.0]),
        (9, [1.0]),  # same distance as 7 — id 7 must win
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["pick"]: r["vec_id"] for r in kcenter_greedy(emb, k=2).collect()}
    assert out[2] == 7
