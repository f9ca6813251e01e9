"""Full-corpus distributed k-means (operators/clustering.py).

No SQL oracle exists for an iterative fixed-point algorithm, so the
gate is property tests: partition-INDEPENDENT determinism (the
integer micro-unit partial sums), recovery of well-separated
clusters, monotone inertia, and empty-cluster robustness.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdelt_extractor_spark.operators.clustering import kmeans_cluster, kmeans_fit
from gdelt_extractor_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_kmeans_partition_independence(spark, sf_dir):
    """Bit-identical centroids AND assignments across different
    partitionings — the float-accumulation-order hazard the integer
    partial sums exist to kill."""
    emb = _emb(spark, sf_dir)
    a = kmeans_fit(emb.repartition(3), k=4, n_iter=3)
    b = kmeans_fit(emb.repartition(11), k=4, n_iter=3)
    assert np.array_equal(a, b), "centroids must not depend on partitioning"

    ca = sorted(
        kmeans_cluster(emb.repartition(3), k=4, n_iter=3).collect(),
        key=lambda r: r.vec_id,
    )
    cb = sorted(
        kmeans_cluster(emb.repartition(11), k=4, n_iter=3).collect(),
        key=lambda r: r.vec_id,
    )
    assert [(r.vec_id, r.cluster) for r in ca] == [(r.vec_id, r.cluster) for r in cb]


def test_kmeans_recovers_separated_clusters(spark):
    rng = np.random.RandomState(7)
    centers = np.zeros((3, 8))
    centers[0, 0] = 50.0
    centers[1, 1] = 50.0
    centers[2, 2] = -50.0
    rows = []
    for g in range(3):
        for i in range(30):
            v = centers[g] + rng.standard_normal(8) * 0.1
            rows.append((g * 30 + i, [float(x) for x in v], g))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, truth int")
    got = kmeans_cluster(df, k=3, n_iter=5).collect()
    truth = {r.vec_id: r.vec_id // 30 for r in got}
    # every ground-truth group must land wholly in one cluster, and
    # distinct groups in distinct clusters (purity 1.0)
    by_group: dict[int, set] = {}
    for r in got:
        by_group.setdefault(truth[r.vec_id], set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_group.values()), by_group
    assert len({next(iter(s)) for s in by_group.values()}) == 3


def test_kmeans_inertia_nonincreasing(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    X = np.vstack(
        [np.array(r.embedding, dtype=np.float64) for r in emb.collect()]
    )

    def inertia(cents):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return float(d.min(axis=1).sum())

    i1 = inertia(kmeans_fit(emb, k=4, n_iter=1))
    i4 = inertia(kmeans_fit(emb, k=4, n_iter=4))
    # micro-unit quantization bounds the per-round regression at ~1e-6
    assert i4 <= i1 + 1e-3, (i1, i4)


def test_kmeans_empty_clusters_survive(spark):
    # 4 distinct points, k=8: at least 4 cells stay empty every round
    rows = [(i, [float(i % 4), 0.0, 0.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kmeans_cluster(df, k=8, n_iter=3).collect()
    assert len(got) == 12
    assert all(0 <= r.cluster < 8 for r in got)
    # identical points land in identical clusters
    by_val = {}
    for r in got:
        by_val.setdefault(r.vec_id % 4, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_val.values())


def test_cluster_prune_counts_and_order(spark, sf_dir):
    """Per-cluster survivor count is exactly n - floor((1-f)·n), and
    every dropped row is at least as prototypical (close) as every
    kept row in its cluster."""
    from gdelt_extractor_spark.operators.clustering import cluster_prune, kmeans_cluster

    emb = _emb(spark, sf_dir)
    full = {
        r.vec_id: r.cluster
        for r in kmeans_cluster(emb, k=4, n_iter=3).collect()
    }
    kept = cluster_prune(emb, k=4, keep_fraction=0.6, n_iter=3).collect()
    import collections

    n_by_cluster = collections.Counter(full.values())
    kept_by_cluster = collections.Counter(r.cluster for r in kept)
    for c, n in n_by_cluster.items():
        import math

        expect = n - math.floor(0.4 * n)
        assert kept_by_cluster[c] == expect, (c, n, kept_by_cluster[c], expect)
    # prune must keep the same cluster assignment as the plain fit
    for r in kept:
        assert full[r.vec_id] == r.cluster


def test_cluster_prune_drops_prototypes_keeps_tail(spark):
    """In a cluster with one clear prototype pile and a diverse
    tail, prototypes mode drops from the pile."""
    from gdelt_extractor_spark.operators.clustering import cluster_prune

    rows = []
    # 8 copies sitting on the centroid, 4 outliers around it
    for i in range(8):
        rows.append((i, [10.0, 0.0]))
    for i, off in enumerate([3.0, -3.0, 4.0, -4.0]):
        rows.append((8 + i, [10.0, off]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = cluster_prune(df, k=1, keep_fraction=0.5, n_iter=4).collect()
    kept_ids = {r.vec_id for r in kept}
    assert len(kept) == 6
    # all 4 outliers survive; dropped rows all come from the pile
    assert {8, 9, 10, 11} <= kept_ids


def test_cluster_prune_partition_independence(spark, sf_dir):
    from gdelt_extractor_spark.operators.clustering import cluster_prune

    emb = _emb(spark, sf_dir)
    a = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in cluster_prune(emb.repartition(3), k=4, keep_fraction=0.5, n_iter=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in cluster_prune(emb.repartition(13), k=4, keep_fraction=0.5, n_iter=2).collect()
    )
    assert a == b


def test_contrastive_triplets_semantics(spark, sf_dir):
    """Positives share the anchor's cluster, negatives never do,
    every non-singleton member anchors exactly one triplet, and the
    result is partition-independent."""
    from gdelt_extractor_spark.operators.clustering import (
        contrastive_triplets,
        kmeans_cluster,
    )

    emb = _emb(spark, sf_dir)
    clusters = {r.vec_id: r.cluster
                for r in kmeans_cluster(emb, k=4, n_iter=2).collect()}
    trip = contrastive_triplets(emb, k=4, n_iter=2).collect()
    import collections

    sizes = collections.Counter(clusters.values())
    expect_anchors = sum(n for n in sizes.values() if n > 1)
    assert len(trip) == expect_anchors
    for r in trip:
        assert clusters[r.anchor_id] == clusters[r.positive_id]
        assert r.anchor_id != r.positive_id
        assert clusters[r.negative_id] != clusters[r.anchor_id]

    a = sorted((r.anchor_id, r.positive_id, r.negative_id) for r in trip)
    b = sorted(
        (r.anchor_id, r.positive_id, r.negative_id)
        for r in contrastive_triplets(
            emb.repartition(9), k=4, n_iter=2
        ).collect()
    )
    assert a == b


class TestClusterProfile:
    def test_tight_vs_loose_and_invariants(self, spark):
        import numpy as np

        from gdelt_extractor_spark.operators.clustering import cluster_profile

        rng = np.random.RandomState(3)
        tight = rng.randn(40, 8) * 0.05 + np.array([5.0] * 8)
        loose = rng.randn(40, 8) * 2.0 + np.array([-5.0] * 8)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(list(tight) + list(loose))]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = cluster_profile(emb, k=2, n_iter=6).collect()
        assert len(out) == 2
        assert abs(sum(r.frac for r in out) - 1.0) < 1e-6
        assert all(r.inertia >= 0 and r.max_dist >= r.mean_dist for r in out)
        by_n = sorted(out, key=lambda r: r.mean_dist)
        assert by_n[0].mean_dist * 5 < by_n[1].mean_dist  # tight ≪ loose

    def test_partition_invariant(self, spark):
        from gdelt_extractor_spark.operators.clustering import cluster_profile

        rows = [(i, [float((i * 7 + j) % 13) for j in range(6)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = {tuple(r) for r in cluster_profile(emb, k=4).collect()}
        b = {tuple(r) for r in cluster_profile(emb.repartition(9), k=4).collect()}
        assert a == b
