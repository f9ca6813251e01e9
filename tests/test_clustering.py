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
