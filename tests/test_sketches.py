"""Misra-Gries heavy-hitter sketch: exact-regime equality, forced-
decrement bounds, and the surface-above-N/(m+1) guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.sketches import approx_topk


def _freq_df(spark, counts: dict[str, int], n_parts: int = 1):
    rows = [(key,) for key, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "key string").repartition(n_parts)


def test_exact_regime_matches_true_counts(spark):
    counts = {"a": 50, "b": 30, "c": 20, "d": 10, "e": 5}
    df = _freq_df(spark, counts, n_parts=4)
    out = {r.key: r.est_count for r in approx_topk(df, "key", k=3, m=64).collect()}
    # m >> distinct: no decrement ever fires, counts are exact
    assert out == {"a": 50, "b": 30, "c": 20}


def test_forced_decrements_keep_bounds_and_heavy_hitter(spark):
    # 1 heavy key among many light ones, single partition, tiny m:
    # decrements MUST fire (26 distinct > m=4)
    counts = {"heavy": 200} | {chr(ord("a") + i): 4 for i in range(25)}
    n = sum(counts.values())
    df = _freq_df(spark, counts, n_parts=1)
    out = {r.key: r.est_count for r in approx_topk(df, "key", k=4, m=4).collect()}
    # guarantee: any key with true > N/(m+1) surfaces
    assert "heavy" in out
    # estimates are one-sided: never above the true count, and within
    # N/(m+1) below it
    for key, est in out.items():
        assert est <= counts[key]
        assert counts[key] - est <= n / (4 + 1)


def test_deterministic_under_fixed_partitioning(spark):
    counts = {f"k{i}": (i * 7) % 23 + 1 for i in range(40)}
    df = _freq_df(spark, counts, n_parts=1)
    a = approx_topk(df, "key", k=5, m=8).collect()
    b = approx_topk(df, "key", k=5, m=8).collect()
    assert a == b


def test_null_keys_ignored_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("y",), (None,), ("z",)], "key string"
    )
    rows = approx_topk(df, "key", k=3, m=16).collect()
    assert [(r.key, r.est_count) for r in rows] == [("x", 2), ("y", 2), ("z", 1)]


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError):
        approx_topk(df, "key", k=0)
    with pytest.raises(ValueError):
        approx_topk(df, "key", m=0)
