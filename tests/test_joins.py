"""Bloom-prefiltered semi join: exactness vs the plain semi join,
superset soundness without verify, bounded bitmap, and the
codegen-only probe (no Python eval in the plan)."""

import random

from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.joins import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
)


def _tables(spark, seed=0, n_fact=2000, n_dim=60):
    rng = random.Random(seed)
    fact = spark.createDataFrame(
        [(i, rng.randint(0, 500)) for i in range(n_fact)], "id long, k long"
    ).repartition(5)
    dim = spark.createDataFrame(
        [(rng.randint(0, 500),) for _ in range(n_dim)], "k long"
    ).repartition(3)
    return fact, dim


def test_exact_matches_semi_join(spark):
    fact, dim = _tables(spark)
    got = sorted(r["id"] for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(
        r["id"] for r in fact.join(dim, "k", "left_semi").collect()
    )
    assert got == want and len(want) > 0


def test_noverify_is_superset(spark):
    fact, dim = _tables(spark, seed=1)
    # tiny bitmap → false positives likely, but never false negatives
    loose = set(
        r["id"]
        for r in bloom_semi_join(
            fact, dim, "k", n_bits=256, n_hashes=2, verify=False
        ).collect()
    )
    exact = set(r["id"] for r in fact.join(dim, "k", "left_semi").collect())
    assert exact <= loose


def test_bitmap_bounded_and_odd_bits(spark):
    _, dim = _tables(spark, seed=2)
    words = bloom_build(dim, "k", n_bits=100, n_hashes=3)
    assert len(words) == 2  # ceil(100/64)
    assert any(w != 0 for w in words)


def test_empty_dim(spark):
    fact, dim = _tables(spark, seed=3)
    empty = dim.filter(F.lit(False))
    assert bloom_semi_join(fact, empty, "k").count() == 0


def test_probe_roundtrip(spark):
    # every inserted key must probe true (no false negatives)
    _, dim = _tables(spark, seed=4)
    words = bloom_build(dim, "k", n_bits=1 << 12, n_hashes=4)
    probe_df = dim.join(
        F.broadcast(
            dim.sparkSession.createDataFrame([(words,)], "w array<long>")
        )
    )
    n_bad = probe_df.filter(
        ~bloom_probe(F.col("k"), F.col("w"), 4, 1 << 12)
    ).count()
    assert n_bad == 0


def test_no_python_eval_in_plan(spark):
    fact, dim = _tables(spark, seed=5)
    plan = (
        bloom_semi_join(fact, dim, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan  # probe is pure JVM arithmetic
