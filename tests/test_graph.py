"""PageRank property tests: mass conservation, hub dominance,
uniformity on symmetric cycles, dangling redistribution, weights."""

from __future__ import annotations

import pytest

from gdelt_extractor_spark.operators.graph import pagerank


def _edges(spark, rows, schema="src string, dst string"):
    return spark.createDataFrame(rows, schema)


def test_ranks_sum_to_one_and_hub_dominates(spark):
    # star: everyone points at h
    e = _edges(spark, [(x, "h") for x in ["a", "b", "c", "d"]])
    out = {r.node: r.rank for r in pagerank(e).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert out["h"] == max(out.values())
    assert out["h"] > 0.5
    # leaves are symmetric
    leaves = [out[x] for x in "abcd"]
    assert max(leaves) - min(leaves) < 1e-9


def test_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    out = {r.node: r.rank for r in pagerank(e).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert max(out.values()) - min(out.values()) < 1e-6


def test_dangling_mass_redistributed(spark):
    # b has no out-edges; total mass must still be 1
    e = _edges(spark, [("a", "b")])
    out = {r.node: r.rank for r in pagerank(e).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert out["b"] > out["a"]


def test_weighted_edges_shift_rank(spark):
    e = _edges(
        spark,
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    out = {r.node: r.rank for r in pagerank(e, weight="w").collect()}
    assert out["b"] > out["c"], "the heavier edge must attract more rank"
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_empty_graph(spark):
    e = _edges(spark, [], "src string, dst string")
    assert pagerank(e).count() == 0
