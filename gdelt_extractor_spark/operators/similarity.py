"""Similarity search over embedding columns (SURVEY.md §2c 29-30).

- ``ann_bruteforce``: exact top-k cosine for a (small) query set.
  The query side is broadcast, so the plan is one scan of the vector
  table with per-row expression work — no shuffle except the final
  per-query top-k, which is a window over k·|Q| rows.  This is the
  correctness baseline and is also the right physical plan at scale
  when |Q| is small.
- ``ann_lsh``: random-hyperplane LSH. Vectors get a sign-bit bucket
  from seeded pseudo-random hyperplanes (deterministic: numpy
  RandomState(seed), Arrow-batched pandas UDF); queries probe their
  bucket only, turning the scan into an equi-join on bucket id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str | Column) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    )


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    return dot / (_norm(a) * _norm(b))


def ann_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Ties broken by neighbor id for determinism.  ``queries`` must be
    small (it is broadcast).
    """
    v = vectors.select(
        F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """Pandas UDF: array<double|float> vector → int bucket (sign bits
    of projections onto seeded random hyperplanes).

    RandomState(seed) is bit-reproducible across machines, so bucket
    assignment is deterministic cluster-wide; the planes matrix is
    captured in the closure and shipped once per executor.
    """
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        return pd.Series(bits @ weights)

    return bucket


def ann_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: exact rerank restricted to the query's LSH
    bucket.  The bucket equality join replaces the full scan; recall
    is tested against ann_bruteforce in tests/test_similarity.py."""
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    v = vectors.select(
        F.col(id_col).alias("nbr_id"), _as_double(vec_col).alias("v")
    ).withColumn("vb", bucket("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qb", bucket("qv"))
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("vb") == F.col("qb")) & (F.col("nbr_id") != F.col("query_id")),
        )
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", F.round("cos", 6).alias("cosine"))
    )
