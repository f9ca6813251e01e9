"""Scalable global rank/ntile: value parity with the single-partition
window builtin, plus the plan guarantee that makes it worth having —
no SinglePartition exchange anywhere in the physical plan."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.ranking import (
    global_ntile,
    global_row_number,
    ntile_from_rank,
)


def _rand_df(spark, n, seed, dupes=True):
    rng = random.Random(seed)
    vals = [rng.randint(0, 20 if dupes else 10**9) for _ in range(n)]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(7)


@pytest.mark.parametrize("n,seed", [(1, 0), (97, 1), (400, 2)])
def test_global_row_number_matches_window(spark, n, seed):
    df = _rand_df(spark, n, seed)
    got = global_row_number(df, [F.col("v").asc(), F.col("id").asc()])
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("rank", F.row_number().over(w))
    assert sorted(map(tuple, got.select("id", "v", "rank").collect())) == \
        sorted(map(tuple, want.select("id", "v", "rank").collect()))


@pytest.mark.parametrize(
    "n,buckets", [(1, 4), (3, 4), (8, 4), (97, 4), (100, 7), (400, 10)]
)
def test_global_ntile_matches_builtin(spark, n, buckets):
    df = _rand_df(spark, n, seed=n + buckets)
    got = global_ntile(
        df, buckets, [F.col("v").asc(), F.col("id").asc()]
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("bucket", F.ntile(buckets).over(w))
    assert sorted(map(tuple, got.select("id", "bucket").collect())) == \
        sorted(map(tuple, want.select("id", "bucket").collect()))


def test_ntile_from_rank_formula_exhaustive(spark):
    # Pure arithmetic check across every (N, n) small case, driven
    # through one DataFrame evaluation per (N, n).
    for n_rows in range(1, 26):
        for n_buckets in (1, 2, 3, 4, 5, 7, 25, 26):
            q, r = divmod(n_rows, n_buckets)
            # reference: standard ntile — first r buckets get q+1
            want = []
            b, left = 1, (q + 1) if r >= 1 else q
            for rank in range(1, n_rows + 1):
                want.append(b)
                left -= 1
                if left == 0 and rank < n_rows:
                    b += 1
                    left = (q + 1) if b <= r else q
            df = spark.range(1, n_rows + 1).withColumn(
                "b", ntile_from_rank(F.col("id"), n_rows, n_buckets)
            )
            got = [row["b"] for row in df.orderBy("id").collect()]
            assert got == want, (n_rows, n_buckets)


def test_no_single_partition_exchange(spark):
    df = _rand_df(spark, 200, seed=9)
    plan = global_row_number(
        df, [F.col("v").asc(), F.col("id").asc()]
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the builtin global window DOES have one — the thing we avoid
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    bad = (
        df.withColumn("r", F.row_number().over(w))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in bad


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert global_row_number(df, ["v", "id"]).count() == 0
    assert global_ntile(df, 4, ["v", "id"]).count() == 0


class TestGlobalRunningSum:
    def _df(self, spark, weights):
        rows = [(i, int(w)) for i, w in enumerate(weights)]
        return spark.createDataFrame(rows, "k long, w long")

    def test_inclusive_and_exclusive(self, spark):
        from gdelt_extractor_spark.operators.ranking import global_running_sum

        ws = [3, 1, 4, 1, 5, 9, 2, 6]
        df = self._df(spark, ws).repartition(5)
        inc = {
            r.k: r.running_sum
            for r in global_running_sum(df, ["k"], "w").collect()
        }
        exc = {
            r.k: r.running_sum
            for r in global_running_sum(df, ["k"], "w", exclusive=True).collect()
        }
        run = 0
        for i, w in enumerate(ws):
            assert exc[i] == run
            run += w
            assert inc[i] == run

    def test_partitioning_invariance(self, spark):
        from gdelt_extractor_spark.operators.ranking import global_running_sum

        df = self._df(spark, range(100))
        a = sorted(
            map(tuple, global_running_sum(df.repartition(1), ["k"], "w").collect())
        )
        b = sorted(
            map(tuple, global_running_sum(df.repartition(16), ["k"], "w").collect())
        )
        assert a == b
