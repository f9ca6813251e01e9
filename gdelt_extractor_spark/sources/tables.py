"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets full
pushdown/pruning; callers select/filter immediately after load.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default; read nanos as long
    (spark.sql.legacy.parquet.nanosAsLong) and convert to a
    microsecond timestamp column-side, truncating sub-microseconds —
    the same truncation DuckDB applies reading the file, keeping the
    two engines comparable.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    # nanosAsLong is session-wide; save/restore around the read so a
    # later TIMESTAMP(NANOS) read elsewhere in the session still gets
    # a timestamp, not a silent bigint.  The analyzed plan captures
    # the conf value at read time, so restoring immediately is safe.
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div: double division would lose precision at ~1e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


_SPLIT_MEMO: dict[str, int] = {}


def _estimated_splits(spark: SparkSession, path: str) -> int:
    """Scan-split estimate for ``path``, memoized per process.

    Spark carves files into splits of ``spark.sql.files.
    maxPartitionBytes``; reproducing that arithmetic driver-side from
    file sizes costs microseconds, versus triggering physical
    planning (``df.rdd``) which costs 100s of ms per query.  Paths we
    cannot stat locally (object stores) estimate conservatively high
    (treat as already-parallel) — at that scale splits exceed cores
    anyway.
    """
    if path not in _SPLIT_MEMO:
        max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b").rstrip("b"))
        total = 0
        if os.path.isfile(path):
            total = os.path.getsize(path)
        elif os.path.isdir(path):
            total = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
                if not f.startswith(("_", "."))
            )
        else:  # non-local path: assume wide enough
            _SPLIT_MEMO[path] = 1 << 30
            return _SPLIT_MEMO[path]
        _SPLIT_MEMO[path] = max(1, -(-total // max_pb))
    return _SPLIT_MEMO[path]


def parallelized(df: DataFrame, path: str, min_partitions: int | None = None) -> DataFrame:
    """Guarantee at least ``min_partitions`` (default: the session's
    defaultParallelism) partitions under CPU-heavy per-row operators.

    A freshly-landed extract is often one small single-row-group
    parquet file; parquet row groups are the unit of split, so such a
    scan is ONE task and per-row-expensive work (tokenize / shingle /
    hash / dot-product) runs on one core no matter the cluster size.
    Round-robin repartitioning the raw rows costs one cheap shuffle of
    the input bytes and buys full-width execution of everything above.

    Adaptive: a no-op when the scan already has enough splits — at
    100 TB input splits vastly exceed cores and this never fires; it
    only triggers on the pathological small-file case it exists for.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if _estimated_splits(spark, path) >= target:
        return df
    return df.repartition(target)
