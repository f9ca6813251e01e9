"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets full
pushdown/pruning; callers select/filter immediately after load.
"""

from __future__ import annotations

import os
import re

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

    ``events.parquet`` stores its ``ts`` with parquet
    ``isAdjustedToUTC=0``, which different Spark versions surface
    differently; normalize to a plain TIMESTAMP (LTZ) here so every
    query downstream sees one type:

    * TIMESTAMP(NANOS): rejected by default — read nanos as long
      (spark.sql.legacy.parquet.nanosAsLong) and convert to a
      microsecond timestamp column-side, truncating sub-microseconds —
      the same truncation DuckDB applies reading the file.
    * TIMESTAMP(MICROS, isAdjustedToUTC=0): Spark ≥4.1 infers
      TIMESTAMP_NTZ, which rejects ``cast(.. as double)`` /
      ``unix_micros`` — disable spark.sql.parquet.inferTimestampNTZ
      around the read so the stored micros surface as TIMESTAMP
      (no value shift; the reader labels the same int64 micros).
      DuckDB reads the file naively, so values stay comparable under
      the UTC session timezone.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    # These confs are session-wide; save/restore around the read so
    # later parquet reads elsewhere in the session are unaffected.
    # The analyzed plan captures conf values at read time (schema
    # inference is eager in spark.read.parquet), so restoring
    # immediately is safe.
    confs = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div: double division would lose precision at ~1e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # belt-and-braces: never leak NTZ to query code
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


_SPLIT_MEMO: dict[str, int] = {}

# Spark's JavaUtils.byteStringAs suffixes (case-insensitive); a bare
# number in spark.sql.files.maxPartitionBytes means bytes.
_BYTE_SUFFIX = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def _parse_byte_string(value: str) -> int:
    """Parse a Spark byte-string conf value ("134217728b", "128m",
    "1g", "64") into bytes — every form Spark's own
    ``JavaUtils.byteStringAs`` accepts for size confs."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", value)
    if m is None or m.group(2).lower() not in _BYTE_SUFFIX:
        raise ValueError(f"not a Spark byte-string: {value!r}")
    return int(m.group(1)) * _BYTE_SUFFIX[m.group(2).lower()]


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
        max_pb = _parse_byte_string(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
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
