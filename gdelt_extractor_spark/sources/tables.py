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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        # integer div: double division would lose precision at ~1e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
