"""File sinks: partitioned parquet (the 100 TB default) and csv.

At scale the load target is partitioned columnar storage, not a
row-store — the JDBC sink exists for reference parity, these are
what a Spark pipeline actually writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", sep: str = "\t") -> None:
    df.write.mode(mode).option("sep", sep).option("header", "true").csv(path)
