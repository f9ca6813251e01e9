"""Sinks: partitioned/bucketed/upserted files (the scale targets)
and the reference-parity JDBC writer."""

from .files import upsert_partitions, write_bucketed, write_csv, write_parquet
from .jdbc import jdbc_options, lastrun_df, write_jdbc
from .webdataset import write_webdataset

__all__ = [
    "jdbc_options", "lastrun_df", "upsert_partitions",
    "write_bucketed", "write_csv", "write_parquet", "write_jdbc",
    "write_webdataset",
]
