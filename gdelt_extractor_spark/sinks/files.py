"""File sinks: partitioned parquet (the 100 TB default) and csv.

At scale the load target is partitioned columnar storage, not a
row-store — the JDBC sink exists for reference parity, these are
what a Spark pipeline actually writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 256,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` based on its current on-disk size.

    Streaming sinks and 15-minute ticks accrete thousands of small
    files; at 100 TB unmanaged small files dominate scan cost
    (driver-side file listing + per-file open overhead).  This is the
    maintenance pass: size-based repartition, then a crash-safe swap
    — write to a temp dir, rename the live dir aside as a backup,
    rename the temp dir in, delete the backup.  A crash at any point
    leaves the full dataset in either ``path`` or the backup (never
    only in a temp dir), and a prior interrupted swap is recovered on
    the next call.  Pass ``partition_by`` for a hive-partitioned
    dataset — the rewrite keeps the layout (and the repartition keys
    on the partition columns, so each output partition dir gets
    coalesced files, not a shard of every task).  Returns the new
    file count.

    LOCAL-FILESYSTEM ONLY (guarded): the size scan and the rename
    swap use POSIX APIs.  On an object store, compaction belongs to a
    table format (Iceberg/Delta rewrite-data-files) whose metadata
    commit IS the atomic swap; a bare-parquet rename "swap" on S3 is
    a copy and is not atomic.
    """
    import math
    import shutil
    import os

    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            "compact_parquet is local-filesystem-only; use a table format's "
            "compaction (e.g. Iceberg rewrite_data_files) on object stores"
        )
    path = path.rstrip("/")
    tmp = path + "__compacting"
    backup = path + "__precompact"
    recover_interrupted_compaction(path)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale partial write from a crashed run

    df = spark.read.parquet(path)
    size_b = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size_b / (target_file_mb * 1024 * 1024)))
    if partition_by:
        out = df.repartition(n_files, *[F.col(c) for c in partition_by])
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return n_files


def recover_interrupted_compaction(path: str) -> None:
    """Recover a ``compact_parquet`` swap that crashed between its two
    renames: the ``__precompact`` backup is authoritative when the
    live dir vanished mid-swap, stale otherwise.

    Callers that read ``path`` and treat absence as "first write"
    MUST call this first — otherwise a crashed compaction reads as an
    empty dataset and the backup holding the real data gets deleted
    as "stale" on the next compaction (ADVICE r3).
    """
    import os
    import shutil

    backup = path.rstrip("/") + "__precompact"
    if os.path.exists(backup):
        if not os.path.exists(path.rstrip("/")):
            os.rename(backup, path.rstrip("/"))
        else:
            shutil.rmtree(backup)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet write: ``repartitionByRange`` +
    ``sortWithinPartitions`` on ``cluster_col`` so each output file
    covers a disjoint key range.

    Point/range predicates on the cluster key then prune to O(1)
    files via parquet column min/max statistics instead of scanning
    the dataset — the single highest-leverage layout choice for a
    100 TB table queried by key (the poor man's Z-order; for one key
    column it is exactly optimal).  Range boundaries come from
    Spark's reservoir sampling of the key distribution, so files are
    balanced even when the key is skewed.
    """
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def upsert_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Incremental partition upsert: overwrite ONLY the partitions
    present in ``df``, leaving the rest of the dataset untouched
    (dynamic partition overwrite).

    This is the scale-correct version of the reference's
    replace-mode ``to_sql`` (reference/extractor/extractor.py:
    408-457): a 15-minute GDELT tick rewrites its own date
    partition(s) idempotently instead of truncating the table —
    re-running a tick converges, and readers never see a dropped
    dataset.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket)
    table.

    Bucketing is THE shuffle-elimination lever for repeated big-big
    joins: two tables bucketed on the join key with the same bucket
    count join with NO Exchange on either side (asserted in
    tests/test_bucketed.py), and sorted buckets skip the sort of a
    sort-merge join.  At 100 TB, bucketing lineitem+orders on the
    order key turns every subsequent join into a zip of co-located
    files.
    """
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)
