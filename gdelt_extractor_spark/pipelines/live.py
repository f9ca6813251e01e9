"""Live rollup pipeline: the streaming composition of the engine's
primitives into the table the reference rebuilds from scratch every
15 minutes (reference/v2.py + cron).

Shape: file-source stream of GDELT TSV drops → event-time +
watermarked keep-first dedup (bounded state) → per-day/root-code
rollup → ``foreachBatch`` MERGE into the serving table (union the
batch rollup with the existing rows of the day partitions it
touches, re-aggregate, dynamic-partition-overwrite those days) →
optional small-file compaction.

Why this is the 100 TB architecture:
- the stream processes each drop once (checkpointed; a replayed
  epoch is skipped via the per-checkpoint epoch ledger, so the
  additive merge stays exactly-once across restarts),
- a day whose drops span many micro-batches (guaranteed at 15-min
  cadence: ~96 drops/day) accumulates correctly — the merge reads
  ONLY the touched day partitions (partition-pruned scan), unions
  the batch rollup, and re-aggregates, so each overwrite holds the
  complete running total, not just the last batch's counts,
- the serving table is partitioned parquet updated in place by
  partition, so readers never see a truncate (vs the reference's
  replace-mode ``to_sql``),
- compaction bounds file counts as ticks accrete.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..sinks.files import compact_parquet, recover_interrupted_compaction
from ..streaming.updates import (
    dedup_stream,
    run_foreach_batch,
    stream_gdelt_dir,
    with_event_time,
)


def rollup_batch(batch: DataFrame) -> DataFrame:
    """Per-batch rollup: day × root code → counts/articles.

    Runs inside foreachBatch on a (deduped) micro-batch, so this is
    a plain batch aggregation — one partial-aggregated shuffle over
    the batch only, never over history.
    """
    return (
        batch.groupBy(
            F.date_trunc("day", F.col("event_time")).alias("day"),
            F.col("EventRootCode").alias("root_code"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("NumArticles").cast("long")).alias("n_articles"),
        )
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    )


def merge_rollup(spark: SparkSession, rolled: DataFrame, out_dir: str) -> DataFrame:
    """Union the batch rollup with the existing rows of the day
    partitions it touches and re-aggregate, so the subsequent
    partition overwrite writes the complete running total for each
    touched day.

    Scale shape: the touched-days set is a handful of values
    (broadcast semi join → partition pruning on the read side), the
    union is batch-rollup-sized + touched-partition-sized, and the
    re-aggregation shuffles only those rows.  The merged frame is
    eagerly ``localCheckpoint``ed because its lineage reads the very
    files the overwrite is about to replace.
    """
    # a compaction that crashed mid-swap leaves the dataset only in
    # its __precompact backup; restore it rather than misreading the
    # situation as "first epoch" (which would drop all history AND
    # doom the backup to stale-cleanup later)
    recover_interrupted_compaction(out_dir)
    try:
        existing = spark.read.parquet(out_dir)
    except AnalysisException:  # first epoch: nothing to merge
        return rolled
    touched = rolled.select("day").distinct()
    prior = (
        existing.withColumn("day", F.col("day").cast("string"))
        .join(F.broadcast(touched), "day", "left_semi")
        .select("day", "root_code", "n_events", "n_articles")
    )
    return (
        prior.unionByName(rolled.select("day", "root_code", "n_events", "n_articles"))
        .groupBy("day", "root_code")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("n_articles").alias("n_articles"),
        )
    )


def _complete_epoch_swap(staging: str, out_dir: str) -> None:
    """Finish (or re-finish) the idempotent partition swap of a staged
    epoch into the live dataset.

    Each staged ``day=...`` dir replaces its live counterpart via two
    POSIX renames; displaced dirs get a ``_stale__`` prefix, which
    Spark's file index ignores, so a concurrent reader never sees an
    old partition surface as a bogus extra partition value mid-swap.
    Safe to re-run from any crash point: a staged partition dir is
    authoritative until the moment it is renamed in, after which it
    disappears from ``staging`` and the loop skips it.
    """
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(staging)):
        src = os.path.join(staging, name)
        if not (os.path.isdir(src) and "=" in name):
            continue  # _SUCCESS and friends
        live = os.path.join(out_dir, name)
        stale = os.path.join(out_dir, f"_stale__{name}")
        if os.path.exists(stale):
            shutil.rmtree(stale)
        if os.path.exists(live):
            os.rename(live, stale)
        os.rename(src, live)
        if os.path.exists(stale):
            shutil.rmtree(stale)
    # stale dirs orphaned by a crash right after a partition's swap
    for name in os.listdir(out_dir):
        if name.startswith("_stale__"):
            shutil.rmtree(os.path.join(out_dir, name))
    shutil.rmtree(staging)


def _require_local(path: str, what: str) -> str:
    """The epoch ledger and partition swap use POSIX file APIs; a
    non-local URI would silently lose replay protection (the ledger
    ``os.path.exists`` never sees it), so refuse loudly.  On object
    stores this sink belongs to a table format (Delta/Iceberg MERGE)
    whose metadata commit provides the atomicity these renames
    emulate locally."""
    if "://" in path and not path.startswith("file://"):
        raise NotImplementedError(
            f"run_live_rollup requires a local {what} (got {path!r}); "
            "use a transactional table format on object stores"
        )
    return path.removeprefix("file://")


def run_live_rollup(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    compact: bool = False,
) -> None:
    """Drive the live rollup over everything currently in the landing
    directory (synchronous; a deployment would leave the query
    running on a trigger).

    Merge semantics: each epoch ADDS its (deduped) events into the
    touched day partitions — see ``merge_rollup``.  Because the merge
    is additive, a replayed epoch (crash between sink completion and
    checkpoint commit) must not run twice.  The sink commits each
    epoch with a stage → marker → swap protocol:

    1. write the merged running totals for the touched days to a
       staging dir (a complete new version of each touched partition),
    2. atomically record the epoch in the per-checkpoint ledger
       (tmp-write + rename; wiping the checkpoint wipes the ledger),
    3. swap the staged partition dirs into the live dataset
       (idempotent renames — ``_complete_epoch_swap``).

    Crash before (2): the replayed epoch discards the stage and
    recomputes from the UNCHANGED live data — no loss, no double-add.
    Crash after (2): the replayed epoch finds the marker and only
    finishes the swap from the authoritative staged totals — the
    merge never runs twice.  Both paths converge to exactly-once.
    """
    out_dir = _require_local(out_dir, "out_dir")
    checkpoint_dir = _require_local(checkpoint_dir, "checkpoint_dir")
    stream = dedup_stream(with_event_time(stream_gdelt_dir(spark, landing_dir)))
    ledger_dir = os.path.join(checkpoint_dir, "_sink_epochs")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        import shutil

        marker = os.path.join(ledger_dir, str(epoch_id))
        staging = f"{out_dir.rstrip('/')}__epoch{epoch_id}__staging"
        if os.path.exists(marker):
            # replayed epoch: the merge already happened; at most the
            # swap needs finishing.  Still drain the batch — Spark 4
            # validates that foreachBatch processes every partition so
            # the stateful dedup upstream can commit its state store.
            if os.path.exists(staging):
                _complete_epoch_swap(staging, out_dir)
            batch_df.count()
            return
        if os.path.exists(staging):
            # crashed after staging but before the marker: the live
            # data is untouched, so recompute from scratch
            shutil.rmtree(staging)
        rolled = rollup_batch(batch_df)
        if rolled.isEmpty():
            return
        merged = merge_rollup(batch_df.sparkSession, rolled, out_dir)
        # cut lineage from the files the swap replaces
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").partitionBy("day").parquet(staging)
        os.makedirs(ledger_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("staged")
        os.replace(tmp, marker)  # the commit point
        _complete_epoch_swap(staging, out_dir)

    run_foreach_batch(stream, sink, checkpoint_dir)
    if compact:
        compact_parquet(spark, out_dir, partition_by=["day"])
