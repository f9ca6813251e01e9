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

from ..sinks.files import compact_parquet, upsert_partitions
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
    checkpoint commit) must not run twice: the sink records finished
    epoch ids in a ledger under the CHECKPOINT directory (so wiping
    the checkpoint wipes the ledger with it) and skips epochs already
    recorded.  The ledger is local-/HDFS-file based; resetting the
    checkpoint requires rebuilding ``out_dir`` from scratch, as with
    any non-transactional streaming sink.
    """
    stream = dedup_stream(with_event_time(stream_gdelt_dir(spark, landing_dir)))
    ledger_dir = os.path.join(checkpoint_dir, "_sink_epochs")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(ledger_dir, str(epoch_id))
        if os.path.exists(marker):
            # replayed epoch: the merge already happened.  Still drain
            # the batch — Spark 4 validates that foreachBatch processes
            # every partition so the stateful dedup upstream can commit
            # its state store; an early return would fail the query.
            batch_df.count()
            return
        rolled = rollup_batch(batch_df)
        if rolled.isEmpty():
            return
        merged = merge_rollup(batch_df.sparkSession, rolled, out_dir)
        # cut lineage from the files the overwrite replaces
        merged = merged.localCheckpoint(eager=True)
        upsert_partitions(merged, out_dir, partition_by=["day"])
        os.makedirs(ledger_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write("done")

    run_foreach_batch(stream, sink, checkpoint_dir)
    if compact:
        compact_parquet(spark, out_dir, partition_by=["day"])
