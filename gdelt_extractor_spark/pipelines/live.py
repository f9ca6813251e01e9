"""Live rollup pipeline: the streaming composition of the engine's
primitives into the table the reference rebuilds from scratch every
15 minutes (reference/v2.py + cron).

Shape: file-source stream of GDELT TSV drops → event-time +
watermarked keep-first dedup (bounded state) → per-day/root-code
rollup → ``foreachBatch`` partition upsert (each micro-batch
rewrites ONLY the day partitions it touched, idempotently) →
optional small-file compaction.

Why this is the 100 TB architecture:
- the stream processes each drop once (checkpointed, exactly-once
  per epoch across restarts — tests/test_streaming.py),
- the serving table is partitioned parquet updated in place by
  partition, so readers never see a truncate (vs the reference's
  replace-mode ``to_sql``),
- late data within the watermark lands in its own day partition on
  the next batch — the upsert recomputes that partition from the
  batch's rows, converging without full recompute,
- compaction bounds file counts as ticks accrete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    NOTE on upsert semantics: within one batch the rollup holds the
    complete aggregate for every (day, root) the batch saw, because
    dedup happens upstream — so dynamic partition overwrite replaces
    each touched day with a consistent value.  Distinct drops landing
    in different batches for the SAME day are additive across
    batches only if they carry disjoint events per day; GDELT's
    15-minute export files are exactly that (each event id appears
    in one export), matching the reference's tick model.
    """
    stream = dedup_stream(with_event_time(stream_gdelt_dir(spark, landing_dir)))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        rolled = rollup_batch(batch_df)
        if rolled.isEmpty():
            return
        upsert_partitions(rolled, out_dir, partition_by=["day"])

    run_foreach_batch(stream, sink, checkpoint_dir)
    if compact:
        compact_parquet(spark, out_dir, partition_by=["day"])
