"""Streaming incremental corpus ingestion with exactly-once dedup:
the live counterpart of ``operators.dedup.dedup_incremental``.

A file-source stream of document drops is deduplicated per
micro-batch against (a) itself and (b) the content hashes of
everything ALREADY IN the corpus, then appended — so the corpus
never holds two copies of a normalized text, no matter how often
crawls re-deliver the same page.

Exactly-once without a second ledger: survivors land via DYNAMIC
PARTITION OVERWRITE into a ``batch_id=<epoch>`` partition, and the
seen-index is simply the corpus's own hash column restricted to
EARLIER batch partitions.  A replayed epoch therefore (1) rebuilds
its seen-index identically — its own partial partition is excluded
by the ``batch_id < epoch`` predicate — and (2) overwrites its own
partition wholesale, converging to the same bytes.  The classic
two-sink atomicity problem (corpus written, index not) cannot occur
because there is no separate index to drift: one table carries both
roles, and tomorrow's batches read only its hash column
(column-pruned scan; keep the corpus hash-bucketed at real scale so
the anti join never reshuffles history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..operators.dedup import dedup_incremental
from ..sinks.files import upsert_partitions
from ..streaming.updates import run_foreach_batch


def _seen_hashes(
    spark: SparkSession, corpus_dir: str, before_batch: int
) -> DataFrame:
    """Content hashes already committed by EARLIER epochs (empty
    frame on the very first batch).  The ``batch_id <`` predicate is
    partition pruning — a replayed epoch's own partial output is
    invisible to its recomputation."""
    try:
        corpus = spark.read.parquet(corpus_dir)
    except AnalysisException:  # first batch: corpus does not exist yet
        return spark.createDataFrame([], "content_hash string")
    return corpus.filter(F.col("batch_id") < before_batch).select("content_hash")


def _record_metrics(
    spark: SparkSession,
    metrics_dir: str,
    corpus_dir: str,
    batch_id: int,
    n_seen: int,
) -> None:
    """Per-epoch dedup-rate audit row: (batch_id, n_seen, n_survived,
    n_dropped), derived from the LANDED partition (not the in-flight
    frame) so the metric can never disagree with the corpus, and
    landed via the same idempotent batch_id partition overwrite — a
    replayed epoch overwrites its own metrics row, so the audit
    stream inherits the pipeline's exactly-once story instead of
    needing its own."""
    n_survived = (
        spark.read.parquet(corpus_dir)
        .filter(F.col("batch_id") == int(batch_id))
        .count()
    )
    row = spark.createDataFrame(
        [(int(batch_id), int(n_seen), int(n_survived), int(n_seen) - n_survived)],
        "batch_id long, n_seen long, n_survived long, n_dropped long",
    )
    upsert_partitions(row, metrics_dir, ["batch_id"])


def ingest_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    metrics_dir: str | None = None,
) -> None:
    """One epoch: batch-internal keep-first + anti join against the
    committed hash index, then an idempotent partition overwrite.
    With ``metrics_dir`` set, a (batch_id, n_seen, n_survived,
    n_dropped) audit row lands after the corpus write (one extra
    source scan for the count — the file-source batch is replayable,
    so no cache is needed)."""
    spark = batch.sparkSession
    survivors = dedup_incremental(
        batch, _seen_hashes(spark, corpus_dir, batch_id), text_col, id_col
    )
    upsert_partitions(
        survivors.withColumn("batch_id", F.lit(int(batch_id))),
        corpus_dir,
        ["batch_id"],
    )
    if metrics_dir is not None:
        _record_metrics(spark, metrics_dir, corpus_dir, batch_id, batch.count())


def run_incremental_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id LONG, text STRING, source STRING",
    max_files_per_trigger: int = 8,
    metrics_dir: str | None = None,
) -> None:
    """Drive the stream until the landing dir is drained (test mode;
    production drops ``processAllAvailable`` for a continuous
    trigger).  JSONL drops → per-epoch ``ingest_batch``."""
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
    )
    run_foreach_batch(
        stream,
        lambda b, i: ingest_batch(b, i, corpus_dir, metrics_dir=metrics_dir),
        checkpoint_dir,
    )


def _seen_band_index(
    spark: SparkSession,
    corpus_dir: str,
    before_batch: int,
    id_col: str,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """LSH band rows of everything committed by EARLIER epochs.

    The corpus persists each survivor's MinHash SIGNATURE as a
    column, so the index rebuilds from stored sigs with one
    column-pruned scan + a codegen band explode — historical text is
    never re-tokenized, and the one-table/no-second-ledger property
    of the exact pipeline carries over: the near-dup index cannot
    drift from the corpus because it IS the corpus."""
    from ..operators.dedup import _expand_bands

    try:
        corpus = spark.read.parquet(corpus_dir)
    except AnalysisException:  # first batch
        return spark.createDataFrame(
            [], "id long, sig array<bigint>, band int, bucket bigint"
        )
    prior = corpus.filter(F.col("batch_id") < before_batch).select(
        F.col(id_col).alias("id"), "sig"
    )
    return _expand_bands(prior, num_hashes, bands)


def ingest_batch_near_dup(
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    metrics_dir: str | None = None,
) -> None:
    """One epoch of NEAR-dup incremental ingestion: the exact
    pipeline's shape with ``dedup_incremental_minhash`` in place of
    the hash anti join.  Survivors land with their signature column
    via the same idempotent batch_id partition overwrite, so replays
    converge bytewise exactly as in the exact pipeline (the replayed
    epoch's own partial partition is pruned out of its index).

    Banding default (16 bands × 2 rows over 32 hashes) puts the LSH
    S-curve midpoint at (1/16)^(1/2) = 0.25 — comfortably below the
    0.5 verification threshold, so candidate recall is not the
    bottleneck."""
    from ..operators.dedup import dedup_incremental_minhash, minhash_signatures

    spark = batch.sparkSession
    idx = _seen_band_index(
        spark, corpus_dir, batch_id, id_col, num_hashes, bands
    )
    survivors = dedup_incremental_minhash(
        batch, idx, text_col, id_col, num_hashes, bands, threshold=threshold
    )
    sigs = minhash_signatures(
        survivors, text_col, id_col, num_hashes
    ).withColumnRenamed("id", id_col)
    upsert_partitions(
        survivors.join(sigs, id_col).withColumn(
            "batch_id", F.lit(int(batch_id))
        ),
        corpus_dir,
        ["batch_id"],
    )
    if metrics_dir is not None:
        _record_metrics(spark, metrics_dir, corpus_dir, batch_id, batch.count())


def run_incremental_near_dedup_stream(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id LONG, text STRING, source STRING",
    max_files_per_trigger: int = 8,
    metrics_dir: str | None = None,
) -> None:
    """Near-dup twin of ``run_incremental_dedup_stream``: JSONL
    drops → per-epoch ``ingest_batch_near_dup``."""
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
    )
    run_foreach_batch(
        stream,
        lambda b, i: ingest_batch_near_dup(b, i, corpus_dir, metrics_dir=metrics_dir),
        checkpoint_dir,
    )
