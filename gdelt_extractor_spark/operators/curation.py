"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, deterministic train/val splitting, and
per-source corpus accounting.  All pure JVM expressions — scan-speed
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import shingles_from_tokens


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_overlap: float = 0.1,
) -> DataFrame:
    """Benchmark decontamination: per-document fraction of n-gram
    shingles that appear anywhere in the benchmark corpus, plus a
    keep flag (overlap ≤ max_overlap).

    The benchmark shingle set is small → broadcast into a left join
    on the exploded doc shingles; the doc scan never shuffles.  This
    is the standard eval-contamination filter (e.g. GPT-3 Appendix C
    style n-gram overlap).
    """
    doc_sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .select("doc_id", shingles_from_tokens(F.col("_toks"), n).alias("sh"))
        .select("doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("shingle"))
    )
    bench_sh = (
        benchmark.select(tokens(text_col).alias("_toks"))
        .select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"))
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias("overlap_frac"),
            (F.round(F.col("n_overlap") / F.col("n_shingles"), 6) <= max_overlap).alias(
                "keep"
            ),
        )
    )


def sample_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic hash-based train/val split.

    bucket = first 4 hex digits of md5(salt:id) as int, mod 100 —
    content-stable across runs, engines and cluster sizes (unlike
    ``randomSplit``), and salt-versioned so a new salt redraws the
    split.  Pure expression; splits at 100 TB are a scan, not a
    shuffle.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    return df.select(
        "*",
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


def corpus_stats(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum corpus accounting: document counts, token and
    char budgets — the bookkeeping every data-mixing recipe needs.
    One partial-aggregated shuffle on the (small-cardinality) strata
    key."""
    n_tok = F.size(tokens(text_col))
    return docs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("long")).alias("total_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("total_chars"),
        (F.sum(n_tok.cast("long")) / F.count(F.lit(1))).alias("avg_tokens"),
    )
