"""JSONL (newline-delimited JSON) corpus source — the interchange
format of LLM training corpora.

Scale posture:
- EXPLICIT schema, never inference: ``spark.read.json`` without a
  schema scans the whole dataset once just to infer types — at 100 TB
  that doubles ingest cost and can mis-type sparse fields.
- ``multiLine=False`` (the default) keeps files SPLITTABLE: a single
  1 TB .jsonl still parallelizes by line ranges; multiLine JSON would
  serialize each file onto one task.
- PERMISSIVE mode with a corrupt-record column: one malformed line
  lands in ``_corrupt_record`` instead of failing the job — a 100 TB
  ingest must never die on row 3 trillion.  Callers filter or audit
  the corrupt rows explicitly (``valid_documents`` /
  ``corrupt_lines``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Documents-shaped JSONL reader (doc_id/text/lang/source/
    n_chars) with corrupt lines captured, not fatal."""
    return (
        spark.read.schema(DOCUMENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def valid_documents(df: DataFrame) -> DataFrame:
    """Parsed rows only, corrupt-record column dropped.

    Validity is keyed on the required ``doc_id`` field (PERMISSIVE
    nulls every data column of a corrupt row) rather than on
    ``_corrupt_record IS NULL``: Spark refuses any JSON-scan plan
    whose referenced columns reduce to just the internal corrupt
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — which is exactly
    what ``filter(corrupt IS NULL).count()`` prunes down to — and
    the documented cache() workaround is a non-starter for a 100 TB
    ingest."""
    return df.filter(F.col("doc_id").isNotNull()).drop("_corrupt_record")


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The audit side: raw text of every line that failed to parse.

    The filter also references ``doc_id`` (always NULL on a corrupt
    row in PERMISSIVE mode): Spark refuses a JSON scan whose only
    referenced column is the internal corrupt-record column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the usual workaround —
    caching the whole frame — is exactly what a 100 TB audit must
    not do.  Referencing a data column keeps the scan legal, lazy,
    and prune-friendly."""
    return df.filter(
        F.col("_corrupt_record").isNotNull() & F.col("doc_id").isNull()
    ).select(F.col("_corrupt_record").alias("raw_line"))
