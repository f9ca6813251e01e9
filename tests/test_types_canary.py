"""Canary for engine/testdata type drift (VERDICT r3 item 8).

Spark 4.1 changed parquet timestamp inference (isAdjustedToUTC=0 →
TIMESTAMP_NTZ), silently breaking three query-shaped tests.  This file
is the one obvious place that fails loudly if the engine or the
driver-generated testdata shifts types again.
"""

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from gdelt_extractor_spark.sources.tables import load_table


def test_events_ts_is_ltz_timestamp(spark, sf_dir):
    """load_table must normalize events.ts to plain TIMESTAMP (LTZ)."""
    schema = {f.name: f.dataType for f in load_table(spark, sf_dir, "events").schema}
    assert schema["ts"] == TimestampType(), schema["ts"]


def test_events_ts_normalized_without_session_conf(spark, sf_dir):
    """The normalization must be local to load_table (save/restore),
    not dependent on get_spark's session conf — the driver's own
    session doesn't go through get_spark."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")  # simulate a stock 4.1 session
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        # conf restored to what the caller set, not clobbered
        assert spark.conf.get(key) == "true"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_events_ts_operations_that_ntz_rejects(spark, sf_dir):
    """The two expression shapes that broke on 4.1.2 must analyze."""
    e = load_table(spark, sf_dir, "events")
    row = (
        e.select(
            F.col("ts").cast("double").alias("secs"),
            F.unix_micros("ts").alias("us"),
        )
        .limit(1)
        .collect()[0]
    )
    assert row.secs is not None and row.us is not None


def test_get_spark_pins_ntz_inference_off(spark):
    assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
