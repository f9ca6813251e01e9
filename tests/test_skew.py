"""Salted join / two-stage agg must be value-identical to their
unsalted equivalents — salting changes the shuffle, never the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.skew import salted_agg, salted_join
from gdelt_extractor_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    # event_type has 5 values over ~10k rows — a maximally skewed key
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 3.0), ("error", -1.0)],
        "event_type string, weight double",
    )
    plain = e.join(dim, ["event_type"]).select("event_id", "weight")
    salted = salted_join(
        e, dim, on=["event_type"], salt_by=["event_id"], n_salts=8
    ).select("event_id", "weight")
    assert plain.count() == salted.count()
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "zz")], "id long, k string")
    right = spark.createDataFrame([("a", 10)], "k string, v long")
    out = salted_join(left, right, on=["k"], salt_by=["id"], n_salts=4, how="left")
    got = {(r.id, r.v) for r in out.collect()}
    assert got == {(1, 10), (2, None)}


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type): (r.n, r.tot, r.mx)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("tot"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.event_type): (r.n, float(r.tot), r.mx)
        for r in salted_agg(
            e,
            ["event_type"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "tot": ("sum", F.sum(F.col("value").cast("decimal(25,6)"))),
                "mx": ("max", F.max("value")),
            },
            salt_by=["event_id"],
            n_salts=8,
        )
        .withColumn("tot", F.col("tot").cast("double"))
        .collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    import pytest

    e = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        salted_agg(e, ["event_type"], {"bad": ("avg", F.avg("value"))}, ["event_id"])
