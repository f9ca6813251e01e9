"""interval_overlap_join vs naive theta join; preference_pairs
tie-breaks and filters."""

import random

from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.curation import preference_pairs
from gdelt_extractor_spark.operators.temporal import interval_overlap_join


def _intervals(spark, seed, n, name):
    rnd = random.Random(seed)
    rows = [
        (i, s := rnd.randrange(0, 500), s + rnd.randrange(1, 60))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, f"{name} long, start long, end long"
    )


def test_matches_naive_overlap(spark):
    lrows, l = _intervals(spark, 1, 80, "lid")
    rrows, r = _intervals(spark, 2, 90, "rid")
    got = sorted(
        (row["lid"], row["rid"])
        for row in interval_overlap_join(
            l, r, "start", "end", bin_width=32
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls < re and rs < le
    )
    assert got == want  # equality implies no duplicate pairs either


def test_bin_width_invariance(spark):
    _, l = _intervals(spark, 3, 60, "lid")
    _, r = _intervals(spark, 4, 60, "rid")
    outs = [
        sorted(
            (row["lid"], row["rid"])
            for row in interval_overlap_join(
                l, r, "start", "end", bin_width=w
            ).collect()
        )
        for w in (7, 64, 1000)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_by_keys_and_suffix(spark):
    l = spark.createDataFrame(
        [(1, "a", 0, 10), (2, "b", 0, 10)], "lid long, g string, start long, end long"
    )
    r = spark.createDataFrame(
        [(7, "a", 5, 15), (8, "b", 20, 30)], "rid long, g string, start long, end long"
    )
    out = interval_overlap_join(
        l, r, "start", "end", bin_width=8, by=["g"]
    ).collect()
    assert [(row["lid"], row["rid"]) for row in out] == [(1, 7)]
    assert {"start_r", "end_r"} <= set(out[0].asDict())


def test_preference_pairs_ties_and_filters(spark):
    df = spark.createDataFrame(
        [
            # group with ties at top and bottom: ids break them
            ("g1", 1, 5.0), ("g1", 2, 5.0), ("g1", 3, 1.0), ("g1", 4, 1.0),
            # single member: dropped
            ("g2", 5, 9.0),
            # zero margin: dropped
            ("g3", 6, 2.0), ("g3", 7, 2.0),
        ],
        "src string, id long, score double",
    )
    out = {
        r["src"]: r.asDict()
        for r in preference_pairs(df, "src", "id", "score").collect()
    }
    assert set(out) == {"g1"}
    assert out["g1"]["chosen_id"] == 2  # max (score, id)
    assert out["g1"]["rejected_id"] == 3  # min (score, id)
    assert out["g1"]["margin"] == 4.0 and out["g1"]["n_members"] == 4


def test_preference_pairs_min_margin(spark):
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 1.5)], "src string, id long, score double"
    )
    assert preference_pairs(df, "src", "id", "score", min_margin=1.0).count() == 0
    assert preference_pairs(df, "src", "id", "score", min_margin=0.4).count() == 1


def test_preference_pairs_single_aggregate_plan(spark):
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0)], "src string, id long, score double"
    )
    plan = (
        preference_pairs(df, "src", "id", "score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle, no window
