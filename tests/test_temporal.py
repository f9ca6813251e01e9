"""Unit tests for the temporal operators (as-of join, range join)
on crafted frames where the expected output is computable by hand."""

from __future__ import annotations

import pytest

from gdelt_extractor_spark.operators.temporal import asof_join, range_join


def test_asof_join_strict_and_nonstrict(spark):
    trades = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "ts long, sym string, price double",
    )
    quotes = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (5, "b", 5.0)],
        "ts long, sym string, bid double",
    )
    strict = {
        (r.ts, r.sym): r.asof_bid
        for r in asof_join(
            trades, quotes, on="ts", by="sym", value_cols=["bid"], strict=True
        ).collect()
    }
    # strict: quote at the same ts is NOT visible
    assert strict == {(1, "a"): None, (2, "a"): 1.0, (3, "b"): None}
    nonstrict = {
        (r.ts, r.sym): r.asof_bid
        for r in asof_join(
            trades, quotes, on="ts", by="sym", value_cols=["bid"], strict=False
        ).collect()
    }
    assert nonstrict == {(1, "a"): 1.0, (2, "a"): 2.0, (3, "b"): None}


@pytest.fixture()
def interval_frames(spark):
    intervals = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 150), (3, 900, 1000)],
        "iid long, s long, e long",
    )
    points = spark.createDataFrame(
        [(10, 60), (11, 100), (12, 150), (13, 500)],
        "pid long, p long",
    )
    return intervals, points


def test_range_join_inner(spark, interval_frames):
    intervals, points = interval_frames
    got = {
        (r.iid, r.pid)
        for r in range_join(
            intervals, points, "s", "e", "p", bin_width=100, how="inner"
        ).collect()
    }
    # half-open (s, e]: iid=1 gets p=60,100; iid=2 gets 60,100,150; iid=3 none
    assert got == {(1, 10), (1, 11), (2, 10), (2, 11), (2, 12)}


def test_range_join_left_backfills_empty_intervals(spark, interval_frames):
    intervals, points = interval_frames
    rows = range_join(
        intervals, points, "s", "e", "p", bin_width=100,
        how="left", interval_id="iid",
    ).collect()
    by_iid: dict[int, list] = {}
    for r in rows:
        by_iid.setdefault(r.iid, []).append(r.pid)
    assert sorted(by_iid[1]) == [10, 11]
    assert sorted(by_iid[2]) == [10, 11, 12]
    assert by_iid[3] == [None]  # exactly one null row, not one per bin


def test_range_join_with_by_key(spark):
    intervals = spark.createDataFrame(
        [(1, "u1", 0, 100), (2, "u2", 0, 100)], "iid long, u string, s long, e long"
    )
    points = spark.createDataFrame(
        [(10, "u1", 50), (11, "u2", 60)], "pid long, u string, p long"
    )
    got = {
        (r.iid, r.pid)
        for r in range_join(
            intervals, points, "s", "e", "p", bin_width=64,
            by=["u"], how="inner",
        ).collect()
    }
    assert got == {(1, 10), (2, 11)}


def test_range_join_no_duplicate_pairs_across_bins(spark):
    # interval spans many bins; each point must appear exactly once
    intervals = spark.createDataFrame([(1, 0, 1000)], "iid long, s long, e long")
    points = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 100)], "pid long, p long"
    )
    out = range_join(
        intervals, points, "s", "e", "p", bin_width=100, how="inner"
    ).collect()
    pids = [r.pid for r in out]
    assert len(pids) == len(set(pids)) == 99


class TestFillGaps:
    def _daily(self, spark, rows):
        return spark.createDataFrame(rows, "k string, ts timestamp, v double")

    def test_ffill_and_observed_flag(self, spark):
        from datetime import datetime
        from gdelt_extractor_spark.operators.temporal import fill_gaps

        df = self._daily(spark, [
            ("a", datetime(2024, 1, 1), 1.0),
            ("a", datetime(2024, 1, 4), 4.0),   # 2 missing days
            ("b", datetime(2024, 1, 2), 9.0),   # independent span
        ])
        got = {(r.k, r.day.day): (r.v, r.is_observed)
               for r in fill_gaps(df, "k", "ts", "v").collect()}
        assert got[("a", 1)] == (1.0, True)
        assert got[("a", 2)] == (1.0, False)   # carried forward
        assert got[("a", 3)] == (1.0, False)
        assert got[("a", 4)] == (4.0, True)
        # b's grid is its OWN span only — no global calendar
        assert [k for k in got if k[0] == "b"] == [("b", 2)]

    def test_zero_fill(self, spark):
        from datetime import datetime
        from gdelt_extractor_spark.operators.temporal import fill_gaps

        df = self._daily(spark, [
            ("a", datetime(2024, 1, 1), 3.0),
            ("a", datetime(2024, 1, 3), 7.0),
        ])
        got = {r.day.day: r.v
               for r in fill_gaps(df, "k", "ts", "v", fill="zero").collect()}
        assert got == {1: 3.0, 2: 0.0, 3: 7.0}


class TestGridJoin:
    def test_containment_boundaries_and_overlap(self, spark):
        from gdelt_extractor_spark.operators.geo import grid_join

        pts = spark.createDataFrame(
            [
                (1, 5.0, 5.0),     # inside A only
                (2, 10.0, 10.0),   # ON A's max edge: half-open → B only
                (3, 5.0, -5.0),    # in neither
                (4, 7.0, 7.0),     # inside A AND the overlapping C
            ],
            "event_id long, lat double, lon double",
        )
        boxes = spark.createDataFrame(
            [
                (100, 0.0, 10.0, 0.0, 10.0),    # A
                (200, 10.0, 20.0, 10.0, 20.0),  # B abuts A's corner
                (300, 6.0, 8.0, 6.0, 8.0),      # C inside A
            ],
            "box_id long, lat_min double, lat_max double, "
            "lon_min double, lon_max double",
        )
        got = sorted(
            (r.event_id, r.box_id)
            for r in grid_join(pts, boxes, cell_deg=4.0).collect()
        )
        assert got == [(1, 100), (2, 200), (4, 100), (4, 300)]

    def test_no_duplicate_pairs_across_cells(self, spark):
        """A box spanning many cells still matches each point once."""
        from gdelt_extractor_spark.operators.geo import grid_join

        pts = spark.createDataFrame(
            [(i, float(i), float(i)) for i in range(0, 40, 5)],
            "event_id long, lat double, lon double",
        )
        boxes = spark.createDataFrame(
            [(9, -50.0, 50.0, -50.0, 50.0)],
            "box_id long, lat_min double, lat_max double, "
            "lon_min double, lon_max double",
        )
        got = grid_join(pts, boxes, cell_deg=3.0).collect()
        assert len(got) == 8  # one row per point, no distinct needed


class TestScd2:
    def test_merge_chain_noop_and_history(self, spark):
        from datetime import datetime
        from gdelt_extractor_spark.operators.temporal import scd2_apply

        current = spark.createDataFrame(
            [
                # key 1: one closed version + one open
                (1, "gold", datetime(2020, 1, 1), datetime(2021, 1, 1)),
                (1, "silver", datetime(2021, 1, 1), None),
                # key 2: open only
                (2, "bronze", datetime(2020, 6, 1), None),
            ],
            "k long, tier string, valid_from timestamp, valid_to timestamp",
        )
        updates = spark.createDataFrame(
            [
                (1, "platinum", datetime(2022, 1, 1)),   # real change
                (1, "platinum", datetime(2023, 1, 1)),   # no-op: suppressed
                (2, "silver", datetime(2022, 6, 1)),     # change
                (2, "gold", datetime(2023, 6, 1)),       # second change
            ],
            "k long, tier string, ts timestamp",
        )
        got = sorted(
            (r.k, r.tier, r.valid_from.year, r.valid_to.year if r.valid_to else None)
            for r in scd2_apply(current, updates, "k", ["tier"]).collect()
        )
        assert got == [
            (1, "gold", 2020, 2021),        # closed history untouched
            (1, "platinum", 2022, None),    # open; 2023 no-op suppressed
            (1, "silver", 2021, 2022),      # closed by the update
            (2, "bronze", 2020, 2022),
            (2, "gold", 2023, None),
            (2, "silver", 2022, 2023),
        ]


class TestApplyCdc:
    def _run(self, spark, snap_rows, chg_rows):
        from gdelt_extractor_spark.operators.temporal import apply_cdc

        snap = spark.createDataFrame(snap_rows, "k long, v string")
        chg = spark.createDataFrame(
            chg_rows, "k long, op string, ts timestamp, v string"
        )
        out = apply_cdc(snap, chg, "k", ["v"])
        return {r.k: r.v for r in out.collect()}

    def test_upsert_delete_insert_passthrough(self, spark):
        import datetime as dt

        t = lambda d: dt.datetime(2024, 1, d)
        got = self._run(
            spark,
            [(1, "a"), (2, "b"), (3, "c")],
            [
                (1, "U", t(1), "a2"),   # update existing
                (2, "D", t(1), None),   # delete existing
                (9, "I", t(1), "new"),  # insert unseen key
            ],
        )
        assert got == {1: "a2", 3: "c", 9: "new"}

    def test_latest_change_wins(self, spark):
        import datetime as dt

        t = lambda d: dt.datetime(2024, 1, d)
        got = self._run(
            spark,
            [(1, "a")],
            [
                (1, "U", t(1), "v1"),
                (1, "D", t(2), None),
                (1, "U", t(3), "v3"),  # latest: resurrects after D
                (2, "I", t(1), "x"),
                (2, "D", t(2), None),  # latest: never appears
            ],
        )
        assert got == {1: "v3"}

    def test_same_timestamp_delete_wins(self, spark):
        import datetime as dt

        t = dt.datetime(2024, 1, 1)
        got = self._run(
            spark, [(1, "a")], [(1, "U", t, "u"), (1, "D", t, None)]
        )
        assert got == {}


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 50), (3, "u", 100)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [(7, "u", 12, 1.0), (8, "u", 12, 2.0), (9, "u", 60, 3.0),
         (10, "v", 11, 9.9)],
        "rid long, k string, t long, v double",
    )
    from gdelt_extractor_spark.operators.temporal import asof_join

    out = {
        r["lid"]: r.asDict()
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["rid", "v"],
            direction="forward", tie_col="rid",
        ).collect()
    }
    # forward: earliest later right row; tie at t=12 -> smallest rid
    assert out[1]["asof_rid"] == 7 and out[1]["asof_v"] == 1.0
    assert out[2]["asof_rid"] == 9
    assert out[3]["asof_rid"] is None  # nothing after t=100

    tol = {
        r["lid"]: r.asDict()
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["rid"],
            direction="forward", tolerance=5.0, tie_col="rid",
        ).collect()
    }
    assert tol[1]["asof_rid"] == 7     # gap 2 <= 5
    assert tol[2]["asof_rid"] is None  # gap 10 > 5


def test_asof_backward_tie_and_strictness(spark):
    left = spark.createDataFrame([(1, "u", 12)], "lid long, k string, t long")
    right = spark.createDataFrame(
        [(7, "u", 12, 1.0), (8, "u", 12, 2.0), (5, "u", 3, 0.5)],
        "rid long, k string, t long, v double",
    )
    from gdelt_extractor_spark.operators.temporal import asof_join

    strict = asof_join(
        left, right, on="t", by="k", value_cols=["rid"], strict=True,
        tie_col="rid",
    ).first()
    assert strict["asof_rid"] == 5  # boundary rows invisible
    loose = asof_join(
        left, right, on="t", by="k", value_cols=["rid"], strict=False,
        tie_col="rid",
    ).first()
    assert loose["asof_rid"] == 8  # backward tie -> largest rid


def test_asof_timestamp_tolerance_units(spark):
    from datetime import datetime

    from gdelt_extractor_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u", datetime(2024, 1, 1, 0, 0, 30))],
        "lid long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [(7, "u", datetime(2024, 1, 1, 0, 0, 0), 1.0)],
        "rid long, k string, t timestamp, v double",
    )
    hit = asof_join(
        left, right, on="t", by="k", value_cols=["rid"], tolerance=30.0
    ).first()
    assert hit["asof_rid"] == 7  # 30 s gap == 30 s tolerance
    miss = asof_join(
        left, right, on="t", by="k", value_cols=["rid"], tolerance=29.0
    ).first()
    assert miss["asof_rid"] is None


def test_fill_gaps_linear_matches_pandas_interpolate(spark):
    import pandas as pd

    from gdelt_extractor_spark.operators.temporal import fill_gaps

    from datetime import datetime
    rows = [
        ("k1", datetime(2024, 1, 1), 10.0),
        ("k1", datetime(2024, 1, 4), 40.0),   # gap of 2 days
        ("k1", datetime(2024, 1, 5), 20.0),
        ("k2", datetime(2024, 2, 1), 5.0),
        ("k2", datetime(2024, 2, 2), 7.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = fill_gaps(df, "key", "ts", "v", fill="linear").toPandas()
    got = {
        (r.key, r.day.strftime("%m-%d")): (r.v, r.is_observed)
        for r in out.itertuples()
    }
    # pandas reference for k1
    s = pd.Series(
        [10.0, None, None, 40.0, 20.0],
        index=pd.date_range("2024-01-01", periods=5),
    ).interpolate(method="linear")
    for i, day in enumerate(["01-01", "01-02", "01-03", "01-04", "01-05"]):
        assert abs(got[("k1", day)][0] - round(float(s.iloc[i]), 6)) < 1e-9
    assert got[("k1", "01-02")][1] is False or got[("k1", "01-02")][1] == False  # noqa: E712
    assert got[("k2", "02-01")] == (5.0, True)


def test_fill_gaps_linear_edges_clamp(spark):
    from datetime import datetime

    from gdelt_extractor_spark.operators.temporal import fill_gaps

    # single observation: span is one day, value passes through
    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 3), 9.0)],
        "key string, ts timestamp, v double",
    )
    out = fill_gaps(df, "key", "ts", "v", fill="linear").collect()
    assert len(out) == 1 and out[0].v == 9.0 and out[0].is_observed


def test_decayed_engagement_hand_computed(spark):
    from gdelt_extractor_spark.operators.temporal import decayed_engagement
    from pyspark.sql import functions as F

    # events 7 and 14 days before the reference: weights 0.5, 0.25
    rows = [(1, "2024-01-25 00:00:00", 100.0),
            (1, "2024-01-18 00:00:00", 100.0),
            (2, "2024-01-25 00:00:00", 10.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {r.user_id: r for r in decayed_engagement(df).collect()}
    assert out[1].decayed_score == 75.0        # 100·0.5 + 100·0.25
    assert out[1].raw_sum == 200.0
    assert out[2].decayed_score == 5.0
    assert out[1].n_events == 2
    assert out[1].last_seen.strftime("%Y-%m-%d") == "2024-01-25"


def test_decayed_engagement_recency_ordering(spark):
    from gdelt_extractor_spark.operators.temporal import decayed_engagement
    from pyspark.sql import functions as F

    # equal raw mass, different recency: fresher key scores higher
    rows = [(1, "2024-01-30 00:00:00", 50.0),
            (2, "2024-01-02 00:00:00", 50.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {r.user_id: r for r in decayed_engagement(df).collect()}
    assert out[1].raw_sum == out[2].raw_sum == 50.0
    assert out[1].decayed_score > out[2].decayed_score > 0


class TestKaplanMeier:
    def _km(self, spark, rows):
        from gdelt_extractor_spark.operators.temporal import kaplan_meier

        df = spark.createDataFrame(rows, "dur double, obs boolean")
        return {
            r.duration: (r.n_at_risk, r.n_events, r.n_censored, r.survival)
            for r in kaplan_meier(df, "dur", "obs").collect()
        }

    def test_textbook_curve(self, spark):
        out = self._km(
            spark,
            [(1.0, True), (2.0, False), (3.0, True), (4.0, True), (5.0, False)],
        )
        assert out[1.0] == (5, 1, 0, 0.8)
        assert out[2.0] == (4, 0, 1, 0.8)           # censoring: no drop
        assert out[3.0] == (3, 1, 0, round(0.8 * 2 / 3, 6))
        assert out[4.0] == (2, 1, 0, round(0.8 * 2 / 3 * 0.5, 6))
        assert out[5.0][3] == out[4.0][3]

    def test_everyone_dies_hits_zero(self, spark):
        out = self._km(spark, [(1.0, True), (1.0, True)])
        assert out[1.0] == (2, 2, 0, 0.0)

    def test_all_censored_stays_one(self, spark):
        out = self._km(spark, [(1.0, False), (2.0, False)])
        assert all(v[3] == 1.0 for v in out.values())

    def test_matches_naive_reference(self, spark):
        import random

        rng = random.Random(5)
        rows = [
            (float(rng.randint(1, 12)), rng.random() < 0.6) for _ in range(200)
        ]
        # naive product-limit over sorted distinct durations
        from collections import Counter

        d_events = Counter(d for d, o in rows if o)
        d_all = Counter(d for d, _ in rows)
        n_at_risk, s, want = len(rows), 1.0, {}
        for t in sorted(d_all):
            d = d_events.get(t, 0)
            if d:
                s *= 1 - d / n_at_risk
            want[t] = round(s, 6)
            n_at_risk -= d_all[t]
        got = self._km(spark, rows)
        assert {t: v[3] for t, v in got.items()} == want


class TestGini:
    def _g(self, spark, vals):
        from gdelt_extractor_spark.operators.profiling import gini

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "rid long, x double"
        )
        return gini(df, "x", "rid").collect()[0]

    def test_equal_values_zero(self, spark):
        assert self._g(spark, [5, 5, 5, 5]).gini == 0.0

    def test_single_holder_max(self, spark):
        r = self._g(spark, [0, 0, 0, 10])
        assert r.gini == 0.75  # (n-1)/n for n=4

    def test_known_arithmetic_case(self, spark):
        # sorted 1,2,3,4: G = 2*30/(4*10) - 5/4 = 0.25
        assert self._g(spark, [3, 1, 4, 2]).gini == 0.25

    def test_null_gini_on_zero_mass(self, spark):
        assert self._g(spark, [0.0, 0.0]).gini is None


class TestCusumChangepoint:
    def _run(self, spark, vals):
        from gdelt_extractor_spark.operators.temporal import cusum_changepoint

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "b long, v double"
        )
        return sorted(
            cusum_changepoint(df, "b", "v").collect(), key=lambda r: r.bucket
        )

    def test_level_shift_found_at_boundary(self, spark):
        out = self._run(spark, [1, 1, 1, 1, 5, 5, 5, 5])
        # mean 3: cusum walks to -8 at the last low bucket, back to 0
        assert [r.cusum for r in out] == [-2, -4, -6, -8, -6, -4, -2, 0]
        flagged = [r.bucket for r in out if r.is_changepoint]
        assert flagged == [3]

    def test_exactly_one_flag_even_on_ties(self, spark):
        out = self._run(spark, [2, 2, 2, 2])
        assert [r.cusum for r in out] == [0, 0, 0, 0]
        assert sum(r.is_changepoint for r in out) == 1
        assert out[0].is_changepoint  # earliest bucket wins ties


class TestAutocorrelation:
    def _acf(self, spark, vals, max_lag):
        from gdelt_extractor_spark.operators.temporal import autocorrelation

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "b long, v double"
        )
        return {
            r.lag: (r.n_pairs, r.acf)
            for r in autocorrelation(df, "b", "v", max_lag=max_lag).collect()
        }

    def test_alternating_series(self, spark):
        n = 10
        out = self._acf(spark, [1, -1] * (n // 2), 2)
        assert out[1] == (n - 1, round(-(n - 1) / n, 6))
        assert out[2] == (n - 2, round((n - 2) / n, 6))

    def test_lags_beyond_series_are_zero(self, spark):
        out = self._acf(spark, [1.0, 5.0, 2.0], 5)
        assert out[4] == (0, 0.0) and out[5] == (0, 0.0)

    def test_constant_series_null_acf(self, spark):
        out = self._acf(spark, [3.0, 3.0, 3.0], 2)
        assert all(v[1] is None for v in out.values())

    def test_matches_naive_reference(self, spark):
        import random

        rng = random.Random(3)
        vals = [rng.uniform(0, 10) for _ in range(40)]
        mean = sum(vals) / len(vals)
        d = [v - mean for v in vals]
        den = sum(x * x for x in d)
        got = self._acf(spark, vals, 3)
        for k in (1, 2, 3):
            want = round(
                sum(d[i] * d[i + k] for i in range(len(d) - k)) / den, 6
            )
            assert abs(got[k][1] - want) < 2e-6, (k, got[k], want)


class TestSeasonalDecompose:
    def test_identity_and_constant_series(self, spark):
        import datetime as dt

        from gdelt_extractor_spark.operators.temporal import seasonal_decompose

        rows = [("k", dt.date(2024, 1, 1) + dt.timedelta(days=i), 5.0)
                for i in range(21)]
        df = spark.createDataFrame(rows, "k string, day date, v double")
        out = seasonal_decompose(df, "k", "day", "v").collect()
        assert len(out) == 21
        for r in out:
            # constant series: trend = value, seasonal = residual = 0
            assert r.trend == 5.0 and r.seasonal == 0.0 and r.residual == 0.0
            # additive identity holds exactly (micro-unit arithmetic)
            assert abs(r.value - (r.trend + r.seasonal + r.residual)) < 2e-6

    def test_weekly_pattern_recovered(self, spark):
        import datetime as dt

        from gdelt_extractor_spark.operators.temporal import seasonal_decompose

        # period-7 signal, no trend: interior rows' centered 7-day MA
        # is the flat mean, so seasonal should capture the offsets
        pattern = [10, 12, 14, 10, 8, 6, 10]  # mean 10
        rows = [("k", dt.date(2024, 1, 1) + dt.timedelta(days=i),
                 float(pattern[i % 7])) for i in range(35)]
        df = spark.createDataFrame(rows, "k string, day date, v double")
        out = {r.day: r for r in seasonal_decompose(df, "k", "day", "v").collect()}
        interior = [dt.date(2024, 1, 1) + dt.timedelta(days=i)
                    for i in range(3, 32)]
        for d in interior:
            r = out[d]
            assert r.trend == 10.0
            # seasonal close to the true offset (edge windows shift
            # the weekday means slightly)
            true_off = pattern[(d - dt.date(2024, 1, 1)).days % 7] - 10.0
            assert abs(r.seasonal - true_off) < 1.2, (d, r.seasonal, true_off)
            assert abs(r.value - (r.trend + r.seasonal + r.residual)) < 2e-6

    def test_partition_invariant(self, spark):
        import datetime as dt

        from gdelt_extractor_spark.operators.temporal import seasonal_decompose

        rows = [(f"k{i % 3}", dt.date(2024, 1, 1) + dt.timedelta(days=i // 3),
                 float((i * 7) % 13)) for i in range(90)]
        df = spark.createDataFrame(rows, "k string, day date, v double")
        a = {tuple(r) for r in seasonal_decompose(df.repartition(1), "k", "day", "v").collect()}
        b = {tuple(r) for r in seasonal_decompose(df.repartition(11), "k", "day", "v").collect()}
        assert a == b
