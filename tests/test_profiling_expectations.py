"""check_expectations: counted violations, null-as-violation
semantics, guarded rule names, and the single-aggregate plan."""

import pytest
from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.profiling import check_expectations


def _df(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -5.0, "b"),
        (3, None, "a"),
        (4, 99.0, None),
        (5, 3.0, "c"),
    ]
    return spark.createDataFrame(rows, "id long, v double, cat string")


def test_counts_and_flags(spark):
    out = {
        r["rule"]: r
        for r in check_expectations(
            _df(spark),
            {
                "v_positive": F.col("v") > 0,
                "cat_known": F.col("cat").isin("a", "b"),
                "id_not_null": F.col("id").isNotNull(),
            },
        ).collect()
    }
    # v_positive: -5 fails, NULL counts as violation → 2
    assert out["v_positive"]["n_violations"] == 2
    assert out["v_positive"]["passed"] is False
    assert out["v_positive"]["violation_rate"] == 0.4
    # cat_known: 'c' and NULL fail → 2
    assert out["cat_known"]["n_violations"] == 2
    assert out["id_not_null"]["n_violations"] == 0
    assert out["id_not_null"]["passed"] is True
    assert all(r["n_rows"] == 5 for r in out.values())


def test_rule_name_guard(spark):
    with pytest.raises(ValueError):
        check_expectations(_df(spark), {"bad'name": F.lit(True)})
    with pytest.raises(ValueError):
        check_expectations(_df(spark), {})


def test_single_aggregate_plan(spark):
    plan = (
        check_expectations(
            _df(spark), {"a": F.col("v") > 0, "b": F.col("id") < 3}
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one scan, one global aggregate pair — no join, no extra scans
    assert plan.count("Scan ") <= 1


def test_psi_drift_identical_and_shifted(spark):
    from gdelt_extractor_spark.operators.profiling import psi_drift

    old = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)], "v double"
    )
    same = psi_drift(old, old, "v", n_bins=10, lo=0.0, hi=10.0).collect()
    # identical snapshots: every term 0, psi 0
    assert all(r.psi_term == 0.0 and r.psi == 0.0 for r in same)
    assert {r.bin for r in same} == set(range(10))
    assert all(r.p_old == 0.1 for r in same)

    # everything shifts up by 5: half the bins lose all mass, half gain
    new = old.select((F.col("v") + 5.0).alias("v"))
    out = psi_drift(old, new, "v", n_bins=10, lo=0.0, hi=10.0).collect()
    psi = out[0].psi
    assert psi > 0.25  # classic "shifted" territory
    assert all(r.psi == psi for r in out)
    # bins 0-4 lost mass (negative q-p -> positive term), 5-9 doubled
    by_bin = {r.bin: r for r in out}
    assert by_bin[0].q_new == 0.0 and by_bin[0].psi_term > 0
    # clamp: bin 9 absorbs v in [9,15) -> q doubles plus clamped tail


def test_psi_drift_clamps_out_of_range(spark):
    from gdelt_extractor_spark.operators.profiling import psi_drift

    old = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    new = spark.createDataFrame([(-50.0,), (99.0,)], "v double")
    out = {r.bin: r for r in psi_drift(old, new, "v", n_bins=4,
                                       lo=0.0, hi=4.0).collect()}
    # nulls dropped; out-of-range mass lands in the edge bins
    assert out[0].q_new == 0.5 and out[3].q_new == 0.5
    assert out[1].p_old == 0.5 and out[2].p_old == 0.5


def test_psi_drift_defaults_range_from_old(spark):
    from gdelt_extractor_spark.operators.profiling import psi_drift
    import pytest as _pytest

    old = spark.createDataFrame([(0.0,), (10.0,)], "v double")
    out = psi_drift(old, old, "v", n_bins=5).collect()
    # sparse output: only occupied bins appear (0 and the clamped top)
    assert {r.bin for r in out} == {0, 4}
    assert all(r.psi == 0.0 for r in out)
    flat = spark.createDataFrame([(3.0,), (3.0,)], "v double")
    with _pytest.raises(ValueError, match="hi > lo"):
        psi_drift(flat, flat, "v")


class TestKeySkewProfile:
    def test_uniform_vs_hot_key(self, spark):
        from gdelt_extractor_spark.operators.profiling import key_skew_profile

        rows = [(i, f"u{i % 10}", "hot" if i < 90 else f"t{i}") for i in range(100)]
        df = spark.createDataFrame(rows, "i long, uniform string, hot string")
        out = {r.key_col: r for r in key_skew_profile(df, ["uniform", "hot"]).collect()}
        u, h = out["uniform"], out["hot"]
        assert u.n_keys == 10 and u.top1_share == 0.1 and u.gini == 0.0
        assert h.n_keys == 11 and h.top1_share == 0.9
        assert h.gini > 0.7
        assert u.n_rows == h.n_rows == 100 and u.n_nulls == 0

    def test_nulls_counted_not_profiled(self, spark):
        from gdelt_extractor_spark.operators.profiling import key_skew_profile

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (4, None)], "i long, k string"
        )
        r = key_skew_profile(df, ["k"]).collect()[0]
        assert r.n_rows == 4 and r.n_nulls == 2
        assert r.n_keys == 1 and r.top1_share == 1.0


class TestBootstrapCI:
    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        from gdelt_extractor_spark.operators.profiling import bootstrap_ci

        df = spark.createDataFrame(
            [(i, float(i % 100) + 1.0) for i in range(400)], "id long, x double"
        )
        a = bootstrap_ci(df, "x", "id", n_resamples=100).collect()[0]
        b = bootstrap_ci(df.repartition(17), "x", "id", n_resamples=100).collect()[0]
        assert tuple(a) == tuple(b)
        assert a.n == 400 and a.n_resamples == 100
        assert a.ci_lo <= a.mean <= a.ci_hi
        assert a.ci_hi - a.ci_lo < 10  # ~2·1.96·sd/sqrt(n) ballpark

    def test_poisson_draw_matches_pure_python(self, spark):
        """The md5→48-bit→threshold inversion must equal a pure-Python
        replica (the same replica the DuckDB oracle runs), and the
        realized counts must look Poisson(1): mean ≈ 1, P(0) ≈ e⁻¹."""
        import hashlib
        import math

        from gdelt_extractor_spark.operators.profiling import (
            bootstrap_ci,
            poisson1_thresholds_48,
        )

        T = poisson1_thresholds_48()
        assert len(T) == 9 and T == sorted(T)
        assert abs(T[0] / (1 << 48) - math.exp(-1)) < 1e-12

        def count(salt: str, b: int, rid: str) -> int:
            u = int(
                hashlib.md5(f"{salt}:{b}:{rid}".encode()).hexdigest()[:12], 16
            )
            return sum(1 for t in T if u >= t)

        counts = [count("boot-v1", b, str(i)) for b in range(50) for i in range(200)]
        m = sum(counts) / len(counts)
        p0 = sum(1 for c in counts if c == 0) / len(counts)
        assert 0.9 < m < 1.1
        assert abs(p0 - math.exp(-1)) < 0.03

        # end-to-end: the operator's CI on constant data is exactly
        # the constant (every resample mean = 42 in micro-units)
        df = spark.createDataFrame(
            [(i, 42.0) for i in range(100)], "id long, x double"
        )
        r = bootstrap_ci(df, "x", "id", n_resamples=50).collect()[0]
        assert r.mean == r.ci_lo == r.ci_hi == 42.0

    def test_salt_changes_resamples_not_mean(self, spark):
        from gdelt_extractor_spark.operators.profiling import bootstrap_ci

        df = spark.createDataFrame(
            [(i, float((i * 13) % 50)) for i in range(200)], "id long, x double"
        )
        a = bootstrap_ci(df, "x", "id", n_resamples=100, salt="s1").collect()[0]
        b = bootstrap_ci(df, "x", "id", n_resamples=100, salt="s2").collect()[0]
        assert a.mean == b.mean and a.n == b.n
        assert (a.ci_lo, a.ci_hi) != (b.ci_lo, b.ci_hi)


class TestCalibrationTable:
    def test_perfect_calibration_has_zero_ece(self, spark):
        from gdelt_extractor_spark.operators.profiling import calibration_table

        # bin [0.2, 0.3): all scores 0.25, exactly 1 of 4 positive →
        # obs 0.25 == mean score; same trick in a second bin
        rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
                (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
        df = spark.createDataFrame(rows, "s double, y int")
        out = calibration_table(df, "s", "y", n_bins=10).collect()
        assert len(out) == 2
        for r in out:
            assert r.gap == 0.0 and r.ece == 0.0
        by_bin = {r.bin: r for r in out}
        assert by_bin[2].obs_rate == 0.25 and by_bin[7].obs_rate == 0.75

    def test_miscalibrated_and_clamping(self, spark):
        from gdelt_extractor_spark.operators.profiling import calibration_table

        rows = [(0.9, 0), (0.95, 0), (1.3, 0), (-0.2, 1)]  # clamp 1.3→bin9, -0.2→bin0
        df = spark.createDataFrame(rows, "s double, y int")
        out = {r.bin: r for r in calibration_table(df, "s", "y").collect()}
        assert set(out) == {0, 9}
        assert out[9].n == 3 and out[9].obs_rate == 0.0
        assert out[0].n == 1 and out[0].obs_rate == 1.0
        # ece = (3*|0-mean9| + 1*|1-0|)/4
        m9 = out[9].mean_score
        assert abs(out[0].ece - round((3 * m9 + 1.0) / 4, 6)) < 1e-6


class TestKSTest:
    def test_identical_samples_zero(self, spark):
        from gdelt_extractor_spark.operators.profiling import ks_test

        a = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
        r = ks_test(a, a, "v").collect()[0]
        assert r.ks_d == 0.0 and r.n_old == r.n_new == 50

    def test_disjoint_samples_one(self, spark):
        from gdelt_extractor_spark.operators.profiling import ks_test

        a = spark.createDataFrame([(float(i),) for i in range(30)], "v double")
        b = spark.createDataFrame([(float(i + 100),) for i in range(20)], "v double")
        r = ks_test(a, b, "v").collect()[0]
        assert r.ks_d == 1.0

    def test_hand_case(self, spark):
        from gdelt_extractor_spark.operators.profiling import ks_test

        # old = {1,2,3,4}, new = {3,4,5,6}: D at v=2: |2/4 - 0| = 0.5
        a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
        b = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "v double")
        r = ks_test(a, b, "v").collect()[0]
        assert r.ks_d == 0.5
        import math
        assert abs(r.ks_scaled - round(0.5 * math.sqrt(16 / 8), 6)) < 1e-9


class TestJoinCardinality:
    def test_exact_counts(self, spark):
        from gdelt_extractor_spark.operators.profiling import join_cardinality

        a = spark.createDataFrame(
            [(k,) for k in [1, 1, 1, 2, 3, None]], "k long"
        )
        b = spark.createDataFrame([(k,) for k in [1, 1, 2, 4]], "k long")
        r = join_cardinality(a, b, "k").collect()[0]
        assert (r.n_a, r.n_b) == (5, 4)          # nulls excluded
        assert (r.n_keys_a, r.n_keys_b) == (3, 3)
        assert r.n_common_keys == 2
        # key 1: 3*2=6, key 2: 1*1=1 → 7; max per key 6
        assert r.join_rows == 7.0 and r.max_key_rows == 6
        # must equal the real join size
        real = a.dropna().join(b, "k").count()
        assert real == int(r.join_rows)

    def test_disjoint(self, spark):
        from gdelt_extractor_spark.operators.profiling import join_cardinality

        a = spark.createDataFrame([(1,)], "k long")
        b = spark.createDataFrame([(2,)], "k long")
        r = join_cardinality(a, b, "k").collect()[0]
        assert r.join_rows == 0.0 and r.n_common_keys == 0
