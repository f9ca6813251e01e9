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
