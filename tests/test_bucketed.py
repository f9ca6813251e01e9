"""Bucketed-table co-located join: the join of two tables bucketed
on the join key must plan WITHOUT a shuffle (no Exchange above
either scan) and produce the same rows as the shuffled join."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from gdelt_extractor_spark.sinks.files import write_bucketed
from gdelt_extractor_spark.sources.tables import load_table


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # spark.sql.warehouse.dir is static: bucketed tables land in the
    # session's default warehouse; DROP TABLE removes the files
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(o, "orders_b", ["o_orderkey"], 8, sort_by=["o_orderkey"])
        write_bucketed(l, "lineitem_b", ["l_orderkey"], 8, sort_by=["l_orderkey"])

        # at test scale the planner would broadcast instead; disable
        # it to surface the big-big (sort-merge) path bucketing is for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = lb.join(ob, F.col("l_orderkey") == F.col("o_orderkey"))

        plan = _explain(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan

        expected = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert joined.count() == expected

        # aggregation keyed on the bucket column also skips the shuffle
        agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        agg_plan = _explain(agg)
        assert "Exchange" not in agg_plan, "bucket-keyed agg must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
