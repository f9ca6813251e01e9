"""CLI wiring + SQL-surface tests (injected session, no subprocess)."""

from __future__ import annotations

import os

from gdelt_extractor_spark.__main__ import main
from gdelt_extractor_spark.sql import register_tables, run_sql

SF = "/root/testdata/sf0.001"


def test_register_tables_and_sql(spark):
    names = register_tables(spark, SF)
    assert "lineitem" in names and "documents" in names
    n_sql = run_sql(
        spark, SF, "SELECT COUNT(*) AS n FROM lineitem"
    ).collect()[0].n
    from gdelt_extractor_spark.sources.tables import load_table

    assert n_sql == load_table(spark, SF, "lineitem").count() > 0


def test_sql_join_runs_through_catalyst(spark):
    out = run_sql(
        spark,
        SF,
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 3
        """,
    ).collect()
    assert len(out) == 3 and out[0].n >= out[-1].n


def test_cli_list(spark, capsys):
    assert main(["list"], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert any("q1_pricing_summary" in l for l in lines)
    # oracle-gated entries are starred
    assert any(l.startswith("*") and "q1_pricing_summary" in l for l in lines)


def test_cli_query_unknown_is_error(spark, capsys):
    assert main(["query", "no_such_query"], spark=spark) == 2


def test_cli_query_prints_and_exports(spark, tmp_path, capsys):
    rc = main(
        ["query", "q1_pricing_summary", "--sf-dir", SF, "--limit", "3"],
        spark=spark,
    )
    assert rc == 0 and "l_returnflag" in capsys.readouterr().out
    out = str(tmp_path / "q1_out")
    rc = main(
        ["query", "q1_pricing_summary", "--sf-dir", SF, "--out", out],
        spark=spark,
    )
    assert rc == 0 and os.path.isdir(out)
    assert spark.read.parquet(out).count() > 0


def test_cli_sql_export_csv(spark, tmp_path):
    out = str(tmp_path / "sql_csv")
    rc = main(
        [
            "sql",
            "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1",
            "--sf-dir",
            SF,
            "--out",
            out,
            "--fmt",
            "csv",
        ],
        spark=spark,
    )
    assert rc == 0
    got = (
        spark.read.option("header", "true").csv(out).count()
    )
    assert got == 3
