"""Integration test: the live-rollup pipeline — stream → dedup →
per-batch rollup → partition upsert → compaction — over real file
drops, including an incremental second tick."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from gdelt_extractor_spark.pipelines.live import run_live_rollup
from tests.test_sources_gdelt import _v2_row


def test_live_rollup_incremental(spark, tmp_path):
    landing = tmp_path / "landing"; landing.mkdir()
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    (landing / "t1.export.CSV").write_text(
        "\n".join(
            [
                _v2_row(1, "http://x/a", "14"),
                _v2_row(2, "http://x/a", "14"),  # dup URL -> dropped
                _v2_row(3, "http://x/b", "19"),
            ]
        )
    )
    run_live_rollup(spark, str(landing), out, ckpt)
    first = {
        (str(r.day), r.root_code): (r.n_events, r.n_articles)
        for r in spark.read.parquet(out).collect()
    }
    # fixture rows are all 2024-01-01, NumArticles=5; dup removed
    assert first == {
        ("2024-01-01", "14"): (1, 5),
        ("2024-01-01", "19"): (1, 5),
    }

    # second tick: new drop, same day — day partition recomputed
    # from the new batch's (disjoint) events via upsert
    (landing / "t2.export.CSV").write_text(
        "\n".join([_v2_row(4, "http://x/c", "19"), _v2_row(5, "http://x/d", "19")])
    )
    run_live_rollup(spark, str(landing), out, ckpt, compact=True)
    back = spark.read.parquet(out)
    second = {
        (str(r.day), r.root_code): r.n_events for r in back.collect()
    }
    # the day=2024-01-01 partition was overwritten by batch 2's rollup
    assert second[("2024-01-01", "19")] == 2
    assert "day" in back.columns  # compaction kept the hive layout
    files = list(pathlib.Path(out).rglob("*.parquet"))
    assert files and all("day=" in str(f) for f in files)
