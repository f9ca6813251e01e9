"""Integration test: the live-rollup pipeline — stream → dedup →
per-batch rollup → MERGE into day partitions → compaction — over
real file drops, including an incremental second tick on the SAME
day (additive merge) and a checkpoint-restart with no new data
(idempotence)."""

from __future__ import annotations

import pathlib

from gdelt_extractor_spark.pipelines.live import run_live_rollup
from tests.test_sources_gdelt import _v2_row


def _totals(spark, out):
    return {
        (str(r.day), r.root_code): (r.n_events, r.n_articles)
        for r in spark.read.parquet(out).collect()
    }


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
    # fixture rows are all 2024-01-01, NumArticles=5; dup removed
    assert _totals(spark, out) == {
        ("2024-01-01", "14"): (1, 5),
        ("2024-01-01", "19"): (1, 5),
    }

    # second tick: new drop, SAME day — the merge must ADD the new
    # batch's events to the day partition, and root codes the second
    # batch never touched (14) must survive untouched
    (landing / "t2.export.CSV").write_text(
        "\n".join([_v2_row(4, "http://x/c", "19"), _v2_row(5, "http://x/d", "19")])
    )
    run_live_rollup(spark, str(landing), out, ckpt, compact=True)
    back = spark.read.parquet(out)
    assert _totals(spark, out) == {
        ("2024-01-01", "14"): (1, 5),          # tick-1 count preserved
        ("2024-01-01", "19"): (3, 15),         # 1 (tick 1) + 2 (tick 2)
    }
    assert "day" in back.columns  # compaction kept the hive layout
    files = list(pathlib.Path(out).rglob("*.parquet"))
    assert files and all("day=" in str(f) for f in files)

    # third run, no new drops: a restart at a tick boundary must be a
    # no-op — checkpoint replays nothing, totals unchanged
    run_live_rollup(spark, str(landing), out, ckpt)
    assert _totals(spark, out) == {
        ("2024-01-01", "14"): (1, 5),
        ("2024-01-01", "19"): (3, 15),
    }


def test_live_rollup_epoch_ledger_blocks_replay(spark, tmp_path):
    """A replayed epoch (same checkpoint, same batch id) must not
    double-add: simulate the replay by wiping Spark's OFFSET commit
    log but keeping the sink's epoch ledger — the re-fired epoch 0
    finds its marker and skips."""
    import shutil

    landing = tmp_path / "landing"; landing.mkdir()
    out = str(tmp_path / "rollup")
    ckpt = tmp_path / "ckpt"

    (landing / "t1.export.CSV").write_text(_v2_row(1, "http://x/a", "14"))
    run_live_rollup(spark, str(landing), out, str(ckpt))
    assert _totals(spark, out) == {("2024-01-01", "14"): (1, 5)}

    # crash-before-checkpoint-commit: Spark will re-deliver epoch 0
    for sub in ("commits", "offsets", "sources", "state"):
        p = ckpt / sub
        if p.exists():
            shutil.rmtree(p)
    run_live_rollup(spark, str(landing), out, str(ckpt))
    # without the ledger this would read (1,5) + replayed (1,5) = (2,10)
    assert _totals(spark, out) == {("2024-01-01", "14"): (1, 5)}
