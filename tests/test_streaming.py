"""Streaming update-loop tests: file-source stream of GDELT-shaped
TSV drops → event-time, watermarked dedup, windowed rollup,
foreachBatch sink — driven synchronously via processAllAvailable."""

from __future__ import annotations

import pytest

from gdelt_extractor_spark.streaming import updates as U
from tests.test_sources_gdelt import _v2_row


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "t1.export.CSV").write_text(
        "\n".join(
            [
                _v2_row(1, "http://example.com/a", "14"),
                _v2_row(2, "http://example.com/a", "14"),
                _v2_row(3, "http://example.com/b", "19"),
            ]
        )
    )
    (d / "t2.export.CSV").write_text(
        "\n".join(
            [
                _v2_row(4, "http://example.com/c", "19"),
                _v2_row(5, "http://example.com/b", "19"),
            ]
        )
    )
    return str(d)


def test_stream_dedup_keep_first(spark, landing):
    stream = U.with_event_time(U.stream_gdelt_dir(spark, landing))
    deduped = U.dedup_stream(stream).select("GLOBALEVENTID", "SOURCEURL")
    U.run_to_memory_sink(deduped, "dedup_out")
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    urls = [r.SOURCEURL for r in rows]
    assert sorted(urls) == sorted(set(urls))  # one row per URL
    assert len(rows) == 3


def test_stream_windowed_counts(spark, landing):
    stream = U.with_event_time(U.stream_gdelt_dir(spark, landing))
    agg = U.windowed_counts(stream)
    U.run_to_memory_sink(agg, "win_out", output_mode="complete")
    rows = spark.sql("SELECT EventRootCode, n_events FROM win_out").collect()
    counts = {r.EventRootCode: r.n_events for r in rows}
    assert counts == {"14": 2, "19": 3}


def test_stream_static_dim_join(spark, landing):
    from gdelt_extractor_spark.functions.lookups import cameo_root_df

    stream = U.with_event_time(U.stream_gdelt_dir(spark, landing))
    dim = cameo_root_df(spark).withColumnRenamed("root_code", "EventRootCode")
    enriched = U.join_static_dim(
        stream.select("GLOBALEVENTID", "EventRootCode"), dim, "EventRootCode"
    )
    U.run_to_memory_sink(enriched, "dim_join_out")
    rows = spark.sql("SELECT * FROM dim_join_out").collect()
    assert len(rows) == 5
    labels = {r.EventRootCode: r.root_label for r in rows}
    assert labels == {"14": "Protest", "19": "Fight"}


def test_stream_foreach_batch_sink(spark, landing, tmp_path):
    stream = U.with_event_time(U.stream_gdelt_dir(spark, landing))
    out = tmp_path / "sink"
    seen = []

    def sink(batch_df, epoch_id):
        seen.append(batch_df.count())
        batch_df.select("GLOBALEVENTID").write.mode("append").parquet(str(out))

    U.run_foreach_batch(stream, sink, str(tmp_path / "ckpt"))
    assert sum(seen) == 5
    assert spark.read.parquet(str(out)).count() == 5
