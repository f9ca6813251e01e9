"""lm_block_spans: the block→doc materialization map must tile the
packing layout exactly — every doc fully covered, every block full
except each shard's last, offsets consistent with pack_sequences."""

import pytest
from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.packing import (
    lm_block_spans,
    pack_sequences,
)


def _docs_df(spark):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 23)))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_tile_each_doc(spark):
    df = _docs_df(spark)
    spans = lm_block_spans(df, budget=16, n_shards=2).toPandas()
    n_tok = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    per_doc = spans.groupby("doc_id")["span_len"].sum().to_dict()
    assert per_doc == {d: n for d, n in n_tok.items() if n > 0}
    # doc_from ranges are contiguous from 0 per doc
    for doc_id, g in spans.groupby("doc_id"):
        g = g.sort_values("block_id")
        assert g["doc_from"].iloc[0] == 0
        ends = (g["doc_from"] + g["span_len"]).tolist()
        assert g["doc_from"].tolist()[1:] == ends[:-1]


def test_blocks_full_except_last_per_shard(spark):
    spans = lm_block_spans(_docs_df(spark), budget=16, n_shards=2).toPandas()
    per_block = (
        spans.groupby(["shard", "block_id"])["span_len"].sum().reset_index()
    )
    for shard, g in per_block.groupby("shard"):
        g = g.sort_values("block_id")
        # block ids are dense 0..max
        assert g["block_id"].tolist() == list(range(len(g)))
        assert (g["span_len"].iloc[:-1] == 16).all()
        assert 0 < g["span_len"].iloc[-1] <= 16
    # within a block, block_from spans are contiguous from 0
    for (_, _), g in spans.groupby(["shard", "block_id"]):
        g = g.sort_values("block_from")
        assert g["block_from"].iloc[0] == 0
        ends = (g["block_from"] + g["span_len"]).tolist()
        assert g["block_from"].tolist()[1:] == ends[:-1]


def test_consistent_with_pack_sequences(spark):
    df = _docs_df(spark)
    packed = pack_sequences(df, budget=16, n_shards=2).toPandas()
    spans = lm_block_spans(df, budget=16, n_shards=2).toPandas()
    first = (
        spans.sort_values("block_id").groupby("doc_id").first().reset_index()
    )
    merged = packed.merge(first, on="doc_id", suffixes=("_p", "_s"))
    merged = merged[merged["n_tokens"] > 0]
    assert (merged["block_id"] == merged["seq_id"]).all()
    assert (merged["block_from"] == merged["seq_offset"]).all()


def test_empty_docs_follow_tokenizer_convention(spark):
    # the repo-wide tokenizer yields one empty token for blank text
    # (matching the DuckDB twin), so every doc occupies >= 1 slot
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    spans = lm_block_spans(df, budget=4, n_shards=1).toPandas()
    assert set(spans["doc_id"]) == {1, 2, 3}
    assert spans.groupby("doc_id")["span_len"].sum().to_dict() == {
        1: 3, 2: 1, 3: 1,
    }


def test_partition_independent(spark):
    df = _docs_df(spark)
    a = sorted(map(tuple, lm_block_spans(df, budget=16).collect()))
    b = sorted(
        map(tuple, lm_block_spans(df.repartition(7), budget=16).collect())
    )
    assert a == b
