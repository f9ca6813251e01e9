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


class TestPackBinsBFD:
    def _docs(self, spark, lens, budget_word="w"):
        rows = [(i, " ".join([budget_word] * n)) for i, n in enumerate(lens)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_example(self, spark):
        from gdelt_extractor_spark.operators.packing import pack_bins_bfd

        # budget 10, lengths [7,5,5,3,2] in one shard:
        # desc order 7,5,5,3,2 → bins [7,3], [5,5], [2]
        out = pack_bins_bfd(
            self._docs(spark, [7, 5, 5, 3, 2]), budget=10, n_shards=1
        ).collect()
        by_bin: dict = {}
        for r in out:
            by_bin.setdefault(r.bin_id, []).append(r.n_tokens)
        assert sorted(sorted(v, reverse=True) for v in by_bin.values()) == [
            [2], [5, 5], [7, 3]]
        assert not any(r.truncated for r in out)

    def test_invariants_and_determinism(self, spark):
        from gdelt_extractor_spark.operators.packing import pack_bins_bfd

        lens = [((i * 37) % 120) + 1 for i in range(200)]
        docs = self._docs(spark, lens)
        out = pack_bins_bfd(docs, budget=128, n_shards=4).collect()
        # completeness: every doc exactly once
        assert sorted(r.doc_id for r in out) == list(range(200))
        # capacity: no (shard, bin) over budget; truncated docs alone
        fill: dict = {}
        for r in out:
            fill.setdefault((r.shard, r.bin_id), []).append(r)
        for members in fill.values():
            if any(m.truncated for m in members):
                assert len(members) == 1
            else:
                assert sum(m.n_tokens for m in members) <= 128
        # bin_slot is a dense placement order within the bin
        for members in fill.values():
            assert sorted(m.bin_slot for m in members) == list(range(len(members)))
        # partition invariance
        out2 = pack_bins_bfd(docs.repartition(13), budget=128, n_shards=4).collect()
        assert {tuple(r) for r in out} == {tuple(r) for r in out2}

    def test_null_text_counts_as_empty(self, spark):
        """ADVICE r8: NULL text must not reach _bfd as n_tokens=-1
        (which would best-fit anywhere and GROW the bin's remaining
        capacity); it counts as 1 token ('') and capacity holds."""
        from gdelt_extractor_spark.operators.packing import pack_bins_bfd

        rows = [(0, None)] + [(i, " ".join(["w"] * 9)) for i in range(1, 12)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = pack_bins_bfd(docs, budget=10, n_shards=1).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id[0].n_tokens == 1 and not by_id[0].truncated
        fill: dict = {}
        for r in out:
            fill.setdefault(r.bin_id, 0)
            fill[r.bin_id] += r.n_tokens
        assert all(v <= 10 for v in fill.values())

    def test_truncated_flag(self, spark):
        from gdelt_extractor_spark.operators.packing import pack_bins_bfd

        out = pack_bins_bfd(
            self._docs(spark, [300, 4]), budget=16, n_shards=1
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id[0].truncated and not by_id[1].truncated
        assert by_id[0].bin_id != by_id[1].bin_id

    def test_matches_reference_bfd(self, spark):
        """Independent pure-Python BFD (bisect-insort structure, not
        the operator's linear scan) must produce the identical
        assignment."""
        import bisect
        import hashlib

        from gdelt_extractor_spark.operators.packing import pack_bins_bfd

        lens = [((i * 53) % 90) + 1 for i in range(120)]
        budget, n_shards = 96, 2
        docs = self._docs(spark, lens)
        got = {(r.doc_id): (r.shard, r.bin_id, r.bin_slot)
               for r in pack_bins_bfd(docs, budget=budget, n_shards=n_shards).collect()}
        # reference
        want = {}
        for shard in range(n_shards):
            items = [(lens[i], hashlib.md5(f"pack-v1:{i}".encode()).hexdigest(), i)
                     for i in range(120) if i % n_shards == shard]
            items.sort(key=lambda t: (-t[0], t[1], t[2]))
            open_bins = []  # sorted list of [remaining, bin_id, next_slot]
            n_bins = 0
            for n, _, i in items:
                cands = [b for b in open_bins if b[0] >= n]
                if not cands:
                    b = [budget - n, n_bins, 1]
                    n_bins += 1
                    open_bins.append(b)
                    want[i] = (shard, b[1], 0)
                else:
                    b = min(cands, key=lambda t: (t[0], t[1]))
                    want[i] = (shard, b[1], b[2])
                    b[0] -= n
                    b[2] += 1
        assert got == want
