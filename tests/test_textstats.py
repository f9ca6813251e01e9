"""Unit tests for the newer text-analysis operators: repetition
stats, TF-IDF top terms, bigram mining (SURVEY.md §2c)."""

from __future__ import annotations

from gdelt_extractor_spark.operators import textstats as TS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_dup_lines(spark):
    df = _docs(
        spark,
        [
            (1, "alpha\nbeta\nalpha\n  alpha  \ngamma"),  # alpha ×3 after trim
            (2, "one line only"),
            (3, "\n \n  \n"),  # whitespace-only lines drop -> 0 lines
        ],
    )
    got = {r.doc_id: r for r in TS.repetition_stats(df, "doc_id", "text").collect()}
    assert (got[1].n_lines, got[1].n_distinct_lines) == (5, 3)
    assert got[1].dup_line_frac == 0.4
    assert (got[2].n_lines, got[2].dup_line_frac) == (1, 0.0)
    assert (got[3].n_lines, got[3].dup_line_frac) == (0, 0.0)


def test_tfidf_rare_term_outranks_common(spark):
    # 'common' appears in every doc (idf floor = 1), 'rare' in one
    # (idf = ln(4/2)+1 ≈ 1.693), equal tf -> rare outranks common
    df = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common filler"),
            (3, "common other words"),
        ],
    )
    out = TS.tfidf_top_terms(df, "doc_id", "text", k=2)
    top1 = {r.doc_id: r.term for r in out.filter("rank = 1").collect()}
    assert top1[1] == "rare"
    ranks = [(r.doc_id, r.rank) for r in out.collect()]
    assert all(rk in (1, 2) for _, rk in ranks)


def test_tfidf_tiebreak_by_term(spark):
    df = _docs(spark, [(1, "zebra apple"), (2, "zebra apple")])
    out = TS.tfidf_top_terms(df, "doc_id", "text", k=2).filter("doc_id = 1")
    rows = sorted((r.rank, r.term) for r in out.collect())
    # identical tf and df -> identical score -> lexicographic term order
    assert rows == [(1, "apple"), (2, "zebra")]


def test_top_bigrams_counts_and_limit(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b"),   # 'a b' ×2, 'b a' ×1
            (2, "a b"),       # 'a b' ×1
            (3, "single"),    # no bigram
        ],
    )
    rows = [(r.bigram, r.n) for r in TS.top_bigrams(df, "text", k=2).collect()]
    assert rows == [("a b", 3), ("b a", 1)]


def test_pack_sequences_layout(spark):
    """Concat-then-chunk semantics: offsets accumulate in order-key
    order within a shard, wrap at the budget, and a boundary-crossing
    doc starts in the sequence holding its first token."""
    from gdelt_extractor_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["w"] * 10)) for i in range(8)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=16, n_shards=2).collect()
    assert len(out) == 8
    by_shard: dict = {}
    for r in out:
        assert r.shard == r.doc_id % 2
        assert r.n_tokens == 10
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        # reconstruct order by (seq_id, seq_offset): starts must be
        # 0,10,20,30 -> (seq,off) = (0,0),(0,10),(1,4),(1,14)
        starts = sorted(r.seq_id * 16 + r.seq_offset for r in rs)
        assert starts == [0, 10, 20, 30], (shard, starts)


def test_pack_sequences_deterministic_and_partition_independent(spark):
    from gdelt_extractor_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["tok"] * (3 + i % 5))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(df, budget=32).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(7), budget=32).collect()))
    assert a == b


def test_pack_sequences_string_ids(spark):
    """String document ids shard via the md5 order key (ADVICE r4:
    pmod on a string column fails analysis) — layout semantics are
    otherwise identical: every shard's starts tile 0,n,2n,..."""
    from gdelt_extractor_spark.operators.packing import pack_sequences

    rows = [(f"doc-{i}", " ".join(["w"] * 10)) for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = pack_sequences(df, id_col="doc_id", budget=16, n_shards=4).collect()
    assert len(out) == 16
    assert all(0 <= r.shard < 4 for r in out)
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        starts = sorted(r.seq_id * 16 + r.seq_offset for r in rs)
        assert starts == [10 * i for i in range(len(rs))], (shard, starts)
    # deterministic under repartitioning
    again = pack_sequences(df.repartition(5), id_col="doc_id", budget=16, n_shards=4)
    assert sorted(map(tuple, out)) == sorted(map(tuple, again.collect()))


def test_gopher_rules_thresholds(spark):
    from gdelt_extractor_spark.operators.textstats import gopher_rules

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog and runs on"] * 5
    )  # 55 words, stopwords present, alphabetic
    short = "too short to pass"
    symbols = " ".join(["the and ### ... ### ... for on it"] * 8)
    numbers = " ".join(["12345 67890 11111 22222 33333 the and"] * 10)
    rows = [(1, good), (2, short), (3, symbols), (4, numbers)]
    out = {
        r.doc_id: r
        for r in gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    assert out[1].keep
    assert not out[2].keep          # below min word count
    assert not out[3].keep          # symbol ratio too high
    assert not out[4].keep          # alpha-word fraction too low
    assert out[1].n_stopwords >= 2


def test_lm_score_semantics(spark):
    """Bigram LM self-scoring: documents made of the corpus's common
    bigrams score higher than a document of unique bigrams; <2-token
    docs report NULL with n_bigrams 0."""
    from gdelt_extractor_spark.operators.textstats import lm_score

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "zq xv jk wp bn my"),  # bigrams seen nowhere else
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score(df, "doc_id", "text").collect()}
    assert len(out) == 4
    assert out[1].n_bigrams == 5 and out[1].lm_score == out[2].lm_score
    # repeated common bigrams (count 2) beat one-off bigrams
    assert out[1].lm_score > out[3].lm_score
    assert out[4].n_bigrams == 0 and out[4].lm_score is None


def test_ngram_repetition_semantics(spark):
    """'a b a b a b' with n=2: grams [a b, b a, a b, b a, a b] —
    'a b' ×3 tops (mass 9 of 15), every gram duplicated (dup frac
    1.0); an all-distinct doc scores 0.0; ties on count break to
    the lexically smallest gram; short docs are dropped."""
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z"), (3, "b a b a"), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in TS.ngram_repetition(df, n=2).collect()}
    assert set(out) == {1, 2, 3}  # doc 4: 1 token < n → dropped
    r1 = out[1]
    assert (r1.n_grams, r1.n_distinct_grams) == (5, 2)
    assert (r1.top_gram, r1.top_gram_count) == ("a b", 3)
    assert r1.top_ngram_char_frac == 0.6  # 3*3 / (3*3 + 2*3)
    assert r1.dup_ngram_char_frac == 1.0
    r2 = out[2]
    assert r2.dup_ngram_char_frac == 0.0 and r2.top_gram_count == 1
    # doc 3: grams [b a, a b, b a] — 'b a' wins on count, not lex
    assert out[3].top_gram == "b a"
    # tie case: every gram once → smallest gram lexically
    tie = spark.createDataFrame([(9, "z y x")], "doc_id long, text string")
    assert TS.ngram_repetition(tie, n=2).collect()[0].top_gram == "y x"


def test_vocab_divergence_semantics(spark):
    """A group whose tokens match the corpus distribution scores near
    zero; a group concentrated on rare terms scores higher; coverage
    counts only top-K vocabulary tokens; KL is non-negative."""
    df = spark.createDataFrame(
        [
            (1, "a a b b c c", "typical"),
            (2, "a a b b c c", "typical2"),
            (3, "z z z z z z", "weird"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in TS.vocab_divergence(df, vocab_k=3).collect()}
    assert set(out) == {"typical", "typical2", "weird"}
    # top-3 vocab is {z(6), then a/b/c(4 each) → a, b} — weird covers
    # 6/6 in-vocab tokens, typical 4/6
    assert out["weird"].n_in_vocab == 6
    assert out["typical"].n_in_vocab == 4
    assert out["typical"].vocab_coverage == round(4 / 6, 6)
    for r in out.values():
        assert r.kl_divergence >= 0.0
    assert out["weird"].kl_divergence > out["typical"].kl_divergence
    # identical groups score identically
    assert out["typical"].kl_divergence == out["typical2"].kl_divergence


def test_profile_table_nulls_and_types(spark):
    """Null counting, distinct excluding nulls, numeric-only stats."""
    from gdelt_extractor_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 2.5)],
        "k long, s string, v double",
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_num is None and rows["s"].mean_num is None
    assert rows["v"].n_null == 1 and rows["v"].n_distinct == 2
    assert rows["v"].min_num == 1.5 and rows["v"].max_num == 2.5
    # mean over NON-NULL values only
    assert abs(rows["v"].mean_num - (1.5 + 2.5 + 2.5) / 3) < 1e-9
    assert rows["k"].n_rows == 4 and rows["k"].n_null == 0


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    from gdelt_extractor_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "aa ab"), (2, "aa aa x")],  # 'aa'×3, 'ab'×1; 'x' too short
        "doc_id long, text string",
    )
    got = {r.pair: r.n for r in bpe_pair_counts(df, "doc_id", "text").collect()}
    assert got == {"aa": 3, "ab": 1}


class TestHashedEmbedding:
    def _emb(self, spark, rows):
        from gdelt_extractor_spark.operators.textstats import hashed_embedding

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: list(r.embedding)
                for r in hashed_embedding(df, "doc_id", "text").collect()}

    def test_deterministic_and_partition_independent(self, spark):
        from gdelt_extractor_spark.operators.textstats import hashed_embedding

        rows = [(i, f"some shared words plus token{i} extra") for i in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {r.doc_id: list(r.embedding)
             for r in hashed_embedding(df.repartition(3), "doc_id", "text").collect()}
        b = {r.doc_id: list(r.embedding)
             for r in hashed_embedding(df.repartition(7), "doc_id", "text").collect()}
        assert a == b

    def test_similarity_ordering_and_norm(self, spark):
        import math

        got = self._emb(spark, [
            (1, "spark shuffles partitions and broadcasts joins"),
            (2, "spark shuffles partitions and broadcasts tables"),   # near-dup of 1
            (3, "entirely unrelated culinary discussion of breads"),
        ])
        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))
        for v in got.values():
            assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
        assert cos(got[1], got[2]) > cos(got[1], got[3]) + 0.3

    def test_empty_doc_yields_zero_vector(self, spark):
        """A doc whose text tokenizes to nothing must still appear,
        as the zero vector — not silently vanish (ADVICE r5)."""
        got = self._emb(spark, [
            (1, "real words here"),
            (2, ""),          # empty
            (3, "   \n\t "),  # whitespace-only
        ])
        assert set(got) == {1, 2, 3}
        assert got[2] == [0.0] * 64
        assert got[3] == [0.0] * 64
        assert any(v != 0.0 for v in got[1])

    def test_md5_mode_matches_pure_python(self, spark):
        """The portable hash_fn='md5' variant (the oracle-replicable
        one) must equal a pure-Python replica of bucket/sign/norm —
        the same replica the DuckDB twin implements in SQL."""
        import hashlib
        import math

        from gdelt_extractor_spark.operators.textstats import hashed_embedding

        rows = [(1, "alpha beta beta gamma"), (2, "alpha alpha delta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: list(r.embedding)
               for r in hashed_embedding(df, "doc_id", "text",
                                         hash_fn="md5").collect()}
        for doc_id, text in rows:
            c = [0.0] * 64
            for t in text.split():
                hx = hashlib.md5(f"hash-emb-v1:{t}".encode()).hexdigest()
                b = int(hx[:12], 16) % 64
                s = -1.0 if int(hx[12], 16) % 2 == 0 else 1.0
                c[b] += s
            n = math.sqrt(sum(x * x for x in c))
            want = [x / n if n > 0 else 0.0 for x in c]
            assert got[doc_id] == want

    def test_long_layout_matches_dense(self, spark):
        """layout='long' (the codegen exploded path the oracle-gated
        entry uses) must equal posexploding the dense array —
        bit-for-bit, including zero rows for empty docs."""
        from pyspark.sql import functions as F

        from gdelt_extractor_spark.operators.textstats import hashed_embedding

        rows = [(1, "alpha beta beta gamma"), (2, ""), (3, "alpha delta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        dense = hashed_embedding(df, "doc_id", "text", hash_fn="md5")
        via_dense = {
            (r.doc_id, r.bucket): r.v
            for r in dense.select(
                "doc_id", F.posexplode("embedding").alias("bucket", "v")
            ).collect()
        }
        long = {
            (r.doc_id, r.bucket): r.value
            for r in hashed_embedding(
                df, "doc_id", "text", hash_fn="md5", layout="long"
            ).collect()
        }
        assert long == via_dense
        assert len(long) == 3 * 64

    def test_unknown_hash_fn_raises(self, spark):
        import pytest

        from gdelt_extractor_spark.operators.textstats import hashed_embedding

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="unknown hash_fn"):
            hashed_embedding(df, "doc_id", "text", hash_fn="sha1")

    def test_chains_into_ann(self, spark):
        """The bridge works: hashed text embeddings flow straight
        into the embedding ANN machinery."""
        from gdelt_extractor_spark.operators.similarity import ann_bruteforce
        from gdelt_extractor_spark.operators.textstats import hashed_embedding

        rows = [(i, "alpha beta gamma " + ("delta " * (i % 3))) for i in range(9)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        emb = hashed_embedding(df, "doc_id", "text").withColumnRenamed(
            "doc_id", "vec_id"
        )
        out = ann_bruteforce(emb, emb.filter("vec_id = 0"), k=3,
                             query_id_col="vec_id")
        assert len(out.collect()) == 3


class TestBm25Search:
    def test_ranking_and_term_hits(self, spark):
        from gdelt_extractor_spark.operators.textstats import bm25_search

        df = spark.createDataFrame(
            [
                (1, "spark join spark join spark"),   # both terms, high tf
                (2, "spark filter filter filter"),    # one term
                (3, "nothing relevant at all here"),  # no terms
                (4, "join join padding padding padding padding padding "
                    "padding padding padding padding padding"),  # long doc
            ],
            "doc_id long, text string",
        )
        out = bm25_search(df, "doc_id", "text", ["spark", "join"], top_k=10)
        rows = {r.doc_id: r for r in out.collect()}
        assert 3 not in rows                       # zero-hit docs absent
        assert rows[1].n_terms_hit == 2
        assert rows[2].n_terms_hit == 1
        assert rows[1].score > rows[2].score       # more matched terms
        assert rows[1].score > rows[4].score       # length normalization

    def test_top_k_and_determinism(self, spark):
        from gdelt_extractor_spark.operators.textstats import bm25_search

        df = spark.createDataFrame(
            [(i, "common term " + "pad " * (i % 5)) for i in range(30)],
            "doc_id long, text string",
        )
        a = bm25_search(df, "doc_id", "text", ["term"], top_k=7).collect()
        b = bm25_search(
            df.repartition(5), "doc_id", "text", ["term"], top_k=7
        ).collect()
        assert len(a) == 7 and a == b


class TestHybridSearch:
    def test_rrf_fusion_math_and_rank(self, spark):
        from gdelt_extractor_spark.operators.textstats import hybrid_search

        df = spark.createDataFrame(
            [
                (1, "spark join spark join window hash"),  # strong lexical
                (2, "spark filter window code path"),
                (3, "nothing relevant at all here"),
                (4, "hash window join spark hash window join"),
            ],
            "doc_id long, text string",
        )
        out = hybrid_search(
            df, "doc_id", "text", ["spark", "hash", "join", "window"],
            top_k=4, final_k=4,
        ).collect()
        rows = {r.doc_id: r for r in out}
        # rrf must equal the reciprocal-rank arithmetic exactly
        for r in out:
            want = 0.0
            if r.r_lex is not None:
                want += 1.0 / (60 + r.r_lex)
            if r.r_dense is not None:
                want += 1.0 / (60 + r.r_dense)
            assert r.rrf == round(want, 6)
        # ranks are 1..n in rrf order
        ordered = sorted(out, key=lambda r: r.rank)
        assert [r.rank for r in ordered] == list(range(1, len(out) + 1))
        assert all(
            ordered[i].rrf >= ordered[i + 1].rrf
            for i in range(len(ordered) - 1)
        )
        # a doc hit by both rankers outranks a lexical-zero doc
        assert rows[4].rank < rows[3].rank if 3 in rows else True

    def test_hybrid_query_embedding_driver_twin(self, spark):
        """r12: hybrid_search computes the query-side hashed
        embedding on the driver (pure hashlib/math) instead of
        running a 1-row frame through the distributed
        hashed_embedding pipeline.  This pins the two bit-identical:
        for several query strings (incl. repeated terms — sign sums —
        and mixed case/whitespace — the normalize contract), the
        driver arithmetic must reproduce hashed_embedding's md5
        long-layout values exactly, bucket for bucket."""
        import hashlib
        import math
        import re

        from gdelt_extractor_spark.operators.textstats import (
            hashed_embedding,
        )

        for qtext in [
            "spark hash join window",
            "spark spark spark hash",
            "  Mixed   CASE\tquery terms  ",
            "one",
        ]:
            qdf = spark.createDataFrame(
                [(0, qtext)], "qid long, qtext string"
            )
            want = {
                r.bucket: r.value
                for r in hashed_embedding(
                    qdf, "qid", "qtext", hash_fn="md5", layout="long"
                ).collect()
                if r.value != 0.0
            }
            norm = re.sub(r"\s+", " ", qtext.lower()).strip()
            cnt: dict[int, float] = {}
            for t in norm.split(" "):
                if t == "":
                    continue
                hx = hashlib.md5(f"hash-emb-v1:{t}".encode()).hexdigest()
                b = int(hx[:12], 16) % 64
                s = -1.0 if int(hx[12], 16) % 2 == 0 else 1.0
                cnt[b] = cnt.get(b, 0.0) + s
            nrm = math.sqrt(sum(c * c for c in cnt.values()))
            got = (
                {b: c / nrm for b, c in cnt.items() if c != 0.0}
                if nrm > 0
                else {}
            )
            assert got == want, qtext

    def test_partition_independent(self, spark):
        from gdelt_extractor_spark.operators.textstats import hybrid_search

        df = spark.createDataFrame(
            [(i, f"spark hash join window pad{i % 7} " * (1 + i % 3))
             for i in range(40)],
            "doc_id long, text string",
        )
        a = hybrid_search(df, "doc_id", "text", ["spark", "hash"]).collect()
        b = hybrid_search(
            df.repartition(6), "doc_id", "text", ["spark", "hash"]
        ).collect()
        assert a == b


def test_length_buckets_boundaries_and_overflow(spark):
    from gdelt_extractor_spark.operators.packing import length_buckets

    def doc(i, n):  # n whitespace tokens
        return (i, " ".join(["w"] * n))

    df = spark.createDataFrame(
        [doc(1, 3), doc(2, 4), doc(3, 5), doc(4, 9), doc(5, 100)],
        "doc_id long, text string",
    )
    out = {r.bucket: r for r in
           length_buckets(df, "doc_id", "text",
                          boundaries=(4, 8, 16)).collect()}
    assert set(out) == {4, 8, 16, -1}
    assert (out[4].n_docs, out[4].n_tokens, out[4].n_padded) == (2, 7, 8)
    assert out[4].waste_frac == 0.125
    assert (out[8].n_docs, out[8].n_tokens) == (1, 5)
    assert (out[16].n_docs, out[16].n_tokens) == (1, 9)
    # overflow pads to its own max length
    assert (out[-1].n_docs, out[-1].n_padded, out[-1].waste_frac) == (1, 100, 0.0)


def test_vocab_coverage_ranks_and_needed_prefix(spark):
    from gdelt_extractor_spark.operators.textstats import vocab_coverage

    # 10 a, 5 b, 3 c, 2 d → total 20; 90% coverage needs a+b+c (18/20)
    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"] * 3 + ["d"] * 2)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {r.rank: r for r in vocab_coverage(df, "text", 0.9).collect()}
    assert [rows[i].token for i in range(1, 5)] == ["a", "b", "c", "d"]
    assert rows[1].cum_share == 0.5
    assert [rows[i].needed for i in range(1, 5)] == [True, True, True, False]


def test_vocab_coverage_tie_break_deterministic(spark):
    from gdelt_extractor_spark.operators.textstats import vocab_coverage

    df = spark.createDataFrame([(1, "z y x z y x")], "doc_id long, text string")
    toks = [r.token for r in
            vocab_coverage(df.repartition(4), "text").orderBy("rank").collect()]
    assert toks == ["x", "y", "z"]  # equal freq → token asc


def test_schema_drift_statuses_and_metrics(spark):
    from gdelt_extractor_spark.operators.profiling import schema_drift

    old = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, None), (3, 30.0, "y"), (4, 40.0, "y")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, 1), (2, 99.0, 1), (3, 30.0, 0), (4, None, 0)],
        "k long, v double, flag int",
    )
    rows = {r.col_name: r for r in schema_drift(old, new).collect()}
    assert rows["k"].status == "common"
    assert rows["s"].status == "removed" and rows["flag"].status == "added"
    assert rows["s"].null_frac_old == 0.25 and rows["s"].null_frac_new is None
    assert rows["v"].null_frac_new == 0.25
    assert rows["v"].distinct_old == 4 and rows["v"].distinct_new == 3
    assert rows["v"].distinct_ratio == 0.75
    # mean over non-null: old (10+20+30+40)/4=25, new (10+99+30)/3
    assert abs(rows["v"].mean_shift - (139.0 / 3 - 25.0)) < 1e-6
    assert rows["flag"].mean_shift is None and rows["flag"].distinct_ratio is None


class TestBpeTokenizer:
    def test_classic_merge_sequence(self, spark):
        """Sennrich's low/lower/newest/widest example: the first
        merges must be (e,s), (es,t), (est,</w>) — the published
        progression for these frequencies."""
        from gdelt_extractor_spark.operators.tokenizer import bpe_train

        df = spark.createDataFrame(
            [(1, "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3)],
            "doc_id long, text string",
        )
        merges = bpe_train(df, "text", n_merges=4)
        assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]

    def test_encode_reconstructs_words(self, spark):
        """Dropping the </w> markers and joining subwords must
        reproduce every normalized word exactly (BPE is lossless)."""
        from gdelt_extractor_spark.functions.text import normalize_text
        from gdelt_extractor_spark.operators.tokenizer import (
            bpe_encode,
            bpe_train,
        )

        df = spark.createDataFrame(
            [(i, f"spark shuffles Partition{i} data") for i in range(6)],
            "doc_id long, text string",
        )
        merges = bpe_train(df, "text", n_merges=30)
        out = {r.doc_id: r.subwords for r in
               bpe_encode(df, "doc_id", "text", merges).collect()}
        norm = {r.doc_id: r.t for r in
                df.select("doc_id", normalize_text("text").alias("t")).collect()}
        for i, subs in out.items():
            rebuilt = "".join(subs).replace("</w>", " ").strip()
            assert rebuilt == norm[i]

    def test_train_partition_independent(self, spark):
        from gdelt_extractor_spark.operators.tokenizer import bpe_train

        df = spark.createDataFrame(
            [(i, "alpha beta gamma delta " * (i % 3 + 1)) for i in range(20)],
            "doc_id long, text string",
        )
        assert (bpe_train(df, "text", n_merges=15)
                == bpe_train(df.repartition(7), "text", n_merges=15))

    def test_pinned_merges_match_refit(self, spark):
        """The committed _bpe_pins literals (the bpe_subwords oracle's
        encode-replay inputs) must equal a fresh bpe_train refit at
        sf0.001 — the record-time certification replayed in CI, so
        testdata drift fails HERE, not as a silent oracle mismatch."""
        import duckdb

        from gdelt_extractor_spark.operators._bpe_pins import N_MERGES, PINS
        from gdelt_extractor_spark.operators.tokenizer import (
            DOC_FINGERPRINT_SQL,
            bpe_train,
        )
        from gdelt_extractor_spark.sources.tables import load_table

        sf_dir = "/root/testdata/sf0.001"
        con = duckdb.connect()
        fp = con.sql(
            f"SELECT {DOC_FINGERPRINT_SQL} "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
        con.close()
        assert fp in PINS, f"no pin for {fp} — run scripts/pin_bpe_merges.py"
        docs = load_table(spark, sf_dir, "documents")
        refit = [tuple(m) for m in bpe_train(docs, "text", n_merges=N_MERGES)]
        assert refit == [tuple(m) for m in PINS[fp]]


class TestUnigramTokenizer:
    def test_train_deterministic_and_partition_independent(self, spark):
        from gdelt_extractor_spark.operators.tokenizer import unigram_train

        df = spark.createDataFrame(
            [(i, "sharding shards reshard sharded " * (i % 3 + 1))
             for i in range(12)],
            "doc_id long, text string",
        )
        p1 = unigram_train(df, "text", vocab_size=20)
        assert p1 == unigram_train(df, "text", vocab_size=20)
        assert p1 == unigram_train(df.repartition(5), "text", vocab_size=20)
        # char floor: every training character is a piece
        pieces = {p for p, _ in p1}
        assert {"s", "h", "a", "r", "d"} <= pieces
        # learned at least one multi-char piece from the repeated stem
        assert any(len(p) > 1 for p in pieces)

    def test_viterbi_tie_prefers_fewer_pieces(self):
        from gdelt_extractor_spark.operators.tokenizer import (
            _UG_MULT,
            _ug_viterbi,
        )

        # score("ab") == score("a") + score("b"): the combined
        # objective (score·2^20 − count) must pick the 1-piece split
        scores = {"ab": -10, "a": -4, "b": -6}
        total = _ug_viterbi("ab", scores, 2)
        assert (-total) % _UG_MULT == 1
        assert (total + 1) // _UG_MULT == -10

    def test_encode_unknown_chars_fall_back_per_char(self, spark):
        from gdelt_extractor_spark.operators.tokenizer import (
            _UG_UNK_SCORE_U,
            unigram_encode,
        )

        df = spark.createDataFrame([(1, "zzq")], "doc_id long, text string")
        out = unigram_encode(df, "doc_id", "text", [("a", -1)]).collect()[0]
        assert out.n_pieces == 3  # three UNK single chars
        assert out.score_sum == 3 * _UG_UNK_SCORE_U

    def test_pinned_pieces_match_refit(self, spark):
        """Record-time certification replayed in CI (the bpe pin
        discipline): the committed _unigram_pins literals must equal
        a fresh unigram_train refit at sf0.001."""
        import duckdb

        from gdelt_extractor_spark.operators._unigram_pins import PINS
        from gdelt_extractor_spark.operators.tokenizer import (
            DOC_FINGERPRINT_SQL,
            unigram_train,
        )
        from gdelt_extractor_spark.sources.tables import load_table

        sf_dir = "/root/testdata/sf0.001"
        con = duckdb.connect()
        fp = con.sql(
            f"SELECT {DOC_FINGERPRINT_SQL} "
            f"FROM '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
        con.close()
        assert fp in PINS, f"no pin for {fp} — run scripts/pin_unigram_pieces.py"
        docs = load_table(spark, sf_dir, "documents")
        refit = [(p, int(s)) for p, s in unigram_train(docs, "text")]
        assert refit == [(p, int(s)) for p, s in PINS[fp]]


def test_strip_markup_semantics(spark):
    from gdelt_extractor_spark.functions.text import strip_markup

    rows = [
        (1, "<p>Hello <b>world</b></p>"),
        (2, "<script type='x'>var a = '<p>no</p>';</script>keep"),
        (3, "a &amp;lt; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;"),
        (4, "<style>.x{c:r}</style>text<!-- gone -->tail"),
        (5, "2 < 3 stays because no tag follows a bare <"),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {r.id: r.t for r in
           df.select("id", strip_markup("html").alias("t")).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "keep"          # script payload gone entirely
    # &amp;lt; ends as literal '&lt;' (amp unescaped LAST)
    assert got[3] == "a &lt; b <tag> \"q\" 's'"
    assert got[4] == "text tail"
    assert got[5] == "2 < 3 stays because no tag follows a bare <"


def test_pmi_collocations_hand_check(spark):
    from gdelt_extractor_spark.operators.textstats import pmi_collocations
    import math

    # "new york" always collocates; "the cat"/"the dog" split "the"
    docs = [(i, "new york " * 3 + ("the cat " if i % 2 else "the dog ")) for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.bigram: (r.n, r.pmi) for r in
           pmi_collocations(df, "text", k=10, min_count=2).collect()}
    # corpus: per doc tokens = [new york]*3 + [the, cat|dog] → n=8/doc
    # n_tokens=32, n_pairs=28; c(new york)=12, c(new)=c(york)=12
    exp = math.log((12 / 28) / ((12 / 32) * (12 / 32)))
    assert abs(out["new york"][1] - round(exp, 6)) < 1e-9
    assert out["new york"][0] == 12
    # "york new" occurs twice per doc (wrap inside doc) = 8 total
    assert "york new" in out
    # cross-boundary bigrams below min_count are gated out
    assert all(b.split()[0] != "cat" for b in out)


def test_dsir_importance_prefers_target_like_docs(spark):
    from gdelt_extractor_spark.operators.curation import dsir_importance

    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma delta " * 3, "src0"))       # target
    for i in range(20, 40):
        rows.append((i, "omega sigma tau rho " * 3, "srcX"))          # far
    for i in range(40, 44):
        rows.append((i, "alpha beta gamma delta " * 3, "srcY"))       # target-like
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r.dsir_logratio for r in dsir_importance(df).collect()}
    target_like = sum(out[i] for i in range(40, 44)) / 4
    far = sum(out[i] for i in range(20, 40)) / 20
    assert target_like > far
    # scores are per-token means: identical docs → identical scores
    assert len({out[i] for i in range(40, 44)}) == 1


def test_nb_classifier_separates_domains(spark):
    from gdelt_extractor_spark.operators.curation import nb_domain_classifier

    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta " * 3, "src0"))       # target
    for i in range(30, 60):
        rows.append((i, "omega sigma tau rho " * 3, "srcX"))          # other
    for i in range(60, 64):
        rows.append((i, "alpha beta gamma delta " * 3, "srcY"))       # target-like val
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in nb_domain_classifier(df, target="src0").collect()}
    assert len(out) == 64
    # target-vocabulary docs score positive, other-vocabulary negative —
    # including the srcY docs the label says are NOT target (the
    # classifier scores content, not labels)
    for i in range(30):
        assert out[i].nb_logodds > 0 and out[i].pred_target
    for i in range(30, 60):
        assert out[i].nb_logodds < 0 and not out[i].pred_target
    for i in range(60, 64):
        assert out[i].nb_logodds > 0 and out[i].is_target is False
    # split marker is the md5 convention: deterministic across calls
    out2 = {r.doc_id: r.split for r in
            nb_domain_classifier(df, target="src0").collect()}
    assert out2 == {i: out[i].split for i in out}
    assert {"train", "val"} == {r.split for r in out.values()}


def test_nb_classifier_scores_empty_docs_with_prior(spark):
    from gdelt_extractor_spark.operators.curation import nb_domain_classifier

    rows = [(0, "alpha beta", "src0"), (1, "omega tau", "srcX"),
            (2, "   ", "srcX"), (3, "", "src0")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in nb_domain_classifier(df, target="src0").collect()}
    assert len(out) == 4
    # split-on-space tokenization maps whitespace-only and empty text
    # to one empty-string token (both engines agree); no row vanishes
    # and the two docs land in the same bucket → identical scores
    assert out[2].n_tokens == 1 and out[3].n_tokens == 1
    assert out[2].nb_logodds == out[3].nb_logodds


def test_rouge_n_hand_computed(spark):
    from gdelt_extractor_spark.operators.textstats import rouge_n

    pairs = spark.createDataFrame(
        [
            # cand bigrams: {the cat, cat sat, sat down}; ref: {the cat,
            # cat sat, sat here} → 2 matches of 3/3
            (1, "the cat sat down", "the cat sat here"),
            # clipping: cand repeats "a b" 3×, ref has it once → 1 match
            (2, "a b a b a b", "a b c"),
            # no overlap
            (3, "x y z", "p q r"),
            # ref too short for bigrams → n_ref 0, NULL metrics
            (4, "u v w", "solo"),
        ],
        "pair_id long, cand string, ref string",
    )
    out = {r.pair_id: r for r in rouge_n(pairs, n=2).collect()}
    assert (out[1].n_match, out[1].n_cand, out[1].n_ref) == (2, 3, 3)
    assert out[1].rouge_p == round(2 / 3, 6) == out[1].rouge_r
    assert out[1].rouge_f == round(2 / 3, 6)
    # cand "a b a b a b": bigrams a-b ×3, b-a ×2 = 5; ref "a b c": a-b, b-c
    assert (out[2].n_match, out[2].n_cand, out[2].n_ref) == (1, 5, 2)
    assert out[2].rouge_p == 0.2 and out[2].rouge_r == 0.5
    assert (out[3].n_match, out[3].rouge_f) == (0, 0.0)
    assert out[4].n_ref == 0 and out[4].rouge_r is None and out[4].rouge_f is None


def test_rouge_n_identical_and_unigram(spark):
    from gdelt_extractor_spark.operators.textstats import rouge_n

    pairs = spark.createDataFrame(
        [(1, "alpha beta gamma", "alpha beta gamma")],
        "pair_id long, cand string, ref string",
    )
    r2 = rouge_n(pairs, n=2).first()
    assert r2.rouge_f == 1.0 and r2.n_match == 2
    r1 = rouge_n(pairs, n=1).first()
    assert r1.rouge_f == 1.0 and r1.n_match == 3


def test_kwic_contexts(spark):
    from gdelt_extractor_spark.operators.keywords import kwic

    df = spark.createDataFrame(
        [
            (1, "JOIN at start and a join in the middle then join"),
            (2, "no match here"),
            (3, "join"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        ((r.id, r.pos, r.left_ctx, r.right_ctx)
         for r in kwic(df, "join", window=2).collect())
    )
    # normalization lowercases, so JOIN at pos 0 matches with empty left
    assert out == [
        (1, 0, "", "at start"),
        (1, 5, "and a", "in the"),
        (1, 10, "middle then", ""),
        (3, 0, "", ""),
    ]


def test_kwic_window_bounds(spark):
    from gdelt_extractor_spark.operators.keywords import kwic

    df = spark.createDataFrame(
        [(1, "a b c join d e f")], "doc_id long, text string"
    )
    r = kwic(df, "join", window=10).first()
    assert (r.left_ctx, r.right_ctx) == ("a b c", "d e f")


def test_byte_stats_accounting(spark):
    df = spark.createDataFrame(
        [
            (1, "héllo wörld", "web", "de"),   # multibyte: 13 bytes, 11 chars
            (2, "plain ascii text", "web", "de"),
            (3, "one", "book", "en"),
            (4, None, "book", "en"),           # NULL text → 0/0/1('')
        ],
        "doc_id long, text string, source string, lang string",
    )
    out = {(r.source, r.lang): r for r in TS.byte_stats(df).collect()}
    web = out[("web", "de")]
    assert web.n_docs == 2
    assert web.total_bytes == 13 + 16 and web.total_chars == 11 + 16
    assert web.total_tokens == 2 + 3
    assert web.bytes_per_token == (13 + 16) / 5
    book = out[("book", "en")]
    # empty-string convention: split('') → [''] → 1 token (matches
    # the _toks oracle helper), so NULL text counts 1 empty token
    assert book.total_tokens == 2 and book.total_bytes == 3


def test_hapax_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a c", "s1"),
            (2, "a d", "s1"),
            (3, "x x x", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in TS.hapax_stats(df).collect()}
    s1 = out["s1"]
    # s1 tokens: a×3 b c d → 6 occurrences, 4 types, hapax {b,c,d}
    assert (s1.n_tokens, s1.n_types, s1.n_hapax) == (6, 4, 3)
    assert s1.hapax_frac == 3 / 4
    s2 = out["s2"]
    assert (s2.n_tokens, s2.n_types, s2.n_hapax) == (3, 1, 0)


def test_prefix_clusters_boilerplate(spark):
    from gdelt_extractor_spark.operators import curation as C

    df = spark.createDataFrame(
        [
            (1, "all rights reserved by the acme corp news page one", "a"),
            (2, "all rights reserved by the acme corp news different tail", "b"),
            (3, "all rights reserved by the acme corp news page one copy", "a"),
            (4, "totally unrelated document text here", "a"),
            (5, "short doc", "a"),
            (6, "short doc", "a"),  # shorter than k: full-text cluster
        ],
        "doc_id long, text string, source string",
    )
    out = {r.prefix: r for r in C.prefix_clusters(df, k=8, min_docs=2).collect()}
    boiler = out["all rights reserved by the acme corp news"]
    assert boiler.n_docs == 3 and boiler.n_sources == 2
    assert boiler.example_doc == 1
    assert out["short doc"].n_docs == 2 and out["short doc"].n_sources == 1
    assert len(out) == 2


def _lang_fixture(spark):
    import os

    from pyspark.sql import types as T

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "lang", "lang_docs.tsv"
    )
    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.read.option("sep", "\t").schema(sch).csv(path)


def test_lang_ngram_beats_heuristic(spark):
    """The committed upgrade claim: on the multilingual fixture (30%
    of Latin-script docs marker-free), the trained char-n-gram NB
    must beat the zero-shot stopword heuristic on held-out rows —
    the heuristic can only answer 'und' where function words are
    absent; the NB carries them on orthography."""
    from pyspark.sql import functions as F

    from gdelt_extractor_spark.operators.textstats import lang_id, lang_id_ngram

    docs = _lang_fixture(spark)
    nb = lang_id_ngram(docs).filter(F.col("split") == "val").cache()
    acc_nb = nb.agg(
        F.avg((F.col("lang_pred") == F.col("lang_true")).cast("double"))
    ).first()[0]
    heur = lang_id(docs, "doc_id", "text", keep_cols=("lang",)).join(
        nb.select("doc_id"), "doc_id"
    )
    acc_h = heur.agg(
        F.avg((F.col("lang_pred") == F.col("lang")).cast("double"))
    ).first()[0]
    assert nb.count() >= 80  # the val split is a real holdout
    assert acc_nb > acc_h + 0.10, (acc_nb, acc_h)
    assert acc_nb >= 0.95


def test_lang_ngram_partition_invariant(spark):
    """Decimal score sums + md5 buckets: predictions and rounded
    scores must not depend on the input partitioning."""
    from gdelt_extractor_spark.operators.textstats import lang_id_ngram

    docs = _lang_fixture(spark).limit(120)
    a = {
        (r.doc_id, r.lang_pred, r.nb_score)
        for r in lang_id_ngram(docs.repartition(1)).collect()
    }
    b = {
        (r.doc_id, r.lang_pred, r.nb_score)
        for r in lang_id_ngram(docs.repartition(17)).collect()
    }
    assert a == b


def test_lang_ngram_short_and_unseen_docs(spark):
    """Docs shorter than the n-gram width and single-char docs must
    still score (t clamps to 1) and produce a deterministic class."""
    from gdelt_extractor_spark.operators.textstats import lang_id_ngram

    base = _lang_fixture(spark)
    extra = base.sparkSession.createDataFrame(
        [(9001, "en", "a"), (9002, "de", "ß")],
        "doc_id long, lang string, text string",
    )
    out = lang_id_ngram(base.unionByName(extra))
    rows = {r.doc_id: r for r in out.collect()}
    assert 9001 in rows and 9002 in rows
    assert rows[9001].lang_pred is not None


def test_class_tfidf_discriminates(spark):
    """A term frequent in one class and absent elsewhere must outrank
    corpus-wide terms; top_k and deterministic tie-break hold."""
    from gdelt_extractor_spark.operators.textstats import class_tfidf

    rows = [
        (1, "a", "zebra zebra zebra common common"),
        (2, "a", "zebra common"),
        (3, "b", "yak yak common common"),
        (4, "b", "yak common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = class_tfidf(df, "source", "text", top_k=2).collect()
    top = {(r["class"], r.rank): r.term for r in out}
    assert top[("a", 1)] == "zebra" and top[("b", 1)] == "yak"
    assert all(r.rank <= 2 for r in out)
    # partition invariance
    out2 = class_tfidf(df.repartition(5), "source", "text", top_k=2).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}
