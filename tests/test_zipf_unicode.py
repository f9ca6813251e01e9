"""zipf_fit vs a numpy OLS reference; unicode_nfc composition."""

import math
import random

from pyspark.sql import functions as F

from gdelt_extractor_spark.functions.text import unicode_nfc
from gdelt_extractor_spark.operators.textstats import zipf_fit


def test_zipf_fit_matches_numpy_ols(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for d in range(40):
        # zipf-ish draw: word i with weight 1/(i+1)
        words = rng.choices(
            vocab, weights=[1.0 / (i + 1) for i in range(50)], k=60
        )
        docs.append((d, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = zipf_fit(df, "text").collect()[0]

    # python reference on the same corpus
    from collections import Counter

    freq = Counter(w for _, t in docs for w in t.split())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(f) for _, f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    assert row["n_types"] == len(ranked)
    assert row["n_tokens"] == sum(freq.values())
    assert abs(row["slope"] - slope) < 1e-4
    assert -2.0 < row["slope"] < -0.2  # zipf-shaped
    assert row["r"] < -0.8  # strongly negative correlation


def test_unicode_nfc_composes(spark):
    # explicitly DECOMPOSED inputs (base char + combining mark)
    df = spark.createDataFrame(
        [(1, "Cafe\u0301"), (2, "nai\u0308ve"), (3, "plain"), (4, None)],
        "id long, s string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            unicode_nfc("s").alias("n"),
            F.length("s").alias("l_raw"),
            F.length(unicode_nfc("s")).alias("l_nfc"),
        ).collect()
    }
    assert out[1]["n"] == "Caf\u00e9"
    assert out[1]["l_nfc"] == out[1]["l_raw"] - 1
    assert out[2]["n"] == "na\u00efve"
    assert out[3]["n"] == "plain"
    assert out[4]["n"] is None


def test_unicode_nfc_idempotent(spark):
    df = spark.createDataFrame(
        [(i, f"Cafe\u0301 {i}") for i in range(20)], "id long, s string"
    )
    once = df.select("id", unicode_nfc("s").alias("n"))
    twice = once.select("id", unicode_nfc("n").alias("n2"))
    j = once.join(twice, "id")
    assert j.filter(F.col("n") != F.col("n2")).count() == 0


def test_strip_invisible_and_count(spark):
    from pyspark.sql import functions as F
    from gdelt_extractor_spark.functions.text import (
        count_invisible, strip_invisible,
    )

    rows = [
        (1, "he​llo ﻿world"),   # ZWSP + BOM
        (2, "soft­hyphen"),
        (3, "clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        count_invisible("text").alias("n"),
        strip_invisible("text").alias("clean"),
    ).collect()}
    assert out[1].n == 2 and out[1].clean == "hello world"
    assert out[2].n == 1 and out[2].clean == "softhyphen"
    assert out[3].n == 0 and out[3].clean == "clean text"
    # scrub then hash: visually identical docs now collide
    a = df.filter("doc_id = 1").select(
        F.xxhash64(strip_invisible("text"))).first()[0]
    b = spark.createDataFrame([("hello world",)], "text string").select(
        F.xxhash64(strip_invisible("text"))).first()[0]
    assert a == b


def test_mixed_script_token_count(spark):
    from gdelt_extractor_spark.functions.text import mixed_script_token_count

    rows = [
        (1, "pаypаl login page"),    # Cyrillic а homoglyphs
        (2, "обычный русский текст"),           # pure Cyrillic: not mixed
        (3, "plain english"),
        (4, "ok слово mоneу"),        # one mixed token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r[1] for r in df.select(
        "doc_id", mixed_script_token_count("text")).collect()}
    assert out[1] == 1 and out[2] == 0 and out[3] == 0 and out[4] == 1


def test_dehyphenate_wraps(spark):
    from gdelt_extractor_spark.functions.text import dehyphenate_wraps

    rows = [(1, "exam-\nple of hyphen-\nated wrap\nand a line\n\nnew para")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = df.select(dehyphenate_wraps("text")).first()[0]
    assert got == "example of hyphenated wrap and a line\n\nnew para"
    # a literal hyphen before a space survives (not a wrap)
    keep = spark.createDataFrame([("well-known\nterm x -\ny",)], "text string")
    got2 = keep.select(dehyphenate_wraps("text")).first()[0]
    assert got2 == "well-known term x - y"


class TestFixMojibake:
    def _run(self, spark, vals):
        from gdelt_extractor_spark.functions.text import fix_mojibake

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, t string"
        )
        return {r.i: r.f for r in df.select("i", fix_mojibake("t").alias("f")).collect()}

    def test_repairs_classic_cases(self, spark):
        out = self._run(spark, ["cafÃ©", "donâ€™t",
                                "naÃ¯ ve rÃ©sumÃ©"])
        assert out[0] == "café"
        assert out[1] == "don’t"
        assert out[2] == "naï ve résumé"

    def test_clean_text_untouched(self, spark):
        vals = ["plain ascii", "café déjà vu", "中文 text",
                "À la carte", None, ""]
        out = self._run(spark, vals)
        for i, v in enumerate(vals):
            assert out[i] == v, (i, v, out[i])

    def test_idempotent(self, spark):
        from gdelt_extractor_spark.functions.text import fix_mojibake

        df = spark.createDataFrame(
            [(1, "cafÃ© donâ€™t")], "i long, t string"
        )
        once = df.select(fix_mojibake("t").alias("t"))
        twice = once.select(fix_mojibake("t").alias("t"))
        assert once.collect() == twice.collect()
