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
