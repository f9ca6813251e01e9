"""Join accelerators — the bloom-prefiltered semi join.

``fact JOIN dim`` where dim is too big to broadcast forces a full
shuffle of the fact side.  At 100 TB the dominant cost is shuffling
fact rows whose key is NOT in dim at all (for selective dims, almost
all of them).  The classic fix — what engines call a bloom/runtime
filter and Spark's own AQE applies only in limited cases — is:

1. Build a Bloom filter of the dim keys DISTRIBUTED: each row emits
   its k bit positions, a (word_index → bit_or) aggregate assembles
   the bitmap, and the driver collects AT MOST ``n_bits / 64`` longs
   (128 KiB at the 2^20-bit default — bounded by configuration, not
   by data).
2. Broadcast the bitmap (one array<long> row) and probe it on the
   fact side with pure JVM bit arithmetic — whole-stage codegen, no
   Python.
3. Rows that pass the bloom (all true matches + ~fp_rate of the
   rest) continue to the EXACT shuffle semi join, so the final
   result is exactly the semi join — the bloom only shrinks the
   shuffle input.

The result is plan-equivalent to ``fact.join(dim, on, "left_semi")``
(and oracle-checked as such); the win is shuffle volume: with a 1%
false-positive rate and a dim matching 1% of fact keys, the exchange
moves ~2% of the fact table instead of 100%.

Sizing: fp_rate ≈ (1 - e^(-k·n/m))^k.  The 2^20-bit default with
k=5 holds ~10^5 distinct keys at <1% fp; scale ``n_bits`` linearly
with distinct dim keys (2^27 bits = 16 MiB handles ~10^7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORDS = "__bloom_words"


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """The k bloom bit positions of ``key`` (seeded xxhash64)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    dim: DataFrame, key: str | Column, n_bits: int, n_hashes: int
) -> list[int]:
    """Distributed bloom-bitmap build: rows emit bit positions, a
    (word → bit_or) aggregate packs them, the driver collects ≤
    ``n_bits/64`` (word, bits) pairs and densifies.  Bounded by
    ``n_bits`` regardless of dim size."""
    n_words = (n_bits + 63) // 64
    key = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key, n_hashes, n_bits)))
    packed = (
        dim.select(pos.alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("p") % 64).cast("int"),
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for row in packed:
        words[row["w"]] = row["bits"]
    return words


def bloom_probe(
    key: Column, words_col: Column, n_hashes: int, n_bits: int
) -> Column:
    """True iff all k bits for ``key`` are set in the bitmap column
    (array<long>, 1-indexed element_at).  Codegen-only arithmetic."""
    tests = []
    for p in _positions(key, n_hashes, n_bits):
        word = F.element_at(words_col, (p / 64).cast("int") + 1)
        # SQL-level shiftright: the pyspark wrapper wants a Python int
        # for numBits, the SQL function accepts a column.
        bit = F.call_function(
            "shiftright", word, (p % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        tests.append(bit == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    verify: bool = True,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim ON fact[on] == dim[on]`` with a
    bloom prefilter ahead of the exchange.

    ``verify=True`` (default) keeps the exact semi join after the
    bloom — the result is EXACT, the bloom only cuts shuffle volume.
    ``verify=False`` returns the bloom superset (true matches plus
    ~fp_rate false positives) for pipelines that tolerate it (e.g.
    a pre-pass before a later exact stage).
    """
    words = bloom_build(dim, on, n_bits, n_hashes)
    spark = fact.sparkSession
    bloom_df = spark.createDataFrame(
        [(words,)], schema=f"{_WORDS} array<long>"
    )
    pre = (
        fact.join(F.broadcast(bloom_df))
        .filter(bloom_probe(F.col(on), F.col(_WORDS), n_hashes, n_bits))
        .drop(_WORDS)
    )
    if not verify:
        return pre
    return pre.join(dim.select(on).distinct(), on, "left_semi")
