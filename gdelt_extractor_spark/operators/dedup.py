"""Deduplication operators, exact → fuzzy, all shuffle-frugal.

Reference parity: ``df.drop_duplicates("SOURCEURL")`` keep-first
(reference/extractor/extractor.py:256) generalizes to
``dedup_keep_first``.  The rest are the LLM-training-data dedup
family (SURVEY.md §2c): exact content hash, n-gram Jaccard,
MinHash+LSH, SimHash, embedding cosine.

Scale posture (100 TB):
- ``dedup_keep_first`` / ``dedup_exact``: ONE shuffle keyed on the
  dedup key / content hash; hash keys are uniform by construction so
  no skew.  Aggregation is partial (map-side combine) before the
  shuffle.
- ``dedup_ngram_jaccard`` is the exact baseline: its shuffle key is
  the shingle, and the pair-join is restricted to docs sharing a
  shingle — never a cartesian product.  The hot-shingle DF cap is ON
  by default (uncapped is O(k²) per shingle shared by k docs — opt
  in via ``max_shingle_df=None`` only on bounded corpora); at 100 TB
  use ``dedup_minhash_lsh`` whose candidate set is bounded by LSH
  bands.
- ``dedup_minhash_lsh``: signatures computed per-row JVM-side (no
  shuffle), candidates from a (band_id, band_hash) equi-join, then
  exact-Jaccard verification only on candidates.
- ``dedup_embedding`` uses a blocking key (``label``) so the pair
  join is per-block, mirroring production blocked-dedup.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens


def dedup_keep_first(df: DataFrame, key: str, order: str) -> DataFrame:
    """Keep one row per ``key``, the first by ``order``.

    The reference relies on pandas file order; a distributed engine
    needs an explicit deterministic order column.
    """
    w = Window.partitionBy(key).orderBy(F.col(order).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_content_hash(df: DataFrame, text_col: str, out: str = "content_hash") -> DataFrame:
    """md5 of whitespace-normalized lowercase text (JVM-side)."""
    return df.withColumn(out, F.md5(normalize_text(text_col)))


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-dup: group by normalized-content hash, keep the
    lowest id; report group size so callers can audit collapses."""
    return (
        with_content_hash(df, text_col)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column (array<string>).

    ``toks`` must be a real column reference, not an inline
    ``split(...)`` expression: Catalyst does not common-subexpression-
    eliminate inside lambda bodies, so an inline expression would
    re-tokenize the document once per element access (~10× slowdown,
    measured).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(toks, (i + 1).cast("int"), n)),
    )
    return F.array_distinct(grams)


def shingles(text_col: str, n: int = 3) -> Column:
    """Back-compat convenience: shingles of a text column.  Prefer
    materializing tokens first (see shingles_from_tokens)."""
    return shingles_from_tokens(tokens(text_col), n)


def shingle_hashes_from_tokens(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """64-bit shingle hashes (array<bigint>): multi-arg xxhash64 over
    the n tokens directly.  This is the scale path for MinHash:
    equality of hashes stands in for equality of shingles (collision
    prob ~2^-64), and downstream set ops work on fixed-width longs
    instead of strings.

    Hashing the tokens as separate xxhash64 arguments skips the
    per-shingle slice-array + concat-string allocations of the
    ``xxhash64(concat_ws(' ', slice(...)))`` form — measured ~10-15%
    off the tokenize→shingle→distinct pipeline at sf0.1.  Tokens past
    the array end (docs shorter than ``n``) come back NULL from
    ``F.get`` and multi-arg xxhash64 skips NULL arguments — the same
    semantics as the old form, where ``slice`` truncated and
    ``concat_ws`` joined what was left.

    ``distinct=False`` skips the O(len²) array_distinct (measured 4×
    of the whole shingle pipeline) — safe whenever downstream is
    multiset-insensitive: min() for MinHash signatures,
    array_intersect/array_union (which dedupe internally) for
    Jaccard verification."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.get(toks, (i + k).cast("int")) for k in range(n)]),
    )
    return F.array_distinct(grams) if distinct else grams


def shingle_hash_rows(
    df: DataFrame, text_col: str, n: int, keep_cols: list[str]
) -> DataFrame:
    """Exploded (keep_cols..., shingle) rows — one row per shingle
    OCCURRENCE — via explode-the-positions-THEN-hash.

    Hash values are identical to ``shingle_hashes_from_tokens``
    (same multi-arg xxhash64 over the same token windows, same
    NULL-skip tail semantics), but the hashing runs AFTER the
    explode, where it is a plain projection inside whole-stage
    codegen.  Spark's higher-order ``transform`` lambdas are
    evaluated by the interpreted expression walker — measured 7× on
    the shingle build (1.06s vs 0.15s for 500 docs, one thread) —
    so the array form is only worth it when the consumer genuinely
    needs the per-doc ARRAY (MinHash signature min, verification
    array_intersect); every rows-shaped consumer belongs here."""
    toks = tokens(F.col(text_col))
    staged = df.select(
        *keep_cols, toks.alias("_toks"), F.size(toks).alias("_n")
    )
    fp = F.xxhash64(
        *[F.get(F.col("_toks"), (F.col("_i") + k).cast("int")) for k in range(n)]
    )
    return staged.select(
        *keep_cols,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("_n") - n, F.lit(0)))
        ).alias("_i"),
        "_toks",
    ).select(*keep_cols, fp.alias("shingle"))


def _shingle_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle-hash) — one row per DISTINCT shingle per doc.

    Shingles are xxhash64'd so the self-join shuffles fixed-width
    longs, not n-gram strings; the build is the codegen explode-form
    (see shingle_hash_rows).  Dedup happens at ROW level (explode,
    then ``distinct()``): the per-row ``array_distinct`` alternative
    was measured 5× slower than the raw build at sf0.1 (3.9s vs 0.7s
    for 5k docs) — one extra shuffle of the (uniformly keyed)
    shingle rows is far cheaper than the per-row O(len²) dedup, and
    at 100 TB that shuffle is partial-aggregated map-side first."""
    return shingle_hash_rows(
        df.select(F.col(id_col).alias("id"), text_col), text_col, n, ["id"]
    ).distinct()


def dedup_ngram_jaccard(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = 100,
) -> DataFrame:
    """Pairs (id_a < id_b) whose n-gram shingle-set Jaccard ≥ threshold.

    Exact (no approximation): the join key is the shared shingle, so
    only documents with ≥1 common shingle ever meet.

    ``max_shingle_df`` is the hot-shingle guard for scale: a shingle
    occurring in k documents contributes O(k²) rows to the self-join,
    and common phrases ("all rights reserved") make some k huge on a
    web corpus.  With the cap set, shingles whose document frequency
    exceeds it are excluded from CANDIDATE GENERATION only; surviving
    pairs are verified against their FULL shingle sets, so every
    reported jaccard value is still exact.  A true pair is missed
    only if ALL of its shared shingles are hot — at threshold ≥ 0.5 a
    near-dup pair shares most of its shingles, so any cap ≫ the
    near-dup cluster size preserves the result (property-tested in
    tests/test_properties.py).  The cap is the DEFAULT (a hot
    shingle on an uncapped web corpus makes the self-join quadratic
    — a scale-killer an API default must not hand out);
    ``max_shingle_df=None`` opts into the uncapped exact baseline
    for oracle/audit work on bounded corpora.
    """
    if max_shingle_df is None:
        rows = _shingle_rows(df, text_col, id_col, n).persist()
        sizes = rows.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
        a, b = rows.alias("a"), rows.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        # sizes is doc-count-sized: no broadcast hint (AQE promotes it
        # at runtime when small; forcing it would OOM at corpus scale)
        sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
        jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
        out = (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
            .localCheckpoint(eager=True)  # bounded result; lets the cache go
        )
        rows.unpersist()
        return out

    # capped path: hot shingles NEVER enter a self-join — their
    # O(k²) pair rows are never formed anywhere.  Candidates come
    # from the cold self-join; verification counts the PRUNED
    # candidate pairs' full distinct intersections against the
    # checkpointed (id, shingle) index (r12 — no corpus text
    # re-read).  A true pair is missed only if ALL its shared
    # shingles are hot.
    rows = shingle_hash_rows(
        df.select(F.col(id_col).alias("id"), text_col), text_col, n, ["id"]
    ).distinct()
    # ONE shingle-keyed pass classifies hot vs cold: a window count
    # over partitionBy(shingle) replaces the r2 groupBy(shingle) +
    # left_anti join (which re-exchanged the full row set a second
    # time), and leaves `cold` already partitioned by shingle — the
    # exact layout the self-join needs, so Spark reuses the exchange
    # for both join branches.
    w_sh = Window.partitionBy("shingle")
    # ONE corpus materialization for the whole query (r12, the
    # dedup_eval discipline): the distinct (id, shingle, nd) index is
    # checkpointed, and stats / cold / the VERIFY all read it — the
    # former shape checkpointed only the cold+stats rows and then
    # re-scanned the corpus text twice in _attach_pair_texts,
    # re-tokenizing every matched pair's text to rebuild shingle sets
    # the index already holds.  |A∪B| = sz_a + sz_b − |A∩B| over
    # distinct sets, so the (id, shingle) equi-join count gives the
    # identical jaccard.
    #
    # Memory bound (r12 ADVICE): the checkpoint holds the FULL
    # distinct (id, shingle, nd) index INCLUDING hot-shingle rows —
    # worst case O(Σ distinct shingles per doc), so a pathological
    # mega-hot shingle (present in every doc) keeps O(n_docs) rows
    # resident per such shingle.  Hot rows can't be filtered before
    # materialization (the VERIFY counts full distinct intersections,
    # hot shingles included — dropping them would change reported
    # jaccard values); localCheckpoint stores MEMORY_AND_DISK, so
    # overflow spills to executor-local disk instead of OOM, and the
    # blocks release with the query (bench release()/ContextCleaner).
    # Bounded-footprint behavior under an everywhere-hot shingle is
    # pinned by tests/test_dedup.py::test_hot_shingle_checkpoint_bound.
    flagged = rows.withColumn(
        "nd", F.count(F.lit(1)).over(w_sh)
    ).localCheckpoint(eager=True)
    # per-doc stats in ONE id-keyed pass: distinct-set size sz AND
    # hot-shingle count h (the prune bound needs both; r2 derived h
    # as sz - cold_sz from two separate groupBys)
    stats = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum((F.col("nd") > max_shingle_df).cast("int")).alias("h"),
    )
    # sizes ride ON the cold rows (one row-level join — AQE
    # broadcasts the doc-count-sized stats frame; at corpus scale it
    # degrades to a single SMJ of the ROW frame, still far cheaper
    # than re-shuffling the much larger PAIR frame) so the pair
    # groupBy below carries them as grouping keys for free — the r2
    # version paid four sort-merge re-exchanges of the 1.13M-pair
    # frame to attach the same four numbers afterwards.  Both
    # self-join branches re-derive cold from the flagged CHECKPOINT
    # (filter + stats join over in-memory blocks — the corpus-scale
    # lineage beneath the checkpoint runs once).
    cold = (
        flagged.filter(F.col("nd") <= max_shingle_df)
        .select("id", "shingle")
        .join(stats, "id")
    )
    a, b = cold.alias("a"), cold.alias("b")
    # pair dedup doubles as the COLD-INTERSECTION counter: the
    # groupBy((id_a,id_b)) shuffle is the exact same exchange a
    # ``.distinct()`` would pay, but the count comes back for free
    # and powers a lossless candidate prune (below)
    #
    # length filter (Arasu 2006 / prefix-filter family): J(A,B) ≤
    # min(|A|,|B|)/max(|A|,|B|), so a pair whose FULL distinct sizes
    # differ by more than the threshold ratio can never verify — the
    # predicate rides the self-join itself (sz is already on every
    # cold row), killing those pairs' rows BEFORE the pair-count
    # shuffle.  The 1e-6 slack keeps it lossless under the verify's
    # round(jac, 6) ≥ τ acceptance (a pair with true J ≥ τ - 5e-7 can
    # round up into the output; min/max ≥ J > τ - 1e-6 keeps it).
    _lf = F.least(F.col("a.sz"), F.col("b.sz")) >= F.lit(
        threshold - 1e-6
    ) * F.greatest(F.col("a.sz"), F.col("b.sz"))
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & _lf,
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    # lossless upper-bound prune before the index verify join.
    # With per-doc distinct sizes sz and hot-shingle counts h:
    #   n_common_full ≤ nc + min(h_a, h_b)          (hot overlap bound)
    #   jaccard = ncf / (sz_a + sz_b - ncf)  — increasing in ncf —
    #   so ub = (nc+min(h)) / (sz_a+sz_b-(nc+min(h))) ≥ true jaccard.
    # Random pairs share few cold shingles → ub ≪ τ → the verify join
    # collapses to ~the true near-dup set (measured at sf0.1 before
    # the length filter: 1,130,536 candidates → 256 verify pairs =
    # the exact output set).
    ubc = F.col("nc") + F.least(F.col("h_a"), F.col("h_b"))
    cand = cand.filter(
        ubc / (F.col("sz_a") + F.col("sz_b") - ubc) >= threshold
    )
    verified = (
        cand.select("id_a", "id_b", "sz_a", "sz_b")
        .join(flagged.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(
            flagged.select(F.col("id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("ncf"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("ncf") / (F.col("sz_a") + F.col("sz_b") - F.col("ncf")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint(eager=True)  # bounded result
    )
    return verified


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, n: int = 3
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures.

    Each of the ``num_hashes`` permutations is xxhash64(shingle_hash,
    seed); the signature element is the min over the doc's shingle
    multiset (min is duplicate-insensitive, so multiset == set).

    Built explode-first: shingle rows from the codegen explode form
    (``shingle_hash_rows``), then ONE partial-aggregated groupBy(id)
    with ``num_hashes`` codegen min-aggregates, re-assembled into the
    signature array.  The former per-row form (num_hashes ×
    ``transform``/``array_min`` per document) ran every permutation
    on Spark's interpreted expression walker — the explode form is
    the same hash math in whole-stage codegen, measured 2× at sf0.1
    (1.33s → 0.69s, byte-identical signatures).  The shuffle this
    buys is ~1 combined row per (doc, partition) of 32 longs —
    map-side mins collapse each document's shingles before the wire,
    so at 100 TB the exchange is output-sized, not corpus-sized.
    NULL/empty texts emit the one partial-window shingle both forms
    always produced (multi-arg xxhash64 NULL-skip), so every input
    row keeps a signature — a transient per-row tag rides through
    the aggregation so duplicate-id inputs do NOT merge into one
    chimera signature (the per-row contract of the old form), and is
    dropped from the output.
    """
    rows = shingle_hash_rows(
        df.select(
            F.col(id_col).alias("id"),
            F.monotonically_increasing_id().alias("_row"),
            text_col,
        ),
        text_col,
        n,
        ["id", "_row"],
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"_s{i}")
        for i in range(num_hashes)
    ]
    return (
        rows.groupBy("id", "_row")
        .agg(*aggs)
        .select(
            "id",
            F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def _md5_perm_consts(m: int, salt: str) -> list[tuple[int, int]]:
    """Per-slot universal-family permutation constants (a_i odd in
    [1, 2^14), b_i in [0, 2^48)) derived from md5(salt:perm:i) — the
    same derived-not-random discipline as ``source_similarity``
    (operators/similarity.py), so a DuckDB oracle regenerates them."""
    import hashlib

    out = []
    for i in range(m):
        d = hashlib.md5(f"{salt}:perm:{i}".encode()).hexdigest()
        out.append(((int(d[:4], 16) % (1 << 14)) | 1, int(d[4:16], 16)))
    return out


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.6,
    cache_shingles: bool = True,
    hash_fn: str = "xxhash64",
    salt: str = "mhlsh-v1",
) -> DataFrame:
    """MinHash+LSH near-dup: band signatures, bucket-join candidates,
    verify candidates with exact Jaccard, emit pairs ≥ threshold.

    With r = num_hashes/bands rows per band, P(candidate) =
    1-(1-s^r)^bands — the standard S-curve.  The only shuffles are
    the (band, hash) candidate join and the verification join, both
    equi-joins on uniform hash keys.

    The (id, shingle-hashes) frame feeds three plan branches
    (signatures + both sides of the verification join);
    ``cache_shingles`` persists it so tokenize+shingle runs once per
    row instead of three times — the standard signature-cache step of
    production MinHash pipelines (MEMORY_AND_DISK, so at 100 TB it
    spills rather than OOMs; pass False to trade CPU for memory).
    The cache is released before returning: the (small) verified-pair
    result is materialized via eager ``localCheckpoint`` — cutting
    its lineage from the cache — and the shingle frame unpersisted,
    so repeated calls in a long-lived session do not accumulate
    cached blocks (checkpoint blocks themselves are context-cleaned
    once the caller drops the result).

    ``hash_fn``: ``"xxhash64"`` (default — fastest, JVM-native) or
    ``"md5"``, the engine-portable variant (r9): ONE salted md5 per
    distinct shingle truncated to 48 bits, per-slot minima under the
    derived universal permutations of ``_md5_perm_consts``, band
    buckets as md5 of the comma-joined slot minima, and exact-Jaccard
    verification over the distinct 48-bit shingle-hash sets — every
    step DuckDB-replicable, so the registry entry is value-hash
    oracle-gated instead of rows-only.  The md5 variant uses shingle
    SET semantics and drops docs shorter than ``n`` tokens (no full
    window exists); the xxhash64 path keeps its historical
    multiset/partial-window contract.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    if hash_fn == "md5":
        return _dedup_minhash_lsh_md5(
            df, text_col, id_col, num_hashes, bands, n, threshold, salt
        )
    r = num_hashes // bands
    base = (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_toks"))
        .select(
            "id",
            # multiset-safe consumers only (min / intersect / union)
            shingle_hashes_from_tokens(F.col("_toks"), n, distinct=False).alias("shh"),
        )
    )
    if cache_shingles:
        base = base.persist()

    def perm(seed: int):
        return lambda h: F.xxhash64(h, F.lit(seed))

    sig = base.select(
        "id",
        "shh",
        F.array(
            *[F.array_min(F.transform("shh", perm(i))) for i in range(num_hashes)]
        ).alias("sig"),
    )
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)]).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    a = band_rows.alias("a")
    b_ = band_rows.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sh = base
    verified = (
        candidates.join(
            sh.select(F.col("id").alias("id_a"), F.col("shh").alias("sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("shh").alias("sh_b")), "id_b"
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if cache_shingles:
        # materialize the (bounded: pairs ≥ threshold) result eagerly
        # so the big shingle cache can be dropped deterministically
        verified = verified.localCheckpoint(eager=True)
        base.unpersist()
    return verified


def _dedup_minhash_lsh_md5(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    n: int,
    threshold: float,
    salt: str,
) -> DataFrame:
    """Engine-portable MinHash+LSH (see ``dedup_minhash_lsh``
    ``hash_fn="md5"``).  Same plan skeleton at scale: the corpus-sized
    work is one shingle scan + one partial-aggregated groupBy(id)
    with ``num_hashes`` codegen min-aggregates; the band join and the
    verification joins run on hash-uniform keys over frames bounded
    by the signature table and the candidate set respectively."""
    mod = 1 << 48
    consts = _md5_perm_consts(num_hashes, salt)

    # (id, 48-bit salted shingle hash) MULTISET rows — one md5 per
    # shingle occurrence (the shared _md5_shingle_rows idiom), NO
    # distinct: min-aggregates are duplicate-insensitive and the
    # set-semantics consumers below use countDistinct, so skipping
    # the distinct saves a full shuffle of the shingle frame
    # (measured 4.6s → ~2s cold at sf0.1).  The eager checkpoint
    # feeds signatures AND both verify sides (A/B'd vs persist():
    # one write barrier beats re-reading the cache through the
    # countDistinct expand, 2.7s vs 3.7s at sf0.1).  A collect_list
    # + numpy signature kernel (the simhash_md5 r12 move) was A/B'd
    # FLAT here (3.09s vs 3.00s, 9 reps) and rejected: the
    # min-aggregates partial-aggregate to 33 longs per doc map-side,
    # while collect_list ships every shingle occurrence into the
    # exchange — strictly more shuffle bytes at scale for no local
    # gain.
    sh0 = _md5_shingle_rows(df, text_col, id_col, n, salt).localCheckpoint(
        eager=True
    )
    # one shuffle: slot minima + the distinct-shingle count together
    sig = sh0.groupBy("id").agg(
        F.countDistinct("h0").alias("n_sh"),
        *[
            F.min((F.col("h0") * F.lit(a) + F.lit(b)) % F.lit(mod)).alias(f"_s{i}")
            for i, (a, b) in enumerate(consts)
        ]
    )
    band_rows = _expand_bands(
        sig.select(
            "id",
            F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"),
        ),
        num_hashes,
        bands,
        hash_fn="md5",
    )
    a, b_ = band_rows.alias("a"), band_rows.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    counts = sig.select("id", "n_sh")
    # intersection size per candidate pair: join each side's shingle
    # rows and count DISTINCT matches (multiset rows → set count) —
    # an equi-join on (id, h0), never wider than (pairs × per-doc
    # shingle occurrences)
    inter = (
        candidates.join(sh0.select(F.col("id").alias("id_a"), "h0"), "id_a")
        .join(
            sh0.select(F.col("id").alias("id_b"), "h0"),
            ["id_b", "h0"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("h0").alias("n_inter"))
    )
    verified = (
        inter.join(counts.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(counts.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def dedup_pair_eval(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Pair-level evaluation of an approximate dedup against an exact
    baseline — the number every production dedup run reports before
    anyone trusts a recall knob: ONE row (n_pred, n_true, n_hit,
    precision, recall, f1).  Both inputs are (id_a, id_b[, ...]) pair
    frames; extra columns are ignored and pairs are deduped.

    Plan: two distincts, ONE full-outer pair join carrying presence
    flags, ONE 1-row aggregate — each input pipeline is evaluated
    exactly once (three separate count jobs would re-run the heavy
    upstream dedups once per count)."""
    p = pred.select("id_a", "id_b").distinct().withColumn("_p", F.lit(1))
    t = truth.select("id_a", "id_b").distinct().withColumn("_t", F.lit(1))
    j = p.join(t, ["id_a", "id_b"], "full_outer")
    counts = j.agg(
        F.coalesce(F.sum("_p"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.sum("_t"), F.lit(0)).alias("n_true"),
        F.coalesce(F.sum(F.col("_p") * F.col("_t")), F.lit(0)).alias("n_hit"),
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("n_hit") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, F.col("n_hit") / F.col("n_true")
    ).otherwise(F.lit(0.0))
    return (
        counts.withColumn("precision", F.round(prec, 6))
        .withColumn("recall", F.round(rec, 6))
        .withColumn(
            "f1",
            F.round(
                F.when(
                    prec + rec > 0, 2 * prec * rec / (prec + rec)
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )


def _md5_shingle_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    salt: str,
    keep_len: bool = False,
    partial_tail: bool = False,
) -> DataFrame:
    """(id[, _n], h0) — one row per n-token shingle OCCURRENCE, hashed
    with the repo's engine-portable idiom: ONE salted md5 per shingle
    truncated to 48 bits.  The single definition every md5 dedup path
    shares (minhash signatures, incremental index, dedup_eval), so a
    change to the salt/truncation can never diverge the Spark paths
    from each other or the DuckDB oracle.

    ``partial_tail=True`` keeps docs shorter than ``n`` tokens with
    their one partial-window shingle (``dedup_ngram_jaccard``'s
    window semantics); the default drops them (the md5 MinHash
    contract — no full window exists)."""
    base = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_t")
    ).withColumn("_n", F.size("_t"))
    if partial_tail:
        hi = F.greatest((F.col("_n") - n).cast("int"), F.lit(0))
    else:
        base = base.filter(F.col("_n") >= n)
        hi = (F.col("_n") - n).cast("int")
    h0 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.concat_ws(
                        " ", F.slice("_t", (F.col("pos") + 1).cast("int"), n)
                    ),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    keep = ["id"] + (["_n"] if keep_len else [])
    return base.select(
        *keep, F.explode(F.sequence(F.lit(0), hi)).alias("pos"), "_t"
    ).select(*keep, h0.alias("h0"))


def dedup_eval(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    num_hashes: int = 32,
    bands: int = 8,
    max_shingle_df: int | None = 100,
    salt: str = "mhlsh-v1",
) -> DataFrame:
    """End-to-end dedup-quality audit: pair precision/recall/F1 of
    md5-portable MinHash+LSH against the exact-Jaccard baseline at
    the same ``threshold`` — over ONE shared tokenize→shingle→md5
    corpus pass (r9 verdict item 4: composing ``dedup_minhash_lsh``
    and ``dedup_ngram_jaccard`` independently tokenized and shingled
    the same corpus twice and re-tokenized candidate texts a third
    time in the verify join; the audit was the suite's most
    expensive isolated query at 10.5s).

    The shared frame is (id, n_tokens, 48-bit salted-md5 shingle
    hash) with the partial-window tail (docs shorter than ``n``
    keep their one partial shingle — ``dedup_ngram_jaccard``'s
    window semantics), checkpointed once:

    - PRED candidates come from the full-window subset (docs ≥ n
      tokens — the md5-MinHash contract) through the exact
      ``_dedup_minhash_lsh_md5`` plan: slot minima + band buckets →
      bucket-join pairs.
    - TRUTH candidates run ``dedup_ngram_jaccard``'s capped logic on
      the SAME rows: hot/cold window count, lossless upper-bound
      prune — set algebra is hash-agnostic, so the pair set and
      jaccard values are identical to the xxhash64 baseline (modulo
      48-bit collisions, which the DuckDB oracle shares bit-for-bit
      on the pred side and which are ~1e-4-improbable on the
      string-replay truth side at tested scales; the divergence is
      pinned with a REAL birthday-searched collision in
      tests/test_dedup.py::test_dedup_eval_48bit_collision_divergence).
    - ONE unified verify pass (r11, VERDICT r10 #3): pred candidates
      contain only full-window docs, whose shp rows ARE their rows
      rows, so both sides' exact Jaccard is the same count over the
      same distinct-h0 sets — the tagged union of both candidate
      frames is verified in a single (id, h0) equi-join pass and
      split by tag after scoring (was: two independent 2-join
      corpus-scale verifies).

    Degenerate-input note (documented divergence from the naive
    composition): a NULL text and an empty text both hash their one
    partial window to md5(salt + ":"), so the truth side pairs them —
    the xxhash64 baseline's multi-arg NULL-skip distinguishes the two.
    The DuckDB oracle coalesces NULL text to '' and agrees with THIS
    operator; the composition-equivalence unit test uses a
    non-NULL-text corpus.

    Returns ONE row (n_pred, n_true, n_hit, precision, recall, f1)
    — ``dedup_pair_eval`` of the two pair frames."""
    mod = 1 << 48
    consts = _md5_perm_consts(num_hashes, salt)

    sh_all = _md5_shingle_rows(
        df, text_col, id_col, n, salt, keep_len=True, partial_tail=True
    )
    # ONE corpus-scale materialization: the distinct SET frame (as
    # flagged, with the window count, in the capped path).  Every
    # consumer below is set-semantic (min aggregates are duplicate-
    # insensitive; both verifies count distinct matches; the truth
    # logic is defined on sets), so deduping once up front turns four
    # countDistinct/distinct passes into plain counts and feeds six
    # consumers from one checkpoint.
    rows = sh_all.select("id", "_n", "h0").distinct()
    if max_shingle_df is None:
        # only the uncapped path materializes rows itself; the capped
        # path's flagged (below) is the same frame + the window count
        # and is checkpointed, so every consumer reads flagged and a
        # separate rows barrier would pay a second back-to-back
        # corpus-frame write for nothing (r12: 9/9 pairwise faster
        # without it, 3.71s → 3.33s median).
        rows = rows.localCheckpoint(eager=True)

    # --- per-doc sufficient statistics in ONE corpus aggregate (r11,
    # VERDICT r10 #3): set size / hot-shingle count / token length /
    # the 32 permutation slot minima all come from a single
    # groupBy(id) over the (window-flagged) rows — formerly the pred
    # signature and the truth stats each shuffled the corpus by id
    # separately.  Checkpointed: one row per doc, consumed by the
    # band build, the truth prune and the unified verify's size
    # joins.  Short docs (_n < n) compute minima they never use (the
    # band build filters them) — 32 integer ops per row, cheaper than
    # a second aggregate pass.
    if max_shingle_df is not None:
        w_sh = Window.partitionBy("h0")
        # Memory bound (r12 ADVICE): full (id, _n, h0, nd) index incl.
        # hot rows — see the dedup_ngram_jaccard flagged comment for
        # the worst case and the MEMORY_AND_DISK spill rationale;
        # behavior pinned by test_hot_shingle_checkpoint_bound.
        flagged = rows.withColumn(
            "nd", F.count(F.lit(1)).over(w_sh)
        ).localCheckpoint(eager=True)
        hot_flag = (F.col("nd") > max_shingle_df).cast("int")
    else:
        flagged = rows.withColumn("nd", F.lit(0))
        hot_flag = F.lit(0)
    stats = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum(hot_flag).alias("h"),
        F.min("_n").alias("_n"),
        *[
            F.min((F.col("h0") * F.lit(a) + F.lit(b)) % F.lit(mod)).alias(f"_s{i}")
            for i, (a, b) in enumerate(consts)
        ],
    ).localCheckpoint(eager=True)

    # --- pred candidates: md5 MinHash+LSH, the _dedup_minhash_lsh_md5
    # plan from its signature onward (full windows only: docs >= n
    # tokens)
    band_rows = _expand_bands(
        stats.filter(F.col("_n") >= n).select(
            "id",
            F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"),
        ),
        num_hashes,
        bands,
        hash_fn="md5",
    )
    ba, bb_ = band_rows.alias("a"), band_rows.alias("b")
    candidates = (
        ba.join(
            bb_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .select("id_a", "id_b", F.lit(1).alias("_p"), F.lit(0).alias("_t"))
    )

    # --- truth candidates: dedup_ngram_jaccard's capped-candidate
    # logic on the same distinct rows; the self-join emits slim
    # (id_a, id_b) pairs and the per-doc sizes/hot-counts join back
    # from the stats checkpoint (doc-sized, AQE broadcasts it)
    if max_shingle_df is not None:
        cold = flagged.filter(F.col("nd") <= max_shingle_df).select("id", "h0")
    else:
        cold = rows.select("id", "h0")
    # NOT length-filtered (r12 negative, recorded): riding sz onto
    # these cold rows for the join-time min/max ratio prune costs a
    # NEW row-level join against stats (in dedup_ngram_jaccard the
    # ride is free — its cold rows join stats anyway), and the A/B
    # was flat-to-negative at sf0.1 (3/9, 5/9 pairwise over two
    # 9-rep sessions); the ub-prune below already implies the ratio
    # bound at pair level.
    ca, cb = cold.alias("a"), cold.alias("b")
    cand_t = (
        ca.join(
            cb,
            (F.col("a.h0") == F.col("b.h0")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("nc"))
        .join(
            stats.select(
                F.col("id").alias("id_a"),
                F.col("sz").alias("sz_a"),
                F.col("h").alias("h_a"),
            ),
            "id_a",
        )
        .join(
            stats.select(
                F.col("id").alias("id_b"),
                F.col("sz").alias("sz_b"),
                F.col("h").alias("h_b"),
            ),
            "id_b",
        )
    )
    ubc = F.col("nc") + F.least(F.col("h_a"), F.col("h_b"))
    cand_t = (
        cand_t.filter(ubc / (F.col("sz_a") + F.col("sz_b") - ubc) >= threshold)
        .select("id_a", "id_b", F.lit(0).alias("_p"), F.lit(1).alias("_t"))
    )

    # --- ONE unified verify pass (r11, VERDICT r10 #3: pred and
    # truth each ran their own 2-join corpus-scale verify).  Pred
    # candidates contain only full-window docs (sig is built from
    # shp), and a full-window doc's shp rows ARE its rows rows, so
    # both sides' exact Jaccard is the same count over the same
    # distinct-h0 sets — verify the tagged pair union once, split by
    # tag after scoring.  Pair frames are bounded (band buckets /
    # capped h0 blocks), so the union groupBy is a small shuffle.
    allc = (
        candidates.unionByName(cand_t)
        .groupBy("id_a", "id_b")
        .agg(F.max("_p").alias("_p"), F.max("_t").alias("_t"))
    )
    st = stats.select("id", "sz", "_n")
    scored = (
        allc.join(flagged.select(F.col("id").alias("id_a"), "h0"), "id_a")
        .join(flagged.select(F.col("id").alias("id_b"), "h0"), ["id_b", "h0"])
        .groupBy("id_a", "id_b", "_p", "_t")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .join(
            st.select(
                F.col("id").alias("id_a"), F.col("sz").alias("sz_a")
            ),
            "id_a",
        )
        .join(
            st.select(
                F.col("id").alias("id_b"), F.col("sz").alias("sz_b")
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .localCheckpoint(eager=True)  # consumed by both tag splits
    )
    pred = scored.filter(F.col("_p") == 1).select("id_a", "id_b")
    truth = scored.filter(F.col("_t") == 1).select("id_a", "id_b")
    return dedup_pair_eval(pred, truth)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    salt: str = "winnow-v1",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003, "Winnowing: local algorithms for document fingerprinting" —
    the MOSS algorithm): hash every k-token window, slide a w-hash
    window over the hash sequence, and SELECT each window's minimum —
    a ~2/(w+1)-density sample that still GUARANTEES any shared run of
    ≥ w+k-1 tokens yields at least one shared fingerprint.  The
    sampled complement of ``duplicate_spans`` (which keeps every
    window): fingerprint storage shrinks by ~w/2 while long-match
    detection stays sound — the standard plagiarism/near-copy index
    shape at corpus scale.

    Returns distinct (id, fp) rows.  The selected set per document is
    well-defined independent of the tie rule (we keep distinct VALUES
    of the per-window minima, not positions).  Hashing is the
    repo-portable salted-md5 48-bit ``h0`` (one md5 per k-gram), so a
    DuckDB oracle replays everything.  Docs shorter than k+w-1 tokens
    yield no fingerprint (no full hash window exists).

    Plan shape: tokenize → explode the window POSITIONS, then k-gram
    + md5 as a plain post-explode projection inside whole-stage
    codegen (the ``shingle_hash_rows`` discipline — higher-order
    ``transform`` lambdas run on the interpreted expression walker,
    measured 7× on the identical shingle-hash shape; r9 verdict item
    3) → ONE per-doc window (MIN over w preceding rows) → one
    distinct.  Fingerprint values are byte-identical to the pre-r10
    array form (same md5 over the same k-gram strings).  All shuffles
    key on (id) or (id, fp) — uniform, bounded, corpus-scan
    dominated."""
    base = (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_t"))
        .withColumn("_n", F.size("_t"))
        .filter(F.col("_n") >= k + w - 1)
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.concat_ws(" ", F.slice("_t", F.col("pos") + 1, k)),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    rows = base.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), (F.col("_n") - k).cast("int"))
        ).alias("pos"),
        "_t",
    ).select("id", "pos", h.alias("h"))
    wspec = (
        Window.partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    return (
        rows.withColumn("_minh", F.min("h").over(wspec))
        .filter(F.col("pos") >= w - 1)  # full hash windows only
        .select("id", F.col("_minh").alias("fp"))
        .distinct()
    )


def winnow_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 100,
    salt: str = "winnow-v1",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints
    (id_a < id_b, n_shared) — the corpus-level near-copy report over
    the sampled index of ``winnow_fingerprints``.  ``max_fp_df``
    drops fingerprints occurring in more than that many documents
    before the pair join (the dedup_ngram_jaccard hot-shingle guard:
    a boilerplate fingerprint shared by k docs costs O(k²) pair rows;
    the cap bounds the join without touching genuine pair evidence on
    bounded corpora — pass None to disable)."""
    # The fingerprint lineage (tokenize + rolling-min window + distinct)
    # feeds the hot-fp aggregate, the anti join, AND both sides of the
    # pair self-join — four static evaluations of the corpus-scale
    # subtree.  The sampled index is tiny next to the corpus, so
    # materializing it once is the cheaper side of the trade at any
    # scale (same discipline as triangle_count's canon/deg split).
    fps = winnow_fingerprints(
        df, text_col, id_col, k=k, w=w, salt=salt
    ).localCheckpoint(eager=True)
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.countDistinct("id").alias("_df"))
            .filter(F.col("_df") > max_fp_df)
            .select("fp")
        )
        fps = fps.join(hot, "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _simhash_fp_udf():
    """Pandas UDF: array<bigint> token hashes → 64-bit SimHash.

    Bit j of the fingerprint is the sign of sum over tokens of
    (+1 if token-hash bit j else -1).  Token hashing stays JVM-side
    (xxhash64); only the 64-way bit vote runs here, as one vectorized
    numpy kernel per Arrow batch — benchmarked ~3× faster than 64
    Catalyst ``aggregate`` folds over the same array.
    """
    import numpy as np

    @F.pandas_udf("long")
    def fp(th: pd.Series) -> pd.Series:
        out = np.zeros(len(th), dtype=np.int64)
        for i, arr in enumerate(th):
            a = np.asarray(arr, dtype=np.int64)
            if a.size == 0:
                continue
            bits = np.unpackbits(
                a.view(np.uint8).reshape(a.size, 8), axis=1, bitorder="little"
            )
            votes = bits.sum(axis=0, dtype=np.int64) * 2 - a.size
            out[i] = np.packbits(votes > 0, bitorder="little").view(np.int64)[0]
        return pd.Series(out)

    return fp


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash bigint): 64-bit SimHash over token xxhash64s."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_toks")
    ).select("id", F.transform("_toks", lambda t: F.xxhash64(t)).alias("th"))
    return toks.select("id", _simhash_fp_udf()("th").alias("simhash"))


_HEXCHARS = "0123456789abcdef"


def simhash_md5(
    df: DataFrame,
    text_col: str,
    id_col: str,
    salt: str = "simhash-v1",
    out: str = "hex",
) -> DataFrame:
    """(id, simhash 16-hex-char string): the engine-portable SimHash
    (r9).  Per token ONE salted md5; each of the digest's 16 leading
    hex digits contributes 4 fingerprint bits, votes are summed in 64
    codegen aggregates over the token rows (multiset semantics, like
    the xxhash64 path), bit i is set iff its vote is strictly
    positive, and the fingerprint is re-assembled as a hex STRING so
    every step — including the bit math — replays in DuckDB.  NULL
    text is coalesced to '' (one empty-string token), matching the
    oracle's ``coalesce(text, '')``."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("t"),
    )
    h = tok.select(
        "id", F.md5(F.concat(F.lit(salt + ":"), F.col("t"))).alias("h")
    )
    if out == "long":
        # r12 (guide §4.2): pack each token's 16 md5 hex digits into
        # ONE int64 with the same bit convention as the vote indices
        # (bit i = digit(i//4) >> (i%4) & 1 — nibble j lands at bits
        # 4j..4j+3), then run the 64-way bit vote in the SAME numpy
        # pandas-UDF kernel the xxhash64 path uses.  Votes are
        # integer sums (order-free, exact), so the fingerprint is
        # bit-identical to the former 64 codegen sum aggregates —
        # which were the measured cost center (~0.6s of the 0.8s
        # fingerprint phase at sf0.1; the md5 itself is ~0.2s) —
        # while md5 + nibble packing stay JVM-side codegen.
        packed = F.lit(0).cast("long")
        for j in range(16):
            packed = packed.bitwiseOR(
                F.shiftleft(
                    F.conv(F.substring("h", j + 1, 1), 16, 10).cast("long"),
                    4 * j,
                )
            )
        arr = (
            h.select("id", packed.alias("_th"))
            .groupBy("id")
            .agg(F.collect_list("_th").alias("th"))
        )
        return arr.select("id", _simhash_fp_udf()("th").alias("simhash"))
    digs = h.select(
        "id",
        *[
            F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int").alias(f"d{j}")
            for j in range(16)
        ],
    )
    votes = digs.groupBy("id").agg(
        *[
            F.sum(
                F.shiftright(F.col(f"d{i // 4}"), i % 4).bitwiseAND(F.lit(1)) * 2
                - 1
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )

    def digit(j: int) -> Column:
        d = F.lit(0)
        for b in range(4):
            d = d + F.when(F.col(f"v{4 * j + b}") > 0, F.lit(1 << b)).otherwise(
                F.lit(0)
            )
        return d

    return votes.select(
        "id",
        F.concat(
            *[F.lit(_HEXCHARS).substr(digit(j) + 1, F.lit(1)) for j in range(16)]
        ).alias("simhash"),
    )


def hamming_pairs_hex(
    fp: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """``hamming_pairs`` for hex-STRING fingerprints (16 chars = 64
    bits): pigeonhole candidates from an equi-join on (chunk index,
    chunk substring), hamming as the digit-wise xor popcount — all
    string/integer expressions, fully engine-portable.  The same
    localCheckpoint discipline as ``hamming_pairs``: the fingerprint
    frame is tiny next to the corpus scan that produced it.

    Chunk boundaries distribute the 16 hex chars WITHOUT overrun
    (ADVICE r9: the old ceil-width layout put chunk 4 of a 5-chunk
    split at char 17 — an empty substring for every row, collapsing
    that chunk's equi-join to all-pairs): ``divmod`` spreads the
    remainder across the leading chunks, so every chunk is non-empty
    and the pigeonhole bound holds for any ``max_hamming ≤ 15``.
    A ≤ max_hamming BIT difference touches at most max_hamming hex
    CHARS, so with ≥ max_hamming+1 char-chunks one chunk matches
    exactly."""
    n_chunks = max(n_chunks, max_hamming + 1)
    if n_chunks > 16:
        raise ValueError(
            "hamming_pairs_hex: pigeonhole on 16 hex chars supports "
            f"max_hamming <= 15 / n_chunks <= 16 (got n_chunks={n_chunks})"
        )
    base, rem = divmod(16, n_chunks)
    starts, pos = [], 0
    for c in range(n_chunks):
        wdt = base + (1 if c < rem else 0)
        starts.append((pos, wdt))
        pos += wdt

    fp = fp.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("fp")
    ).localCheckpoint(eager=True)
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.substring("fp", start + 1, wdt).alias("v"),
                    )
                    for c, (start, wdt) in enumerate(starts)
                ]
            )
        ).alias("ch"),
    ).select("id", "fp", "ch.c", "ch.v")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )

    def dig(col: str, j: int) -> Column:
        return F.conv(F.substring(col, j + 1, 1), 16, 10).cast("int")

    ham = F.lit(0)
    for j in range(16):
        ham = ham + F.bit_count(dig("fp_a", j).bitwiseXOR(dig("fp_b", j)))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def hamming_pairs(
    fp: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Pairs (id_a < id_b, hamming) of 64-bit fingerprints with
    hamming distance ≤ max_hamming.

    Candidate generation by pigeonhole: split the fingerprint into
    ``n_chunks`` equal bit chunks; hamming ≤ n_chunks-1 ⇒ at least
    one chunk matches exactly, so the join key is
    (chunk_idx, chunk_value) — an equi-join on uniform hash-derived
    keys, never a cross product.  Shared by SimHash text dedup and
    perceptual image-hash dedup.

    The fingerprint frame is materialized once (eager
    ``localCheckpoint``) before the self-join: without it, both join
    branches recompute the whole upstream plan — for SimHash that is
    scan → tokenize → Arrow-batched fingerprint UDF, and the
    optimizer additionally re-evaluates the UDF inside each branch's
    chunk projection (4 ArrowEvalPython nodes total, measured plan).
    The fp frame is 16 bytes/doc, so the checkpoint is trivially
    small next to 4× the corpus tokenize cost (measured 4.4s → cold
    run cut by ~2× at sf0.1); at 100 TB the same ratio holds — the
    fingerprint table of a billion docs is ~16 GB spread over the
    cluster, three orders below the corpus it summarizes.
    """
    # pigeonhole needs > max_hamming disjoint chunks; widen if the
    # caller's max_hamming outgrows the default 4.  Boundaries spread
    # the remainder across leading chunks (ADVICE r9 sibling of the
    # hex-form fix: the old ceil width made chunk 8 of a 9-chunk
    # split start at bit 64 — a constant-0 key, all-pairs join) so
    # every chunk is non-empty for any max_hamming <= 63.
    n_chunks = max(n_chunks, max_hamming + 1)
    if n_chunks > 64:
        raise ValueError(
            "hamming_pairs: pigeonhole on 64 bits supports "
            f"max_hamming <= 63 / n_chunks <= 64 (got n_chunks={n_chunks})"
        )
    base, rem = divmod(64, n_chunks)
    bounds, pos = [], 0
    for c in range(n_chunks):
        wdt = base + (1 if c < rem else 0)
        bounds.append((pos, wdt))
        pos += wdt

    fp = fp.select(F.col(id_col), F.col(hash_col)).localCheckpoint(eager=True)

    def chunk_val(lo: int, wdt: int) -> Column:
        if wdt >= 64:  # single-chunk degenerate case: key = whole fp
            return F.col(hash_col).alias("v")
        mask = (1 << wdt) - 1
        return (
            F.shiftright(hash_col, lo)
            .bitwiseAND(F.lit(mask).cast("long"))
            .alias("v")
        )

    chunks = fp.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("fp"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("c"), chunk_val(lo, wdt))
                    for c, (lo, wdt) in enumerate(bounds)
                ]
            )
        ).alias("ch"),
    ).select("id", "fp", "ch.c", "ch.v")
    a, b = chunks.alias("a"), chunks.alias("b")
    joined = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.c").alias("c"),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").bitwiseXOR(F.col("b.fp")).alias("xor"),
        )
    )

    # A pair matching in k chunks would surface k times; instead of a
    # distinct (full aggregate exchange over the pair set, with the
    # fingerprints riding along) keep only the row whose c is the
    # pair's FIRST matching chunk — "no earlier chunk has zero XOR"
    # is branch-free bit math on the already-computed XOR, so the
    # dedup costs zero shuffles (measured: removing the distinct cut
    # the cold pair-join stage materially at sf0.1).
    def chunk_xor_zero(c: int) -> Column:
        lo, wdt = bounds[c]
        if wdt >= 64:
            return F.col("xor") == 0
        mask = (1 << wdt) - 1
        return (
            F.shiftright("xor", lo).bitwiseAND(F.lit(mask).cast("long")) == 0
        )

    first_match = F.lit(True)
    for c in range(n_chunks - 1, 0, -1):
        earlier_all_nonzero = F.lit(True)
        for c2 in range(c):
            earlier_all_nonzero = earlier_all_nonzero & ~chunk_xor_zero(c2)
        first_match = F.when(F.col("c") == c, earlier_all_nonzero).otherwise(
            first_match
        )

    return (
        joined.filter(first_match)
        .withColumn("hamming", F.bit_count("xor"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ max_hamming
    (candidate generation via the pigeonhole chunk equi-join —
    see ``hamming_pairs``).  ``hash_fn="md5"`` switches to the
    engine-portable hex-string fingerprint (``simhash_md5`` +
    ``hamming_pairs_hex``) whose DuckDB twin replays every step —
    value-hash oracle-gated since r9."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    if hash_fn == "md5":
        # long-packed md5 fingerprints ride the SAME fast bigint
        # pigeonhole as the xxhash64 path (bit i ↔ hex digit i//4 of
        # the oracle's hex replay — identical pair set, measured ~4×
        # cheaper than string-chunk candidates under suite pressure)
        fp = simhash_md5(df, text_col, id_col, out="long")
        return hamming_pairs(fp, "id", "simhash", max_hamming)
    fp = simhash(df, text_col, id_col)
    return hamming_pairs(fp, "id", "simhash", max_hamming)


def keep_canonical(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    node_col: str = "node",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Apply a dedup clustering to the corpus: keep each cluster's
    canonical member (the ``cluster_id`` row itself — the component
    minimum under ``connected_components``) plus every document that
    belongs to no cluster.  The final step of the dedup pipeline:
    pairs → clusters → deduplicated corpus.

    Plan: one anti join against the non-canonical member list — a
    frame no larger than the duplicate count, so at web-corpus dup
    rates (10-40%) the join side is a fraction of the corpus and the
    kept rows stream through a single shuffle (or broadcast, when the
    dup list is small enough for AQE to promote)."""
    drop = clusters.filter(F.col(node_col) != F.col(cluster_col)).select(
        F.col(node_col).alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def _gemm_block_pairs(
    blocked: DataFrame, id_dt: str, threshold: float
) -> DataFrame:
    """Within-block exact cosine pairs via one numpy GEMM per block.

    ``blocked`` carries (``_id``, ``_v``, ``_blk``); returns every
    within-``_blk`` pair (id_a < id_b) whose cosine ≥ ``threshold``.
    Shared by ``dedup_semantic`` (block = IVF cluster) and
    ``dedup_embedding`` (block = caller's blocking key) — the r7
    measurement that motivated it: the per-pair ``zip_with``/
    ``aggregate`` dot product runs on Spark's interpreted expression
    walker, and moving the all-pairs math of a BOUNDED block into an
    Arrow-batched matrix multiply was 7-15× (12.3s → 1.6s on
    dedup_semantic at sf0.1).

    Numerics match the SQL/oracle formula exactly where it matters:
    cosine = dot / (norm_a · norm_b) computed in float64, then rounded
    HALF_UP to 6 decimals (``sign(x)·floor(|x|·1e6+0.5)/1e6`` — Spark
    ``F.round`` semantics, NOT numpy's half-even).  The GEMM and a
    left-to-right fold can differ in the last float bits, but the
    6-decimal round absorbs that except on adversarial midpoints.

    Robustness (ADVICE r7): NULL vectors are filtered out before the
    ``applyInPandas`` (they can't pair — the legacy ``zip_with`` path
    yielded NULL cosine and dropped them), and within a block vectors
    are grouped BY LENGTH so a ragged corpus can't turn the stacked
    matrix into a numpy object array: mixed-length pairs emit nothing,
    which again matches the legacy NULL-cosine drop.  Zero-norm
    vectors get cosine 0 and therefore never pair — callers must use
    ``threshold > 0`` (asserted) since the exact-SQL baseline's
    0/0 = NaN would compare GREATER than any threshold under Spark's
    NaN ordering.
    """
    import numpy as np

    if not threshold > 0:
        raise ValueError(
            "block-GEMM cosine dedup requires threshold > 0 "
            "(zero-norm vectors are defined to cosine 0, not NaN)"
        )

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype=pdf["_id"].dtype),
                "id_b": pd.Series(dtype=pdf["_id"].dtype),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        frames = []
        # group by vector length: ragged inputs never reach the GEMM
        for _, grp in pdf.groupby(pdf["_v"].map(len).to_numpy()):
            if len(grp) < 2:
                continue
            ids = grp["_id"].to_numpy()
            V = np.array(grp["_v"].tolist(), dtype=np.float64)
            nrm = np.sqrt((V * V).sum(axis=1))
            nrm[nrm == 0.0] = 1.0  # zero vectors never clear threshold > 0
            S = V @ V.T
            C = S / (nrm[:, None] * nrm[None, :])
            iu = np.triu_indices(len(ids), 1)
            raw = C[iu]
            # HALF_UP to 6 decimals — Spark F.round semantics, NOT
            # np.round's half-even (the r5 decimal-midpoint gotcha)
            cos = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
            keep = cos >= threshold
            a, b = ids[iu[0][keep]], ids[iu[1][keep]]
            swap = b < a  # works for numeric and string ids alike
            lo, hi = a.copy(), b.copy()
            lo[swap], hi[swap] = b[swap], a[swap]
            frames.append(pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[keep]}))
        return pd.concat(frames, ignore_index=True) if frames else empty

    return (
        blocked.filter(F.col("_v").isNotNull())
        .groupBy("_blk")
        .applyInPandas(_pairs, f"id_a {id_dt}, id_b {id_dt}, cosine double")
    )


def dedup_semantic(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    m: int = 16,
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): coarse-quantize the embedding space with the
    deterministic IVF quantizer, then EXACT cosine pairs within each
    cluster — the all-pairs O(N²) join becomes m × O((N/m)²) blocked
    work, and cluster granularity is the recall/cost knob.

    ``nprobe > 1`` assigns each vector to its ``nprobe`` nearest
    centroids so near-dups straddling a cluster boundary still meet
    (pairs sharing several probed clusters are deduped; the cosine is
    identical wherever the pair meets, so keep-any is exact).

    Scale shape: quantizer fit is one bounded-sample Spark job
    (``ivf_fit_centroids``); assignment is a vectorized Arrow batch
    per task; within-cluster pairs come from ONE
    ``applyInPandas`` over the cluster key — each task runs a numpy
    GEMM on its cluster's (n_c × d) matrix and emits only the
    surviving pairs, the paper's own within-cluster similarity shape.
    That replaces the former blocked self-join, whose per-pair
    ``zip_with``/``aggregate`` dot product ran on Spark's interpreted
    expression walker (measured at sf0.1, m=8/nprobe=2: 12.3s → 1.6s
    median, 7.7×; the eager checkpoint the self-join needed is gone
    too — the probed frame now has exactly one consumer).  At 100 TB,
    ``m`` grows with corpus size to hold the per-cluster matrix (and
    pair volume) constant — the assignment stays one pass either way.
    """
    from .similarity import _ivf_assign_udf, _ivf_probe_udf, ivf_fit_centroids

    cents = ivf_fit_centroids(emb, m=m, id_col=id_col, vec_col=vec_col)
    if nprobe <= 1:
        clustered = emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            _ivf_assign_udf(cents)(F.col(vec_col)).alias("_blk"),
        )
    else:
        clustered = emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.explode(_ivf_probe_udf(cents, nprobe)(F.col(vec_col))).alias(
                "_blk"
            ),
        )

    id_dt = emb.schema[id_col].dataType.simpleString()
    pairs = _gemm_block_pairs(clustered, id_dt, threshold)
    if nprobe > 1:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs


def _driver_union_find(sym_edges: DataFrame) -> DataFrame:
    """Finish a (contracted) component graph driver-side: one bounded
    Arrow collect (``toPandas`` on two long columns — columnar
    buffers, no per-row Row objects), classic union-find with path
    compression and min-root union, back out as a (node, label)
    mapping frame.  Deterministic: the merged root is always the min
    of the two roots, so the final root is the minimum node of the
    contracted subgraph regardless of edge order.

    Measured driver memory at the 100k-edge default cap (tracemalloc,
    symmetrized = 200k rows): 3.2 MB for the Arrow/pandas frame plus
    21.4 MB peak for the union-find dict — the dict, not the collect,
    is the driver cost, which is why the cap default is 100k and not
    the r4 1M (whose dict scales to ~10× that)."""
    pdf = sym_edges.toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
        ra, rb = find(int(u)), find(int(v))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = pd.DataFrame(
        sorted((n, find(n)) for n in parent), columns=["node", "label"]
    )
    return sym_edges.sparkSession.createDataFrame(out, "node long, label long")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_finish_edges: int = 100_000,
) -> DataFrame:
    """Collapse near-dup PAIRS into duplicate CLUSTERS: returns
    (node, cluster_id) where cluster_id is the minimum node id in the
    connected component.  This is the step between pair emission
    (ngram/minhash/simhash/embedding dedup) and actually dropping
    duplicates: transitivity means A~B and B~C must land in ONE
    cluster even though (A,C) was never emitted as a pair.

    Algorithm: STAR CONTRACTION with HASH PRIORITIES.  Each round
    maps every node to the xxhash64-minimum of its closed
    neighborhood, ``m(u) = argmin_{w ∈ N(u) ∪ {u}} (xxh(w), w)``,
    rewrites the edge set to the contracted graph
    ``{(m(u), m(v)) : (u,v) ∈ E, m(u) ≠ m(v)}``, and composes the
    node→super-node mapping.  The component's hash-minimum always
    maps to itself, so the mapping converges to one representative
    per component; a final normalization pass relabels every
    component to its MINIMUM NODE ID (the public contract — the
    oracle's recursive-closure min and ``keep_canonical``'s
    canonical member both rely on it).

    Priorities are hashed rather than raw ids because value-order
    contraction degrades to ~1 node removed per round on a
    monotone-id chain (ADVICE r4: path 1-2-...-n contracts to path
    1..n-1) — a real shape, since near-dup pairs between
    consecutively ingested documents have consecutive ids.  Under a
    fixed pseudo-random priority the expected fraction of nodes that
    are local minima is constant (~1/3 on a chain), so components
    shrink geometrically IN EXPECTATION over the hash draw for every
    input shape, restoring O(log component-size) rounds without
    giving up determinism (xxhash64 is a fixed function; ties broken
    by node id).  Chosen over plain min-label propagation, which is
    O(diameter) and was measured NOT converging in 20 rounds on a
    1.4k-pair low-threshold embedding graph (long A~B~C chains where
    only adjacent pairs clear the threshold) — star contraction
    finished the same graph in 8 rounds, and over label propagation
    + pointer jumping (16 rounds, 1.6× slower): contraction shrinks
    the DATA each round, not just the distance.

    Every round's edge set and mapping are ``localCheckpoint``ed —
    the loop is iterative, so unbounded lineage would re-execute all
    prior rounds at each action and overflow the planner at scale.
    Shuffle keys are node ids (uniform); the contracted graph
    concentrates onto component minima, which is exactly the mass
    AQE's skew handling rebalances at scale.  Termination is the
    edge set running empty — an exact check, not a heuristic — and
    ``max_iter`` (log2 of the largest plausible component) turns a
    pathological non-shrink into a loud error instead of a
    silently-partial clustering.

    ``driver_finish_edges``: once the (geometrically shrinking)
    contracted edge set fits this cap, the remaining rounds collapse
    into ONE bounded Arrow collect + driver union-find — the same
    bounded-driver-work pattern as the IVF quantizer fit.  Each saved
    distributed round is ~3 tiny-data Spark jobs of pure scheduling
    overhead; at 100 TB the first rounds still run distributed and
    only the contracted tail ever reaches the driver (3.2 MB of Arrow
    buffers + 21.4 MB of union-find dict at the 100k default — see
    ``_driver_union_find`` for the measurement).  Set 0 to force the
    fully distributed path.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # checkpoint the symmetrized edge list ONCE: its lineage contains
    # the (expensive) upstream pair-generation join, and the loop
    # touches it every round — without the cut, each round re-runs
    # the whole dedup pair join
    ecur = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    # per-round node→super-node steps; composed ONCE at the end.
    # Each step's lineage is one groupBy over that round's
    # checkpointed edge set, so deferring composition is safe and
    # saves a driver action per round (measured ~0.1s/round of pure
    # job-submission overhead in local mode).
    steps: list[DataFrame] = []
    converged = False
    for _ in range(max_iter):
        n_edges = ecur.count()
        if n_edges == 0:
            converged = True
            break
        if n_edges <= driver_finish_edges:
            steps.append(_driver_union_find(ecur))
            converged = True
            break
        # representative = closed-neighborhood minimum under the
        # (xxhash64, id) priority order; struct min is lexicographic,
        # so ties on the hash break by node id — fully deterministic
        pv = F.struct(F.xxhash64("v").alias("h"), F.col("v").alias("n"))
        pu = F.struct(F.xxhash64("u").alias("h"), F.col("u").alias("n"))
        m = (
            ecur.groupBy("u")
            .agg(F.min(pv).alias("mv"))
            .select("u", F.when(pu <= F.col("mv"), F.col("u")).otherwise(F.col("mv.n")).alias("m"))
        )
        contracted = (
            ecur.join(m, "u")
            .select(F.col("m").alias("nu"), "v")
            .join(m.select(F.col("u").alias("v"), F.col("m").alias("nv")), "v")
            .select(F.col("nu").alias("u"), F.col("nv").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        steps.append(m.select(F.col("u").alias("node"), F.col("m").alias("label")))
        ecur = contracted.localCheckpoint(eager=True)
        # emptiness is re-checked by the count at the top of the loop
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed ≈ log2 of the largest component)"
        )
    if not steps:  # no edges at all: every node is its own cluster
        return edges.sparkSession.createDataFrame(
            [], "node long, cluster_id long"
        )
    mapping = steps[0]
    for step in steps[1:]:
        # left join: nodes whose super-node already collapsed out of
        # the edge set keep their final label
        mapping = mapping.join(
            step.select(F.col("node").alias("ln"), F.col("label").alias("nl")),
            mapping["label"] == F.col("ln"),
            "left",
        ).select("node", F.coalesce("nl", "label").alias("label"))
    # Normalize representatives to the component's MINIMUM NODE ID:
    # contraction converged on hash-min representatives (and the
    # driver finish on contracted-subgraph minima), but the public
    # contract is min-of-component.  One groupBy + join over the
    # mapping — node-count sized, far smaller than the corpus, and
    # the canon side is duplicate-cluster sized (broadcastable).
    canon = mapping.groupBy("label").agg(F.min("node").alias("cluster_id"))
    return mapping.join(canon, "label").select("node", "cluster_id")


def dedup_embedding(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
    engine: str = "gemm",
) -> DataFrame:
    """Embedding near-dup: pairs within a blocking key whose cosine
    similarity ≥ threshold.

    Blocking (here on ``label``; in production a coarse cluster id)
    keeps the pair work per-block instead of all-pairs.  The default
    ``engine="gemm"`` routes each block through ONE Arrow batch and a
    numpy matrix multiply (``_gemm_block_pairs`` — shared with
    ``dedup_semantic``): the r7 A/B on dedup_semantic measured the
    per-pair ``zip_with``/``aggregate`` dot product (interpreted
    expression walker, NOT codegen — higher-order array lambdas never
    compile) at 12.3s vs 0.82s for the GEMM at sf0.1, and this
    operator was the last one still on the interpreted pattern (the
    suite's only >2× mover vs the r4 baseline).  Parallelism is the
    block-key cardinality — at production scale blocks come from a
    quantizer sized so blocks are many and bounded (see
    ``dedup_semantic``'s ``m``); the GEMM cost per task is
    O(block² · dim) on a bounded block.

    ``engine="sql"`` keeps the former blocked self-join whose dot
    product is a JVM ``aggregate`` over ``zip_with``, retained for
    A/B measurement and for engines where Python workers are
    unavailable.  Both engines produce identical pairs: cosine =
    dot/(norm_a·norm_b) rounded HALF_UP to 6 decimals (numpy
    ``sign·floor(|x|·1e6+0.5)`` ≡ Spark ``F.round``).  Divergences
    only on degenerate inputs, where the GEMM path is the saner one:
    zero-norm vectors are cosine 0 (never pair; the SQL path's
    0/0 = NaN compares greater than ANY threshold under Spark NaN
    ordering and would emit the pair), NULL/ragged vectors are
    dropped rather than task-crashing (ADVICE r7).
    """
    if engine not in ("gemm", "sql"):
        # a typo ('GEMM', 'sql ') must not silently select the other
        # engine — the two differ on degenerate inputs (see above)
        raise ValueError(
            f"dedup_embedding: unknown engine {engine!r} "
            "(expected 'gemm' or 'sql')"
        )
    if engine == "gemm":
        blocked = emb.select(
            F.col(id_col).alias("_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
            F.col(block_col).alias("_blk"),
        )
        id_dt = emb.schema[id_col].dataType.simpleString()
        return _gemm_block_pairs(blocked, id_dt, threshold)
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.zip_with("v", "v", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("cosine", F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def _span_window_rows(
    base: DataFrame,
    k: int,
    with_pos: bool = False,
    hashed: bool = False,
    with_text: bool = False,
) -> DataFrame:
    """(doc_id, [pos,] span[, span_text]) — one row per k-token
    window, built by exploding the window positions and projecting
    the span AFTER the explode (the shingle_hash_rows discipline:
    transform lambdas run on the interpreted expression walker,
    post-explode slice/concat projections stay in whole-stage
    codegen).  ``base`` carries (doc_id, _t); docs with fewer than
    ``k`` tokens emit no rows — identical to the former empty-array
    explode.

    ``hashed=True`` emits ``span`` as the multi-arg xxhash64 of the
    k window tokens (one 8-byte long instead of a ~k·avg-token-width
    string) — the scale key: downstream groupBy/join shuffles sort
    fixed-width longs, ~9× smaller sort keys on 12-token English
    spans, and no concat string is ever built.  Windows are always
    FULL here (the ``_n >= k`` filter), so the NULL-skip tail
    semantics of multi-arg xxhash64 never engage and distinct token
    windows map to distinct hash inputs (argument boundaries are
    seed-chained, so ("ab","c") and ("a","bc") differ).
    ``with_text`` additionally carries the concat string as
    ``span_text`` for callers that must REPORT the span (hash
    grouping with a min(span_text) carry — the string rides as an
    aggregation buffer, partial-aggregated map-side, never a sort
    key)."""
    staged = base.withColumn("_n", F.size("_t")).filter(F.col("_n") >= k)
    rows = staged.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (F.col("_n") - k).cast("int"))).alias("pos"),
        "_t",
    )
    span_str = F.concat_ws(" ", F.slice("_t", (F.col("pos") + 1).cast("int"), k))
    cols: list = ["doc_id"] + (["pos"] if with_pos else [])
    if hashed:
        span_h = F.xxhash64(
            *[F.get("_t", (F.col("pos") + j).cast("int")) for j in range(k)]
        )
        cols.append(span_h.alias("span"))
        if with_text:
            cols.append(span_str.alias("span_text"))
    else:
        cols.append(span_str.alias("span"))
    return rows.select(*cols)


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    min_count: int = 2,
    exact_strings: bool = False,
) -> DataFrame:
    """Exact repeated k-token span detection — the corpus-level
    exact-substring-dedup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), re-expressed for
    Spark: instead of a monolithic suffix array, every k-token
    window of the normalized text becomes a shingle row, and a
    corpus-wide aggregate finds windows that occur ``min_count``+
    times (within OR across documents — a doc repeating itself
    counts, as in the paper).

    Returns one row per duplicated span:
    (span, n_docs, n_total, first_doc) where n_total counts every
    occurrence, n_docs the distinct documents, and first_doc the
    lexicographically-first carrying document (deterministic).

    Only FULL k-token windows participate: documents shorter than
    ``k`` tokens contribute nothing (unlike the dedup shingle
    helpers, which truncate short docs into one partial shingle).

    Plan shape: tokenize+window in ONE codegen projection (no
    shuffle); explode; then TWO partial-aggregated shuffles — first
    on (span, doc) for per-doc counts, then on span for the corpus
    rollup — both keyed on content-derived uniform keys, never an
    all-pairs join.  A COUNT(DISTINCT) in a single agg would Expand
    every window row instead.

    The DEFAULT groups on ``xxhash64`` of the k window tokens and
    carries ``min(span_text)`` only as an aggregation buffer into
    the report — ~9× smaller shuffle sort keys at 100 TB, identical
    output absent a 2^-64 hash collision (the DuckDB oracle twin
    groups on the string and hash-matches this path).
    ``exact_strings=True`` groups on the raw span string — the
    collision-proof mode, at string-sort shuffle cost.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    if exact_strings:
        per_doc = (
            _span_window_rows(base, k)
            .groupBy("span", "doc_id")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        return (
            per_doc.groupBy("span")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_c").alias("n_total"),
                F.min("doc_id").alias("first_doc"),
            )
            .filter(F.col("n_total") >= min_count)
        )
    per_doc = (
        _span_window_rows(base, k, hashed=True, with_text=True)
        .groupBy("span", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"), F.min("span_text").alias("_s"))
    )
    return (
        per_doc.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_c").alias("n_total"),
            F.min("doc_id").alias("first_doc"),
            F.min("_s").alias("_span_text"),
        )
        .filter(F.col("n_total") >= min_count)
        .select(
            F.col("_span_text").alias("span"), "n_docs", "n_total", "first_doc"
        )
    )


def span_dup_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    min_count: int = 2,
    exact_strings: bool = False,
) -> DataFrame:
    """Score side of the Lee et al. exact-substring recipe: for each
    document, the fraction of its k-token windows that are duplicated
    corpus-wide (per ``duplicate_spans``).  Downstream curation drops
    or trims docs above a threshold — the distributed stand-in for
    the paper's cut-the-repeated-substring step, at document
    granularity.

    Returns (doc_id, n_windows, n_dup_windows, dup_frac); docs
    shorter than ``k`` tokens report 0 windows and 0.0 fraction.

    Plan shape (r12): the window projection feeds ONE per-(span,
    doc) partial-aggregated shuffle, eagerly materialized, and BOTH
    consumers — the corpus dup rollup and the per-doc score —
    aggregate from that frame, so the window projection is evaluated
    once (pre-r12 the per-doc score joined the RAW window stream
    against the dup list, re-evaluating the tokenize+hash
    projection; n_windows ≡ Σ _c and n_dup_windows ≡ Σ _c·is_dup
    make the per-(span, doc) counts a lossless proxy — guide §8's
    decide-with-small-rows rule).  The join on the span
    key is content-derived and uniform; the duplicate-span side is
    small at any realistic dup rate but NOT broadcast by hint — its
    size is data-dependent and unbounded, so the equi-join stays a
    shuffle join and AQE promotes it to broadcast at runtime when
    it fits.

    The span never needs to be REPORTED here, so the DEFAULT keys
    every shuffle/join on the xxhash64 window hash and no span
    string is ever built (identical scores absent a 2^-64
    collision); ``exact_strings=True`` keys on the raw string.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    win = _span_window_rows(base, k, hashed=not exact_strings)
    # the per-(span, doc) counts (3 longs/row, ≈ one row per distinct
    # window occurrence pair) feed the corpus dup rollup AND the
    # per-doc score.  The two static subtrees canonicalize
    # DIFFERENTLY — the outer left join infers isnotnull(doc_id)
    # onto the score branch only — so the runtime stage cache never
    # reuses the exchange and the window projection ran twice; one
    # eager materialization runs it once (r12, guide §5 — A/B
    # 1.31s → 1.11s at sf0.1, 6/7 pairwise).
    per_doc = (
        win.groupBy("span", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    dup = (
        per_doc.groupBy("span")
        .agg(F.sum("_c").alias("_tot"))
        .filter(F.col("_tot") >= min_count)
        .select("span", F.lit(1).alias("_is_dup"))
    )
    scored = (
        per_doc.join(dup, "span", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("_c").alias("n_windows"),
            F.sum(
                F.col("_c") * F.coalesce(F.col("_is_dup"), F.lit(0))
            ).alias("n_dup_windows"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.round(
                F.when(
                    F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(F.col("n_dup_windows") / F.col("n_windows")),
                6,
            ).alias("dup_frac"),
        )
    )


def dedup_containment(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 100,
) -> DataFrame:
    """Pairs (id_a < id_b) whose n-gram shingle CONTAINMENT
    |A∩B| / min(|A|,|B|) ≥ threshold — the asymmetric companion to
    ``dedup_ngram_jaccard``: a short document quoted whole inside a
    long one scores containment ≈ 1 while its Jaccard stays far
    below any dedup threshold (the Broder 1997 resemblance-vs-
    containment distinction).  The standard catch for quote-
    inclusion / page-wrapping duplication.

    Same join discipline and the same two modes as the Jaccard
    operator: the cap is the DEFAULT (same quadratic-hot-shingle
    rationale); ``max_shingle_df=None`` opts into the uncapped exact
    baseline (candidates from every shared shingle — measured 14 s
    at sf0.1, the all-shared-pairs aggregate the prune exists to
    avoid).  With the cap, hot shingles never enter the self-join and candidates
    are pruned by the lossless upper bound
    ub = (nc + min(h_a, h_b)) / min(sz_a, sz_b) ≥ true containment
    (containment is increasing in the full intersection) before the
    index verify — identical reported values, 4.3× faster at
    sf0.1 (14.1 s → 3.3 s; the min-size denominator makes the bound
    less selective than Jaccard's, so more candidates survive to
    verify than in the jaccard twin).  A true pair is missed only if
    ALL its shared shingles are hot.
    """
    if max_shingle_df is not None:
        rows = shingle_hash_rows(
            df.select(F.col(id_col).alias("id"), text_col), text_col, n, ["id"]
        ).distinct()
        w_sh = Window.partitionBy("shingle")
        # ONE corpus materialization for the whole query (r12, the
        # dedup_eval discipline): the distinct (id, shingle, nd)
        # index is checkpointed, and stats / cold / the VERIFY all
        # read it — the former shape checkpointed only the cold+stats
        # rows and then re-scanned the corpus text twice in
        # _attach_pair_texts, re-tokenizing every matched pair's text
        # to rebuild shingle sets the index already holds.
        # array_intersect over raw arrays counts DISTINCT common
        # shingles, exactly what the (id, shingle) equi-join counts —
        # identical containment values.
        # Memory bound (r12 ADVICE): full (id, shingle, nd) index
        # incl. hot rows — see the dedup_ngram_jaccard flagged
        # comment for the worst case and the MEMORY_AND_DISK spill
        # rationale; pinned by test_hot_shingle_checkpoint_bound.
        flagged = rows.withColumn(
            "nd", F.count(F.lit(1)).over(w_sh)
        ).localCheckpoint(eager=True)
        stats = flagged.groupBy("id").agg(
            F.count(F.lit(1)).alias("sz"),
            F.sum((F.col("nd") > max_shingle_df).cast("int")).alias("h"),
        )
        cold = (
            flagged.filter(F.col("nd") <= max_shingle_df)
            .select("id", "shingle")
            .join(stats, "id")
        )
        a, b = cold.alias("a"), cold.alias("b")
        cand = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.sz").alias("sz_a"),
                F.col("b.sz").alias("sz_b"),
                F.col("a.h").alias("h_a"),
                F.col("b.h").alias("h_b"),
            )
            .agg(F.count(F.lit(1)).alias("nc"))
        )
        ubc = F.col("nc") + F.least(F.col("h_a"), F.col("h_b"))
        cand = cand.filter(
            ubc / F.least(F.col("sz_a"), F.col("sz_b")) >= threshold
        ).select("id_a", "id_b", "sz_a", "sz_b")
        verified = (
            cand.join(
                flagged.select(F.col("id").alias("id_a"), "shingle"), "id_a"
            )
            .join(
                flagged.select(F.col("id").alias("id_b"), "shingle"),
                ["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("ncf"))
            .withColumn(
                "containment",
                F.round(
                    F.col("ncf") / F.least(F.col("sz_a"), F.col("sz_b")), 6
                ),
            )
            .filter(F.col("containment") >= threshold)
            .select("id_a", "id_b", "containment")
            .localCheckpoint(eager=True)
        )
        return verified

    rows = _shingle_rows(df, text_col, id_col, n).persist()
    sizes = rows.groupBy("id").agg(F.count(F.lit(1)).alias("set_size"))
    a, b = rows.alias("a"), rows.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("set_size").alias("size_b"))
    cont = F.col("n_common") / F.least(F.col("size_a"), F.col("size_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", F.round(cont, 6))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
        .localCheckpoint(eager=True)
    )
    rows.unpersist()
    return out


def cut_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    min_count: int = 2,
    exact_strings: bool = False,
) -> DataFrame:
    """The APPLY step of the Lee et al. exact-substring recipe: cut
    every corpus-duplicated k-token span out of the documents
    (where ``span_dup_fraction`` only scores).  A token is removed
    iff at least one duplicated window covers it, so overlapping
    duplicated spans merge naturally; the text is rebuilt from the
    surviving NORMALIZED tokens in order (the token-level analog of
    the paper's byte-level substring cut).

    Returns (doc_id, clean_text, n_tokens, n_tokens_removed) for the
    WHOLE corpus — untouched documents pass through with 0 removed.

    Plan shape: windows with positions in one codegen projection
    (evaluated per consumer — storing the exploded frame would cost
    more than its scan-speed recompute, see span_dup_fraction); the
    corpus dup set via two partial-agg shuffles; duplicated window
    positions collected per doc (bounded by windows-per-doc); the
    final rebuild is a per-row nested higher-order filter
    (token j survives iff no dup position p has p ≤ j ≤ p+k−1),
    O(tokens × dup-windows) per row, no UDF.

    Like ``span_dup_fraction``, no span is ever reported, so the
    DEFAULT keys all shuffles/joins on the xxhash64 window hash and
    builds no span strings; ``exact_strings=True`` keys on the raw
    string.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    n = F.size("_t")
    win = _span_window_rows(base, k, with_pos=True, hashed=not exact_strings)
    dup = (
        win.groupBy("span", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("span")
        .agg(F.sum("_c").alias("_tot"))
        .filter(F.col("_tot") >= min_count)
        .select("span")
    )
    dup_pos = (
        win.join(dup, "span")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("_dp"))
    )
    dp = F.coalesce(F.col("_dp"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("_t"),
        lambda x, j: ~F.exists(dp, lambda p: (p <= j) & (j <= p + F.lit(k - 1))),
    )
    n_safe = F.coalesce(n, F.lit(0))
    return (
        base.join(dup_pos, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.array_join(kept, " "), F.lit("")).alias("clean_text"),
            F.greatest(n_safe, F.lit(0)).cast("long").alias("n_tokens"),
            (F.greatest(n_safe, F.lit(0)) - F.coalesce(F.size(kept), F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )


def dedup_incremental(
    new_docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Incremental exact dedup: the production shape where a NEW
    batch (today's crawl) dedups against itself AND against the
    fingerprint index of everything already ingested — a batch is
    never allowed to re-scan the historical corpus, only its hash
    index.

    ``seen`` is the historical index: one ``hash_col`` column
    (build it with ``with_content_hash(...).select(hash_col)``; keep
    it as a bucketed table on the hash so tomorrow's anti join needs
    no shuffle on the index side).  Returns the surviving new rows —
    batch-internal duplicates collapse keep-lowest-id first, then
    anything already seen is anti-joined away.  Union the survivors'
    hashes into ``seen`` afterwards with ``updated_index``.

    Plan: ONE shuffle of the (small) new batch on its content hash
    for the keep-first window, then an anti join on the hash.  At
    100 TB-of-history scale the index side dominates: against a
    bucketed index the anti join shuffles only the day's batch;
    unbucketed, both sides exchange once on the uniform hash key.
    The historical TEXT is never read either way.
    """
    hashed = with_content_hash(new_docs, text_col, out=hash_col)
    w = Window.partitionBy(hash_col).orderBy(F.col(id_col).asc())
    batch_first = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return batch_first.join(
        seen.select(hash_col).distinct(), hash_col, "left_anti"
    )


def updated_index(
    seen: DataFrame, survivors: DataFrame, hash_col: str = "content_hash"
) -> DataFrame:
    """The new historical index after a ``dedup_incremental`` batch:
    old index ∪ surviving hashes.  Survivors are already unique and
    disjoint from ``seen`` by construction, so this is a UNION ALL —
    no distinct shuffle; write it back bucketed on the hash."""
    return seen.select(hash_col).unionByName(survivors.select(hash_col))


def _md5_slot_minima(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    n: int,
    salt: str,
) -> DataFrame:
    """(id, sig array<long>) — engine-portable md5 MinHash
    signatures: the per-slot minima of ``_dedup_minhash_lsh_md5``
    (one salted md5 per shingle occurrence truncated to 48 bits,
    universal-family permutations from ``_md5_perm_consts``)
    assembled into a signature array.  Docs shorter than ``n``
    tokens drop (no full window — the md5-path contract)."""
    mod = 1 << 48
    consts = _md5_perm_consts(num_hashes, salt)
    sh0 = _md5_shingle_rows(df, text_col, id_col, n, salt)
    return (
        sh0.groupBy("id")
        .agg(
            *[
                F.min((F.col("h0") * F.lit(a) + F.lit(b)) % F.lit(mod)).alias(
                    f"_s{i}"
                )
                for i, (a, b) in enumerate(consts)
            ]
        )
        .select(
            "id",
            F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def _expand_bands(
    sig_df: DataFrame, num_hashes: int, bands: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, sig) → (id, sig, band, bucket) LSH band rows — the same
    band/bucket derivation as ``dedup_minhash_lsh`` (bucket =
    xxhash64 over the band's r signature elements; ``hash_fn="md5"``
    = md5 of the comma-joined slot values, the engine-portable form
    DuckDB replays), factored so the batch side and the persistent
    index compute buckets identically."""
    r = num_hashes // bands

    def bucket(b: int) -> Column:
        if hash_fn == "md5":
            return F.md5(
                F.concat_ws(
                    ",",
                    *[F.col("sig")[b * r + j].cast("string") for j in range(r)],
                )
            )
        return F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)])

    return sig_df.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    hash_fn: str = "xxhash64",
    salt: str = "mhlsh-v1",
) -> DataFrame:
    """Persistent LSH index rows for a corpus: (id, sig, band,
    bucket) — what ``dedup_incremental_minhash`` joins tomorrow's
    batch against.  Write it bucketed on (band, bucket)
    (``sinks.files.write_bucketed``) so the daily candidate join
    shuffles only the day's batch; the signature column rides along
    so candidate verification needs no second index.

    ``hash_fn="md5"`` builds the engine-portable index (r10):
    48-bit salted-md5 shingle hashes, ``_md5_perm_consts``
    permutations, md5 band buckets — every value a DuckDB oracle
    regenerates.  The xxhash64 default stays the production fast
    path: the r12 standing A/B (bench.py AB_PAIRS — alternating
    same-session reps, the only protocol that survives this host's
    2-3× cross-session variance) measures the full incremental query
    ~10% faster end-to-end (4.49s vs 4.98s medians, anchor faster in
    every post-JIT aligned rep); the gap is modest because join +
    scheduler fixed costs dominate the query, but at 100 TB the
    fingerprint scan is the corpus-sized term and xxhash64 avoids
    both the md5 digest and the string→bigint conv per shingle."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    sig = (
        _md5_slot_minima(df, text_col, id_col, num_hashes, n, salt)
        if hash_fn == "md5"
        else minhash_signatures(df, text_col, id_col, num_hashes, n)
    )
    return _expand_bands(sig, num_hashes, bands, hash_fn)


def _est_jaccard(a, b, num_hashes: int):
    """MinHash Jaccard estimate: fraction of equal signature slots.

    Deliberately the ``zip_with``/``aggregate`` fold even though it
    runs interpreted: it only ever evaluates on band-join CANDIDATES
    (a bounded set), and the unrolled 32-term codegen sum was A/B'd
    SLOWER at sf0.1 (dedup_incremental_minhash 3.7s → 5.0s — the
    32-comparison expression tree inflates codegen compilation in
    every stage that carries the filter, which costs more than the
    interpreter on a small candidate set).  The interpreted-walker
    rewrites pay off on per-CORPUS-row expressions (shingles,
    signatures), not per-candidate ones."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda s, x: s + x,
    ) / F.lit(float(num_hashes))


def dedup_incremental_minhash(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.6,
    hash_fn: str = "xxhash64",
    salt: str = "mhlsh-v1",
) -> DataFrame:
    """Incremental NEAR-dup dedup — ``dedup_incremental``'s exact
    anti join generalized to MinHash: today's batch dedups against
    itself and against the historical LSH band index WITHOUT ever
    re-reading historical text.  The index stores signatures, so
    candidates verify by the MinHash Jaccard estimate (fraction of
    equal slots) — the standard production trade: no second pass
    over history, estimator error bounded by 1/√num_hashes.

    Semantics are greedy keep-first (a batch doc matching ANY
    lower-id batch doc, or ANY indexed doc, is dropped — matching a
    doc that is itself dropped still drops you: conservative, never
    re-admits a near-dup).  Returns the surviving new rows; extend
    the index afterwards with ``updated_band_index``.

    ``hash_fn="md5"`` (r10) is the engine-portable twin: signatures
    from ``_md5_slot_minima``, md5 band buckets — with an md5 index,
    the whole batch (drop decisions included) is DuckDB-replayable,
    so the registry entry graduates from rows-only to a value-hash
    gate.  The estimate is a fraction k/num_hashes (exact in binary
    for power-of-two num_hashes), so the ≥ threshold comparison is
    engine-exact.  The xxhash64 default stays the production path.

    Plan: batch band rows materialize once (eager localCheckpoint —
    they feed both sides of the self-join and the index join); the
    self-join and the index join are (band, bucket) equi-joins; with
    the index stored bucketed on (band, bucket), only the day's
    batch shuffles.  Verification runs on the bounded candidate set.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    sig_new = (
        _md5_slot_minima(new_docs, text_col, id_col, num_hashes, n, salt)
        if hash_fn == "md5"
        else minhash_signatures(new_docs, text_col, id_col, num_hashes, n)
    )
    # r13 slim bands (guide §2.3 "shuffle keys and metadata instead of
    # payloads", §8's decide-with-small-rows rule; the r12 carried
    # lead): the batch's band rows no longer carry the num_hashes-long
    # signature array through the checkpoint and both candidate joins
    # — they slim to (id, band, bucket) (~0.4 KB/doc at 16 bands vs
    # ~4.5 KB/doc with a 32-slot sig on every band row), and the
    # signatures join back BY ID from the one-row-per-doc checkpointed
    # signature frame only where the estimator actually needs them:
    # on the band-collision candidates (a bounded set by the LSH
    # contract).  At 100 TB this cuts the batch-side shuffle bytes of
    # the self-join and the index join ~10×; the index side is
    # untouched (its rows still carry sig, so historical candidates
    # verify with no index join-back — the index contract of
    # ``minhash_band_index`` stands).  Estimator inputs, values and
    # the drop set are identical (asserted row-for-row in the A/B);
    # the internal estimate now runs once per DISTINCT candidate pair
    # instead of once per colliding band row — the same pairs pass.
    sig_new = sig_new.localCheckpoint(eager=True)
    nb = _expand_bands(sig_new, num_hashes, bands, hash_fn).select(
        "id", "band", "bucket"
    )

    a, b = nb.alias("a"), nb.alias("b")
    # r12 (guide §2.4): the two drop lists anti-join the batch as ONE
    # deduplicated union — set algebra identical (batch ∖ (internal ∪
    # hist) == (batch ∖ internal) ∖ hist); survivors value-identical.
    cand_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    internal_drop = (
        cand_pairs.join(
            sig_new.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sig_new.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .filter(_est_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes) >= threshold)
        .select(F.col("id_b").alias("id"))
    )
    hist_drop = (
        nb.join(
            index.select(
                F.col("sig").alias("sig_h"), F.col("band"), F.col("bucket")
            ),
            ["band", "bucket"],
        )
        .select("id", "sig_h")
        .join(sig_new, "id")
        .filter(_est_jaccard(F.col("sig"), F.col("sig_h"), num_hashes) >= threshold)
        .select("id")
    )
    drops = internal_drop.unionByName(hist_drop).distinct()
    return new_docs.join(
        drops.withColumnRenamed("id", id_col), id_col, "left_anti"
    )


def updated_band_index(
    index: DataFrame,
    survivors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    hash_fn: str = "xxhash64",
    salt: str = "mhlsh-v1",
) -> DataFrame:
    """The band index after a ``dedup_incremental_minhash`` batch:
    old index ∪ the survivors' band rows (survivors are near-dup
    disjoint from the index by construction — UNION ALL, no distinct
    shuffle; write back bucketed on (band, bucket))."""
    return index.unionByName(
        minhash_band_index(
            survivors, text_col, id_col, num_hashes, bands, n, hash_fn, salt
        )
    )


def dedup_editdistance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_prefix: int = 12,
    length_bucket: int = 64,
    compare_prefix: int = 64,
    max_dist: int = 16,
) -> DataFrame:
    """Pairs (id_a < id_b) whose normalized-text prefixes are within
    ``max_dist`` Levenshtein edits — the character-level near-dup
    verifier that catches small in-place mutations (typo injection,
    template slot swaps) which shingle-set Jaccard scores leniently
    and embedding cosine misses entirely.

    Candidate generation is standard blocking: documents sharing BOTH
    a ``block_prefix``-char normalized prefix and a
    ``length_bucket``-char length band ever meet, so the self-join is
    an equi-join on the block key (shuffle hash join — never a
    cartesian), and the O(b²) blow-up is bounded by the block sizes.
    Verification runs built-in ``levenshtein`` (JVM codegen, exact
    DP) on ``compare_prefix``-char prefixes — constant work per pair.
    Recall boundary (documented, standard for blocking): a pair whose
    edits fall inside the first ``block_prefix`` chars or straddle a
    length-band boundary is missed; run with a rotated prefix (e.g.
    suffix blocking) for the union if that matters.

    Scale shape: one projection pass (normalize + block key), one
    shuffle equi-join on the block key, per-pair constant-cost
    verify.  No Python, no UDFs, no full-text transfer — only the
    bounded prefixes move through the shuffle.
    """
    from ..functions.text import normalize_text

    norm = normalize_text(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.substring(norm, 1, compare_prefix).alias("pref"),
        F.concat_ws(
            "#",
            F.substring(norm, 1, block_prefix),
            F.floor(F.length(norm) / length_bucket).cast("string"),
        ).alias("block"),
    )
    a, b = base.alias("a"), base.alias("b")
    dist = F.levenshtein(F.col("a.pref"), F.col("b.pref"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= max_dist)
    )
