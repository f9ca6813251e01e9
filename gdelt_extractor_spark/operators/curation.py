"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, deterministic train/val splitting, and
per-source corpus accounting.  All pure JVM expressions — scan-speed
at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import shingle_hashes_from_tokens


def _shingle_hash_frame(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).select("doc_id", shingle_hashes_from_tokens(F.col("_toks"), n).alias("sh"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_overlap: float = 0.1,
    strategy: str = "auto",
    broadcast_limit: int = 100_000,
) -> DataFrame:
    """Benchmark decontamination: per-document fraction of n-gram
    shingles that appear anywhere in the benchmark corpus, plus a
    keep flag (overlap ≤ max_overlap).  The standard eval-
    contamination filter (GPT-3 Appendix C style n-gram overlap);
    shingles are xxhash64'd so all set work is on fixed-width longs.

    strategy='auto' (default): ONE probe job on the SMALL side
    collects the distinct benchmark shingle set, truncated at
    ``broadcast_limit + 1`` so the driver transfer is bounded
    (≤ ~800 KB of longs) regardless of benchmark size.  If the set
    fits, it is re-injected as a one-row literal frame — the main
    query then runs the broadcast_set plan WITHOUT recomputing the
    benchmark shingles, so auto costs only one extra job-scheduling
    round trip over a hard-coded broadcast_set.  If it does not fit,
    fall to shuffle_join.  Callers no longer have to know the
    broadcast limit.

    strategy='broadcast_set': the distinct benchmark shingle-hash
    set is gathered into ONE array row and broadcast; overlap is
    ``size(array_intersect(...))`` per doc — zero shuffle, no
    explode, one scan of the corpus.  Right for real eval suites
    (≤ ~10^5 distinct shingles; measured 14× faster than the join
    plan at that size).

    strategy='shuffle_join': explode doc shingles and left-join the
    (still broadcast) benchmark shingle rows, then re-aggregate per
    doc.  Scales to benchmark sets too big for a per-row array
    (the join build side is a proper hash relation, not rebuilt per
    row) at the cost of a doc-side explode + per-doc re-agg.
    """
    doc_sh = _shingle_hash_frame(docs, id_col, text_col, n)
    bench_distinct = (
        _shingle_hash_frame(benchmark, id_col, text_col, n)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    bench_arr = None
    if strategy == "auto":
        probe = (
            bench_distinct.limit(broadcast_limit + 1)
            .agg(F.collect_list("h").alias("_bench"))
            .first()["_bench"]
        )
        if len(probe) <= broadcast_limit:
            strategy = "broadcast_set"
            bench_arr = docs.sparkSession.createDataFrame(
                [(probe,)], "_bench array<bigint>"
            )
        else:
            strategy = "shuffle_join"
    if strategy == "broadcast_set":
        if bench_arr is None:
            bench_arr = bench_distinct.agg(F.collect_list("h").alias("_bench"))
        counted = doc_sh.crossJoin(F.broadcast(bench_arr)).select(
            "doc_id",
            F.size("sh").alias("n_shingles"),
            F.size(F.array_intersect("sh", "_bench")).alias("n_overlap"),
        )
    elif strategy == "shuffle_join":
        exploded = doc_sh.select(
            "doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("h")
        )
        counted = (
            exploded.join(
                F.broadcast(bench_distinct.withColumn("_hit", F.lit(1))), "h", "left"
            )
            .groupBy("doc_id", "n_shingles")
            .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"))
        )
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")
    return counted.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias("overlap_frac"),
        (F.round(F.col("n_overlap") / F.col("n_shingles"), 6) <= max_overlap).alias(
            "keep"
        ),
    )


def sample_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic hash-based train/val split.

    bucket = first 4 hex digits of md5(salt:id) as int, mod 100 —
    content-stable across runs, engines and cluster sizes (unlike
    ``randomSplit``), and salt-versioned so a new salt redraws the
    split.  Pure expression; splits at 100 TB are a scan, not a
    shuffle.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    return df.select(
        "*",
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_stratum`` rows of
    each stratum with the smallest md5(salt:id) — content-stable
    (unlike ``sampleBy``), reproducible on any cluster, and
    re-drawable by changing the salt.  One shuffle on the stratum
    key; the per-stratum sort is bounded by the window."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def corpus_stats(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum corpus accounting: document counts, token and
    char budgets — the bookkeeping every data-mixing recipe needs.
    One partial-aggregated shuffle on the (small-cardinality) strata
    key."""
    n_tok = F.size(tokens(text_col))
    return docs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("long")).alias("total_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("total_chars"),
        (F.sum(n_tok.cast("long")) / F.count(F.lit(1))).alias("avg_tokens"),
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    broadcast_boiler: bool = False,
) -> DataFrame:
    """Cross-document line dedup (the C4 recipe): drop every line
    that occurs, trimmed, in ≥ ``min_docs`` distinct documents —
    navigation bars, cookie banners, license footers — and
    reassemble each document's surviving lines in order.

    Plan shape: posexplode to (doc, pos, line) rows; boilerplate
    detection is ONE partial-aggregated shuffle keyed on the line;
    the anti join filtering the corpus is left to Catalyst/AQE by
    default — on a real web corpus with ``min_docs=2`` the
    boilerplate side is every line repeated across documents
    (millions of rows at 100 TB), so forcing a broadcast would OOM
    the executors; AQE promotes it to broadcast at runtime only when
    its measured size is actually small, and otherwise shuffles the
    anti join on ``norm_line`` — a uniform content-derived key.
    Pass ``broadcast_boiler=True`` only when the caller KNOWS the
    set is tiny (e.g. high ``min_docs`` over a curated corpus).
    Reassembly is one shuffle on the doc id with
    ``sort_array(collect_list(struct(pos, line)))`` restoring order
    without a window sort.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm_line", F.trim(F.col("line")))
    boiler = (
        lines.filter(F.col("norm_line") != "")
        .groupBy("norm_line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("norm_line")
    )
    boiler_side = F.broadcast(boiler) if broadcast_boiler else boiler
    kept = lines.join(boiler_side, "norm_line", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    # left join from the full corpus: a doc whose every line was
    # boilerplate must survive as an (empty, fully-removed) row, not
    # silently disappear from the output
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("n_lines") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
        .cast("long")
        .alias("n_lines_removed"),
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic source-weighted mixture resampling — the step
    that turns a raw corpus into a training MIXTURE (Pile/C4 style):
    weight w < 1 keeps a w-fraction of the stratum, w > 1 replicates
    every doc floor(w) times plus one more for a frac(w) fraction,
    w = 0 drops the stratum.  Expected stratum size = w × |stratum|.

    Same content-stable hash-threshold discipline as ``sample_split``
    (salted md5 → uniform millionths), with the fractional part
    resolved in INTEGER arithmetic driver-side so both engines
    compare identical ints.  The copy fan-out is
    ``explode(sequence(1, n_copies))`` — pure expressions, zero
    shuffles; at 100 TB this is scan-speed, and the emitted
    ``copy_id`` lets downstream packing/shuffling treat replicas as
    distinct rows.
    """
    floors = {s: int(w) for s, w in weights.items()}
    thrs = {s: round((w - int(w)) * 1_000_000) for s, w in weights.items()}
    d_floor, d_thr = int(default_weight), round(
        (default_weight - int(default_weight)) * 1_000_000
    )
    fw: F.Column = F.lit(d_floor)
    thr: F.Column = F.lit(d_thr)
    for s in sorted(weights):
        fw = F.when(F.col(source_col) == s, F.lit(floors[s])).otherwise(fw)
        thr = F.when(F.col(source_col) == s, F.lit(thrs[s])).otherwise(thr)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    n = (fw + F.when(u < thr, F.lit(1)).otherwise(F.lit(0))).alias("_n")
    copies = F.when(n > 0, F.sequence(F.lit(1), n))  # NULL (dropped) when n = 0
    return df.select("*", F.explode(copies).alias("copy_id"))


def normalize_url(col) -> "F.Column":
    """Canonical URL form for blocklists and URL-level dedup
    (C4-style): lowercase, strip scheme / leading ``www.`` / query /
    fragment / trailing slashes.  Pure regexp chain — stays in
    codegen, and the same five patterns run unchanged in any
    POSIX-regex engine (the oracle applies the identical chain).

    The scheme, userinfo, and www patterns strip REPEATED prefixes
    (``(...)+``) — dirty crawl data really does contain
    ``http://http://x`` and ``www.www.x`` — which also makes the
    function idempotent for every input (property-tested), so
    re-normalizing already-clean URLs is safe.  Userinfo is stripped
    because ``http://user@spam.com/x`` and ``http://spam.com/x`` are
    the same page (and the former would otherwise bypass host
    blocklists)."""
    x = F.lower(col)
    # scheme and userinfo as ONE repeated alternation: interleavings
    # like 'http://a@http://b' must strip in a single pass or the
    # function stops being idempotent
    x = F.regexp_replace(x, r"^(([a-z][a-z0-9+.\-]*://)|([^/@?#]*@))+", "")
    x = F.regexp_replace(x, r"#.*$", "")
    x = F.regexp_replace(x, r"\?.*$", "")
    x = F.regexp_replace(x, r"^(www\.)+", "")
    return F.regexp_replace(x, r"/+$", "")


def _normalize_blocklist_host(h: str) -> str:
    """Python twin of ``normalize_url``'s host canonicalization for
    BLOCKLIST ENTRIES, so common list forms ('https://spam.com/',
    'www.spam.com', 'SPAM.COM/path') all match the post-normalization
    ``host`` column instead of silently matching nothing."""
    import re

    h = h.strip().lower()
    h = re.sub(r"^(([a-z][a-z0-9+.\-]*://)|([^/@?#]*@))+", "", h)
    h = h.split("/")[0].split("?")[0].split("#")[0]
    h = re.sub(r"^(www\.)+", "", h)
    return h.split(":")[0]


def url_filter(
    df: DataFrame,
    url_col: str,
    blocked_hosts: list[str],
    id_col: str = "doc_id",
    dedup: bool = True,
) -> DataFrame:
    """URL-based corpus curation (the C4 recipe's URL stage):
    normalize each document's URL, drop documents whose host is on a
    blocklist, and (optionally) keep one document per normalized URL
    — the same page fetched twice (http/https, with/without www,
    tracking params) must not enter the corpus twice.

    Adds ``url_norm`` and ``host`` columns; keeps every other input
    column.

    Scale shape: normalization is one projection; the blocklist —
    host-keyed and typically ≪ corpus — joins as a BROADCAST left
    anti join (no corpus shuffle); URL dedup is one shuffle on
    ``url_norm`` (window keep-first by ``id_col``), content-derived
    and near-uniform by construction.  At 100 TB the only exchange
    is the dedup's, and callers that already partition by URL can
    pass dedup=False and use their own layout.
    """
    from .dedup import dedup_keep_first

    spark = df.sparkSession
    staged = df.withColumn("url_norm", normalize_url(F.col(url_col)))
    # host excludes the port: blocklists are host lists, and
    # normalize_url has already stripped scheme/userinfo/www
    staged = staged.withColumn(
        "host", F.regexp_extract(F.col("url_norm"), r"^([^/:]+)", 1)
    )
    block = spark.createDataFrame(
        [(_normalize_blocklist_host(h),) for h in blocked_hosts], "host string"
    )
    kept = staged.join(F.broadcast(block), "host", "left_anti")
    if dedup:
        kept = dedup_keep_first(kept, key="url_norm", order=id_col)
    return kept


def dedup_lines_global(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global first-occurrence line dedup (the MassiveText /
    C4-span rule, complementing ``remove_boilerplate_lines``): every
    repeated non-empty line keeps only its FIRST occurrence in the
    corpus — ordered by (doc id, line position) — and later copies
    are dropped, wherever they appear.  Where the boilerplate op
    needs ≥ min_docs appearances and removes EVERY copy, this keeps
    exactly one.  Empty/whitespace lines are dropped (same
    convention as repetition_stats).

    Returns (doc_id, clean_text, n_lines_kept, n_lines_removed);
    documents whose every line was a later duplicate come back with
    empty clean_text, preserving corpus row count.

    Plan shape: posexplode; ONE window keep-first shuffle keyed on
    the trimmed line (content-derived, uniform — a hot line has many
    rows but only rank 1 survives, and Spark's window sorts
    within-partition without a global sort); then ONE aggregate
    shuffle on the doc id that computes kept text, kept count, and
    total count together — ``collect_list`` skips the NULL structs
    that a dropped line's ``when()`` produces, so survivors and
    totals fall out of the same pass and no second line scan or join
    is needed.  One final broadcast-size join against the id column
    preserves corpus row count for all-duplicate documents.
    """
    from pyspark.sql import Window

    lines = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("norm_line", F.trim(F.col("line")))
        .filter(F.col("norm_line") != "")
    )
    w = Window.partitionBy("norm_line").orderBy(
        F.col("doc_id").asc(), F.col("pos").asc()
    )
    first = F.col("_rn") == 1
    kept_struct = F.when(first, F.struct("pos", "line"))
    agg = (
        lines.withColumn("_rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.when(first, 1).otherwise(0)).alias("n_lines_kept"),
            F.count(F.lit(1)).alias("_n_total"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (
                F.coalesce("_n_total", F.lit(0))
                - F.coalesce("n_lines_kept", F.lit(0))
            ).alias("n_lines_removed"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006, algorithm A-ES): each row derives a
    uniform u ∈ (0,1) from md5(salt:id), scores key = −ln(u)/weight,
    and the k smallest keys win — inclusion odds proportional to
    weight, identical in distribution to successive weighted draws,
    but embarrassingly parallel, content-stable across runs/engines/
    cluster sizes (unlike ``sample``/``rand``), and re-drawable by
    changing the salt.

    With ``stratum_col``, k rows per stratum via a window on the
    stratum key (one shuffle); without, a global top-k that plans as
    TakeOrderedAndProject (no full sort).  Rows with non-positive or
    NULL weight are excluded.  Keys are rounded to 6 decimals BEFORE
    ranking with the id as tie-break, so the selection is
    reproducible bit-for-bit on any engine (the same convention as
    tfidf_top_terms).

    The exposed ``sample_key`` makes the draw auditable: re-ranking
    the corpus by the same formula must reproduce the sample.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("double")
    # (h + 0.5) / 16^12: exact doubles (h < 2^48), u strictly in (0,1)
    u = (h + F.lit(0.5)) / F.lit(float(16**12))
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 6)
    base = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_key", key)
    )
    if stratum_col is None:
        return base.orderBy(
            F.col("sample_key").asc(), F.col(id_col).asc()
        ).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.col("sample_key").asc(), F.col(id_col).asc()
    )
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    granularity: str = "doc",
    n: int = 3,
) -> DataFrame:
    """Cross-source overlap matrix: for every pair of sources, how
    many DISTINCT content fingerprints they share, and the
    containment fraction n_shared / min(|A|, |B|) — the corpus-
    accounting report behind "is CommonCrawl dump N just dump N-1
    again?" / "which mirrored sites should we drop wholesale?".

    ``granularity="doc"`` fingerprints whole normalized documents
    (md5) — overlap means verbatim duplication.  ``"shingle"``
    fingerprints ``n``-token shingles (xxhash64) — overlap measures
    shared CONTENT even when no document is copied wholesale, the
    right lens for near-mirror detection.

    Plan (100 TB shape): the corpus collapses FIRST to distinct
    (source, fingerprint) pairs — one partial-aggregated shuffle
    keyed on the uniform hash — so the pair join runs over the
    deduplicated fingerprint set, never raw documents.  The self-join
    key is the fingerprint; fan-out per key is bounded by the number
    of sources carrying it (squared), and the number of sources is
    small by construction.  Per-source totals re-enter broadcast:
    source-cardinality rows.
    """
    from .dedup import shingle_hash_rows, with_content_hash

    if granularity == "doc":
        h = (
            with_content_hash(df, text_col)
            .select(
                F.col(source_col).alias("source"),
                F.col("content_hash").alias("fp"),
            )
            .distinct()
        )
    elif granularity == "shingle":
        h = (
            shingle_hash_rows(
                df.select(F.col(source_col).alias("source"), text_col),
                text_col,
                n,
                ["source"],
            )
            .withColumnRenamed("shingle", "fp")
            .distinct()
        )
    else:
        raise ValueError(f"granularity must be 'doc' or 'shingle', got {granularity!r}")
    # pair generation per fingerprint, NOT an exploded self-join (the
    # gkg_theme_cooccurrence discipline): one shuffle groups each
    # fingerprint's carrier-source set, pairs come from a nested
    # transform over the sorted array — the second table scan, join
    # build, and |carriers|-way shuffle amplification of a self-join
    # never happen, and the in-row pair fan-out is bounded by the
    # (small) source count squared, independent of corpus size
    srcs = F.array_sort(F.collect_set("source"))
    s = F.col("_srcs")
    pair = F.flatten(
        F.transform(
            s,
            lambda a_, i: F.transform(
                F.slice(s, i + 2, F.size(s)),
                lambda b_: F.struct(a_.alias("a"), b_.alias("b")),
            ),
        )
    )
    byfp = h.groupBy("fp").agg(srcs.alias("_srcs"))
    # per-source totals fall out of the SAME carrier-set aggregate
    # the pair branch consumes: h is distinct (source, fp), so
    # exploding each fingerprint's carrier set re-emits each
    # (source, fp) exactly once and the per-source count IS the
    # distinct-fingerprint total.  All three consumers (pairs,
    # n_a, n_b) now hang off one identical exchange subtree —
    # ReuseExchange evaluates the corpus lineage once, where the
    # naive shape scanned it three times.
    totals = (
        byfp.select(F.explode("_srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        byfp.filter(F.size("_srcs") > 1)
        .select(F.explode(pair).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = F.broadcast(totals.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")))
    tb = F.broadcast(totals.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")))
    return (
        pairs.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


def source_quality_filter(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_mean: float = 0.6,
    min_docs: int = 2,
) -> DataFrame:
    """Domain-level curation (the C4 / RefinedWeb SITE rule): score
    every document, aggregate MEAN quality per source/domain, and
    drop ENTIRE sources whose mean falls below the floor or that
    have too few documents to judge — the complement of per-document
    filtering: a spam domain's individually-plausible pages all go.

    Scale shape: scoring is one codegen projection; the per-source
    aggregate shuffles only (source, decimal-sum, count) partials —
    map-side combined, and the domain cardinality is ≪ corpus.  The
    verdict table is broadcast back as a semi join, so the corpus
    itself never shuffles.  The mean is a decimal-sum / count
    (partition-order independent, plans/queries.py convention).

    Returns (doc_id, source, quality) for surviving documents.
    Reference: this generalizes the reference's per-article keyword
    cleanup (extractor.py:247-274) from row scope to domain scope.
    """
    from .textstats import quality_score

    scored = quality_score(df, id_col, text_col, keep_cols=(source_col,))
    per_src = scored.groupBy(source_col).agg(
        (
            F.sum(F.col("quality").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_quality"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    good = per_src.filter(
        (F.col("mean_quality") >= min_mean) & (F.col("n_docs") >= min_docs)
    ).select(source_col)
    return scored.join(F.broadcast(good), source_col, "left_semi").select(
        "doc_id", source_col, "quality"
    )


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """One-call dataset card: the global numbers every corpus README
    leads with — documents, tokens, characters, sources, languages,
    and the exact-duplicate rate — as (metric, value) rows from ONE
    aggregate pass (the distinct counts share Spark's standard
    Expand-based multi-distinct; nothing collects).  Complements
    ``corpus_stats`` (the per-stratum budget table).  Values are
    DOUBLE for a uniform unpivot; all are exact integer counts
    except dup_rate."""
    from ..functions.text import normalize_text, tokens

    one = df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("double").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("double").alias("n_chars"),
        F.count_distinct(F.col(source_col)).cast("double").alias("n_sources"),
        F.count_distinct(F.col(lang_col)).cast("double").alias("n_langs"),
        F.count_distinct(F.md5(normalize_text(text_col)))
        .cast("double")
        .alias("_uniq"),
    ).withColumn(
        "dup_rate", F.round(1 - F.col("_uniq") / F.col("n_docs"), 6)
    )
    return one.select(
        F.expr(
            "stack(6, 'n_docs', n_docs, 'n_tokens', n_tokens, "
            "'n_chars', n_chars, 'n_sources', n_sources, "
            "'n_langs', n_langs, 'dup_rate', dup_rate) AS (metric, value)"
        )
    ).orderBy("metric")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Diff two corpus versions — the is-this-dump-what-changed audit
    run before promoting a new crawl: per doc id, status ∈
    {'added','removed','changed','unchanged'} with the content hash
    on each side.

    Plan: each side reduces to (id, md5(normalized text)) in its own
    scan projection, then ONE full-outer equi-join on id decides the
    status — text never shuffles, only 32-byte hashes do.  At 100 TB
    both sides' hash frames are a fraction of corpus bytes and the
    join is the only exchange; with both versions bucketed on id it
    disappears entirely.
    """
    from ..functions.text import normalize_text

    def hashes(df: DataFrame, side: str) -> DataFrame:
        # explicit presence marker: NULL text hashes to NULL, so the
        # hash cannot double as an existence signal
        return df.select(
            F.col(id_col).alias("_id"),
            F.md5(normalize_text(text_col)).alias(f"{side}_hash"),
            F.lit(1).alias(f"_in_{side}"),
        )

    j = hashes(old, "old").join(hashes(new, "new"), "_id", "full")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("old_hash").eqNullSafe(F.col("new_hash")), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        F.col("_id").alias(id_col), status.alias("status"), "old_hash", "new_hash"
    )


def mixture_weights(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.3,
    token_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled sampling weights per source (the
    multilingual/multi-source mixing recipe of Conneau & Lample 2019:
    p_s ∝ (n_s/N)^alpha) — alpha<1 up-weights small sources, alpha=1
    is natural sampling.  Output per source: share of the corpus,
    scaled sampling probability, and the resulting over/under-sample
    factor (prob/share) ready to feed ``mix_sources`` as its target
    weight.

    Mass is docs (or tokens when ``token_col`` is given).  Plan: one
    map-side-combined groupBy to |sources| rows, a 1-row total cross-
    joined back broadcast, and a window-free projection — the corpus
    is scanned once, nothing collected.
    """
    mass = (
        F.count(F.lit(1)).alias("_m")
        if token_col is None
        else F.sum(token_col).alias("_m")
    )
    per_src = df.groupBy(F.col(source_col).alias("source")).agg(mass)
    # alpha=0.5 routes through sqrt: IEEE 754 requires sqrt to be
    # correctly rounded, so both engines produce bit-identical
    # weights; generic pow carries no such guarantee (same reasoning
    # as bm25_search's rational idf)
    def _scaled(c):
        return F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(alpha))

    # decimal-cast the scaled sum: plain double summation order is
    # partition-dependent and an ulp shift can flip the 6dp rounding
    # of sample_prob (the repo-wide dsum convention)
    tot = per_src.agg(
        F.sum("_m").alias("_tot"),
        F.sum(_scaled(F.col("_m")).cast("decimal(25,9)"))
        .cast("double")
        .alias("_pow_tot"),
    )
    return (
        per_src.join(F.broadcast(tot))
        .select(
            "source",
            F.col("_m").cast("long").alias("mass"),
            F.round(F.col("_m") / F.col("_tot"), 6).alias("share"),
            # (n_s/N)^a / Σ(n_t/N)^a == n_s^a / Σ n_t^a — compute the
            # normalized-by-total form directly so both engines share
            # the identical arithmetic
            F.round(
                _scaled(F.col("_m")) / F.col("_pow_tot"), 6
            ).alias("sample_prob"),
        )
        .withColumn(
            "boost",
            F.round(F.col("sample_prob") / F.col("share"), 6),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-space benchmark decontamination: drop every corpus
    row whose vector is cosine-≥-threshold to ANY eval-set vector —
    the semantic sibling of the n-gram ``decontaminate`` (paraphrased
    or reformatted eval leakage that exact n-grams miss).

    Plan: the eval side is SMALL by contract (an eval set) and
    broadcasts; the corpus scans once through the broadcast nested-
    loop with a JVM zip_with/aggregate cosine — no shuffle of corpus
    rows at all; the contaminated-id set then anti-joins back.  At
    larger eval sets, route through ``dedup_semantic``'s IVF cells
    instead.
    """
    from .similarity import _as_double, _dot, _norm

    # r13 norm hoist (see similarity._with_norm): each side's norm is
    # computed once per INPUT row below the cross join instead of once
    # per pair (the corpus norm |eval|×, the eval norm |corpus|×);
    # cos = dot/(ncv·nev) multiplies in cosine()'s exact order, so the
    # 6-rounded values and the drop set are bit-identical.  A/B at
    # sf0.1: 1.12s → 0.854s median, 7/7 pairwise; hash gates green.
    ev = F.broadcast(
        eval_set.select(_as_double(vec_col).alias("_ev")).withColumn(
            "_nev", _norm(F.col("_ev"))
        )
    )
    hits = (
        corpus.select(
            F.col(id_col).alias("_cid"), _as_double(vec_col).alias("_cv")
        )
        .withColumn("_ncv", _norm(F.col("_cv")))
        .join(ev)
        .filter(
            F.round(
                _dot(F.col("_cv"), F.col("_ev"))
                / (F.col("_ncv") * F.col("_nev")),
                6,
            )
            >= threshold
        )
        .select("_cid")
        .distinct()
    )
    return corpus.join(
        hits.withColumnRenamed("_cid", id_col), id_col, "left_anti"
    )


def merge_corpus_stats(history: DataFrame, batch_stats: DataFrame) -> DataFrame:
    """Incremental maintenance of the ``corpus_stats`` table: fold a
    new batch's per-stratum stats into the standing history WITHOUT
    rescanning historical text — the daily-increment production shape
    (same philosophy as ``dedup.dedup_incremental``'s index).

    Works because every corpus_stats column is a MERGEABLE summary:
    counts and sums add; the average re-derives from the merged sums
    (averages themselves never merge).  Strata present on only one
    side pass through.  Plan: one union + one groupBy on the
    small-cardinality strata key — cost is independent of corpus
    size, which is the whole point.
    """
    group_cols = [c for c in history.columns
                  if c not in ("n_docs", "total_tokens", "total_chars",
                               "avg_tokens")]
    both = history.select(*group_cols, "n_docs", "total_tokens",
                          "total_chars").unionByName(
        batch_stats.select(*group_cols, "n_docs", "total_tokens",
                           "total_chars")
    )
    return (
        both.groupBy(*group_cols)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("total_tokens"),
            F.sum("total_chars").alias("total_chars"),
        )
        .withColumn(
            "avg_tokens", F.col("total_tokens") / F.col("n_docs")
        )
    )


def cluster_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    node_col: str = "node",
    cluster_col: str = "cluster_id",
    train_pct: int = 90,
    salt: str = "cluster-split-v1",
) -> DataFrame:
    """Leakage-free train/val split: near-duplicate documents must
    land in the SAME split — a per-doc hash split puts one copy of a
    near-dup pair in train and its twin in val, silently leaking
    training data into evaluation.  The split key is therefore the
    doc's CLUSTER REPRESENTATIVE (its component's min id from
    ``dedup.connected_components``); singleton docs key on their own
    id, which is exactly the same hash ``sample_split`` would draw.

    Plan: one left join of the corpus to the (node, cluster) frame
    — cluster frames only contain docs that HAVE a near-dup, so the
    join's build side is the duplicate subset, not the corpus — then
    the same md5 bucket projection as ``sample_split``.  Scan-speed
    plus one bounded join; identical salt semantics.
    """
    c = clusters.select(
        F.col(node_col).alias(id_col), F.col(cluster_col).alias("_rep")
    )
    keyed = df.join(c, id_col, "left").withColumn(
        "_split_key", F.coalesce(F.col("_rep"), F.col(id_col))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col("_split_key").cast("string")
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return keyed.select(
        *[F.col(c) for c in df.columns],
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """Preference-pair mining for DPO/RLHF prep: per group (prompt,
    topic, source...), pair the highest-scoring member as ``chosen``
    against the lowest as ``rejected`` with the score margin.

    ONE map-side-combinable aggregate — ``max_by``/``min_by`` with a
    (score, id) struct ordering, so ties break deterministically on
    the id (largest id wins chosen, smallest id wins rejected) and
    the result is engine-portable (the oracle reproduces the same
    lexicographic order with window ranks).  Groups with fewer than
    two members or margin <= ``min_margin`` are dropped — a
    single-member group can't form a pair, and zero-margin pairs
    carry no preference signal.
    """
    s, i = F.col(score_col), F.col(id_col)
    agg = df.groupBy(group_col).agg(
        F.max_by(i, F.struct(s.alias("s"), i.alias("i"))).alias("chosen_id"),
        F.min_by(i, F.struct(s.alias("s"), i.alias("i"))).alias(
            "rejected_id"
        ),
        F.max(s).alias("chosen_score"),
        F.min(s).alias("rejected_score"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        agg.filter(
            (F.col("n_members") >= 2)
            & (
                F.col("chosen_score") - F.col("rejected_score")
                > F.lit(float(min_margin))
            )
        )
        .select(
            group_col,
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "margin"
            ),
            "n_members",
        )
    )


def dsir_importance(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    target: str = "src0",
    n_buckets: int = 64,
    salt: str = "dsir-v1",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023) scores: hashed unigram bag-of-words features, an add-one
    smoothed log-likelihood ratio per feature bucket between the
    target domain (rows whose ``source_col`` equals ``target``) and
    the raw corpus, and a per-document importance score = mean
    bucket log-ratio over its token occurrences.  Documents scoring
    high "look like" the target domain; resampling by these weights
    is the standard pretraining-mixture selection recipe.

    Buckets come from md5 (engine-portable, content-stable), NOT the
    engine's native hash, so the draw is reproducible anywhere and
    oracle-checkable.

    Scale shape (r12): ONE corpus tokenize+md5 pass feeds a
    per-(doc, bucket) count aggregate that is eagerly materialized
    (narrow: ≤ n_docs × ``n_buckets`` rows of three longs); the
    bucket distributions for the model AND the per-doc scoring join
    both read that frame, so the corpus text is scanned once where
    the naive model-pass + scoring-pass shape scanned it twice
    (A/B 1.72s → 1.47s at sf0.1).  Per-doc scoring multiplies the
    broadcast weight by the occurrence count — Σ_occurrences D(w)
    ≡ c·D(w) exactly in decimal arithmetic, so scores are
    bit-identical to the token-level sum.  Nothing driver-side.
    """
    from ..functions.text import tokens

    term_rows = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(tokens(text_col)).alias("term"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + ":"), F.col("term"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        ),
    )
    g = (
        term_rows.groupBy(id_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.count_if(F.col(source_col) == target).alias("_ct"),
        )
        .localCheckpoint(eager=True)
    )
    counts = g.groupBy("bucket").agg(
        F.sum("_c").alias("c_raw"),
        F.sum("_ct").alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    b = F.lit(n_buckets).cast("long")
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(
                (F.col("c_tgt") + 1) / (F.col("n_tgt") + b).cast("double")
            )
            - F.log(
                (F.col("c_raw") + 1) / (F.col("n_raw") + b).cast("double")
            )
        ).alias("w"),
    )
    # Σ_occurrences D(w) over a bucket ≡ c · D(w) exactly (decimal
    # addition is exact and D27(w) == D30(w) at scale 15); the
    # (27,15)×(10,0) product stays decimal(38,15) — no precision
    # loss, so per-doc sums are bit-equal to the token-level path
    scored = (
        g.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.sum(
                F.col("w").cast("decimal(27,15)")
                * F.col("_c").cast("decimal(10,0)")
            ).alias("_sw"),
        )
    )
    return (
        scored
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.col("_sw").cast("double") / F.col("n_tokens"), 6
            ).alias("dsir_logratio"),
        )
    )


def nb_domain_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    target: str = "src0",
    n_buckets: int = 64,
    train_pct: int = 80,
    salt: str = "nbclf-v1",
) -> DataFrame:
    """Hashed Naive Bayes "looks like the reference domain"
    classifier — the GPT-3 / CCNet quality-classifier recipe as one
    distributed train+predict pass: fit a binary NB model (target
    domain vs rest) on hashed unigram counts from a deterministic
    train split, then score EVERY document with its posterior
    log-odds and a hard prediction.  Downstream curation keeps docs
    whose log-odds clear a threshold (optionally with a Pareto noisy
    threshold, per GPT-3 appendix A).

    Differs from ``dsir_importance`` (an unsupervised importance
    WEIGHT over the raw corpus) in being a supervised classifier:
    class-conditional likelihoods are fit on labeled train rows
    only, a class prior enters the score, and the output carries the
    train/val split marker plus the hard prediction so held-out
    precision/recall roll up with one aggregate.

    Per doc: (doc_id, split, is_target, n_tokens, nb_logodds,
    pred_target) where

        nb_logodds = ln((D_pos+1)/(D_neg+1)) + Σ_tokens
            [ln((c_pos[b]+1)/(N_pos+B)) − ln((c_neg[b]+1)/(N_neg+B))]

    with b = md5-hashed token bucket (engine-portable, same scheme
    as DSIR), D_* train doc counts, N_* train token totals, B =
    ``n_buckets`` (add-one smoothing over the bucket vocabulary).

    Scale shape: the split marker is a pure projection (md5 mod
    100); training is ONE partial-aggregated shuffle over the bucket
    key (≤ B result rows) plus a tiny doc-count aggregate; the
    weight table broadcasts onto the token stream and per-doc
    scoring is one shuffle on the doc id with a decimal
    (order-independent) sum.  Two corpus scans, two shuffles — the
    same 100 TB shape as DSIR, with the prior folded in driver-free.
    """
    split_bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    base = docs.select(
        F.col(id_col),
        (F.col(source_col) == target).alias("is_target"),
        F.when(split_bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
        tokens(text_col).alias("_t"),
    )
    term_rows = base.select(
        id_col,
        "is_target",
        "split",
        F.explode("_t").alias("term"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + ":"), F.col("term"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        ),
    )
    train_terms = term_rows.filter(F.col("split") == "train")
    counts = train_terms.groupBy("bucket").agg(
        F.count_if(F.col("is_target")).alias("c_pos"),
        F.count_if(~F.col("is_target")).alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg")
    )
    priors = base.filter(F.col("split") == "train").agg(
        F.count_if(F.col("is_target")).alias("d_pos"),
        F.count_if(~F.col("is_target")).alias("d_neg"),
    )
    b = F.lit(n_buckets).cast("long")
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_pos") + 1) / (F.col("n_pos") + b).cast("double"))
            - F.log(
                (F.col("c_neg") + 1) / (F.col("n_neg") + b).cast("double")
            )
        ).alias("w"),
    )
    prior = priors.select(
        F.log((F.col("d_pos") + 1) / (F.col("d_neg") + 1).cast("double")).alias(
            "_prior"
        )
    )
    # Every input doc survives the explode: split-tokenization emits
    # at least one token (empty text → one "" token) — so no
    # hashed_embedding-style left-join-back is needed, and per-doc
    # scoring stays a single hash aggregate.
    scored = (
        term_rows.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, "split", "is_target")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("w").cast("decimal(30,15)")).alias("_sw"),
        )
    )
    return scored.crossJoin(F.broadcast(prior)).select(
        F.col(id_col),
        "split",
        "is_target",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.col("_prior") + F.col("_sw").cast("double"), 6
        ).alias("nb_logodds"),
        (
            (F.col("_prior") + F.col("_sw").cast("double")) > 0
        ).alias("pred_target"),
    )


def perplexity_band_filter(
    scored: DataFrame,
    group_col: str = "source",
    score_col: str = "lm_score",
    id_col: str = "doc_id",
    lo_pct: float = 0.25,
    hi_pct: float = 0.75,
) -> DataFrame:
    """Per-domain score-band selection — the CCNet/DCLM "keep the
    middle perplexity band" curation step: within each group, rank
    documents by their LM score and keep those whose percent rank
    falls in [``lo_pct``, ``hi_pct``].  The extremes are what the
    recipe distrusts — the lowest-perplexity tail is boilerplate and
    templated text, the highest is noise/garble — and banding
    PER DOMAIN keeps one verbose domain from eating the global
    budget.

    Input is any (id, group, score) frame — compose with
    ``textstats.lm_score`` (or a real external-LM scorer) upstream.
    NULL scores (docs the scorer could not rate, e.g. <2 tokens) are
    dropped before ranking and never selected.

    Returns (id, group, score, pct_rank, selected) for every scored
    row — callers filter on ``selected``; keeping the flag makes the
    reject side auditable (the FineWeb practice of logging what each
    filter removed, not just its survivors).

    Scale shape: one window per group (shuffle on the group key,
    per-group sort bounded by the domain size).  percent_rank is
    rank-based — exact, no quantile sketch — and deterministic under
    (score, id) tie-breaks.  A skewed giant domain bounds the sort:
    at 100 TB swap the window for approx percentiles per group
    (``approx_percentile`` over the group) and a threshold join;
    the exact window is kept here because the selection boundary is
    then reproducible to the row, which the sketch cannot promise.
    """
    from pyspark.sql import Window

    base = scored.select(
        F.col(id_col), F.col(group_col), F.col(score_col)
    ).filter(F.col(score_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    pr = F.percent_rank().over(w)
    return base.select(
        id_col,
        group_col,
        score_col,
        F.round(pr, 6).alias("pct_rank"),
        ((pr >= lo_pct) & (pr <= hi_pct)).alias("selected"),
    )


def rater_agreement(
    labels: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    label_col: str = "label",
) -> DataFrame:
    """Inter-rater agreement audit for labeled datasets — the QA gate
    run on RLHF preference labels, eval judgments, or any
    multi-annotator corpus before training on it: per item the
    observed pairwise agreement P_i, plus the corpus-level Fleiss'
    kappa broadcast onto every row so one frame carries both the
    hot-spots (low-P_i items worth re-adjudicating) and the headline
    reliability number.

        P_i   = (Σ_j n_ij² − n_i) / (n_i (n_i − 1))
        P̄    = mean_i P_i          (items with ≥2 raters)
        P̄_e  = Σ_j p_j²,  p_j = Σ_i n_ij / Σ_i n_i
        κ     = (P̄ − P̄_e) / (1 − P̄_e)

    n_i raters may vary per item (the Fleiss formula generalizes;
    single-rater items report NULL P_i and are excluded from P̄).
    Everything is exact integer arithmetic until the final
    divisions, so the numbers are engine-portable to the row.

    Scale shape: one (item, label) count shuffle, one item rollup,
    one ≤|labels|-row category aggregate and a 1-row kappa — the
    corpus-level scalars broadcast back; nothing driver-side, no
    window.  Output: (item, n_raters, n_cats, p_agree, fleiss_kappa,
    p_bar, p_e).
    """
    cell = labels.groupBy(
        F.col(item_col).alias("item"), F.col(label_col).alias("lab")
    ).agg(F.count(F.lit(1)).alias("c"))
    per_item = cell.groupBy("item").agg(
        F.sum("c").alias("n_raters"),
        F.count(F.lit(1)).alias("n_cats"),
        F.sum(F.col("c") * F.col("c")).alias("_ss"),
    )
    p_i = F.when(
        F.col("n_raters") > 1,
        (F.col("_ss") - F.col("n_raters"))
        / (F.col("n_raters") * (F.col("n_raters") - 1)).cast("double"),
    )
    items = per_item.select(
        "item",
        F.col("n_raters").cast("long").alias("n_raters"),
        F.col("n_cats").cast("long").alias("n_cats"),
        p_i.alias("_p_i"),
    )
    # corpus scalars: P̄ over multi-rater items; P̄_e from category mass
    pbar = items.agg(
        (
            F.sum(F.col("_p_i").cast("decimal(30,15)")).cast("double")
            / F.count("_p_i")
        ).alias("p_bar")
    )
    cat = cell.groupBy("lab").agg(F.sum("c").alias("cj"))
    pe = cat.agg(
        (
            F.sum(F.col("cj") * F.col("cj")).cast("double")
            / (F.sum("cj") * F.sum("cj")).cast("double")
        ).alias("p_e")
    )
    kappa = (
        pbar.crossJoin(F.broadcast(pe))
        .select(
            "p_bar",
            "p_e",
            ((F.col("p_bar") - F.col("p_e")) / (1.0 - F.col("p_e"))).alias(
                "fleiss_kappa"
            ),
        )
    )
    return items.crossJoin(F.broadcast(kappa)).select(
        "item",
        "n_raters",
        "n_cats",
        F.round("_p_i", 6).alias("p_agree"),
        F.round("fleiss_kappa", 6).alias("fleiss_kappa"),
        F.round("p_bar", 6).alias("p_bar"),
        F.round("p_e", 6).alias("p_e"),
    )


def contamination_links(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """The audit trail behind ``decontaminate``'s aggregate: WHICH
    benchmark item leaked into WHICH document.  One row per
    (doc, benchmark item) pair sharing ≥ ``min_shared`` distinct
    n-gram shingles, with the containment fraction — the share of
    the benchmark item's shingles found in the doc, the direction
    that measures eval leakage.  ``decontaminate`` answers "is this
    doc dirty"; this answers "dirty WITH WHAT", which is what a
    removal review or a benchmark-vendor report needs.

    Scale shape: both sides shingle once as DISTINCT (id, hash) ROWS
    via the codegen explode-form (dedup._shingle_rows — the array-
    form's per-doc array_distinct is interpreted and O(len²); the
    row form measured ~5× faster on the doc side at sf0.1); the
    benchmark side is small by the decontamination contract, so its
    shingle rows and its per-item sizes broadcast — the link join is
    broadcast-hash on the shingle key, then one partial-aggregated
    shuffle on the (doc, bench) pair.  The doc side streams; nothing
    all-pairs.  For a benchmark too large to broadcast, drop the
    hint and the same plan runs as a shuffle join keyed on
    content-derived uniform hashes.
    """
    from .dedup import _shingle_rows

    d = _shingle_rows(docs, text_col, id_col, n).select(
        F.col("id").alias("doc_id"), F.col("shingle").alias("h")
    )
    b_rows = _shingle_rows(benchmark, text_col, id_col, n).select(
        F.col("id").alias("bench_id"), F.col("shingle").alias("h")
    )
    b = b_rows
    sizes = b_rows.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_bench_shingles")
    )
    return (
        d.join(F.broadcast(b), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .join(F.broadcast(sizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_bench_shingles").cast("long").alias("n_bench_shingles"),
            F.round(
                F.col("n_shared") / F.col("n_bench_shingles"), 6
            ).alias("containment"),
        )
    )

def prefix_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Shared-opening boilerplate detector: cluster documents by
    their first ``k`` normalized tokens and report every prefix that
    opens ``min_docs``+ documents — the standard catch for template
    headers, scraper banners, and licence preambles that survive
    line-level dedup because the REST of each page differs.

    Returns (prefix, n_docs, n_sources, example_doc) — n_sources > 1
    distinguishes ecosystem-wide boilerplate from one site's
    template; example_doc (min id) is the deterministic sample to
    eyeball.

    Scale shape: one codegen tokenize+slice projection, then TWO
    partial-aggregated shuffles ((prefix, source), then prefix) so
    the distinct-source count never Expands the doc rows.  Docs
    shorter than ``k`` tokens cluster by their full token list —
    short boilerplate ("404 not found") is exactly what this exists
    to catch.
    """
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    per_src = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(source_col).alias("_src"),
            F.concat_ws(" ", F.slice(toks, 1, k)).alias("prefix"),
        )
        .groupBy("prefix", "_src")
        .agg(F.count(F.lit(1)).alias("_n"), F.min("_id").alias("_ex"))
    )
    return (
        per_src.groupBy("prefix")
        .agg(
            F.sum("_n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sources"),
            F.min("_ex").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )

def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020, §2.2 heuristics):
    keep only lines that END in a terminal punctuation mark
    (. ! ? ") and contain at least ``min_words`` words; drop any
    line containing the word "javascript" (case-insensitive); flag
    whole documents containing "lorem ipsum" or a "{" (code) — the
    published recipe's page-level kill rules — and documents left
    with fewer than ``min_kept_lines`` lines.

    Returns every input doc: (doc_id, clean_text, n_lines, n_kept,
    doc_dropped) where ``doc_dropped`` marks page-level kills (their
    clean_text is still reported for audit).  Downstream keeps
    ``~doc_dropped`` rows.

    Plan shape: the line rules are pure per-line predicates, so this
    is ONE posexplode → codegen filter → one groupBy(doc) reassembly
    (sort_array over (pos, line) structs — no window sort), plus the
    page-level flags computed on the raw text in the same base scan.
    No corpus-wide line table is ever joined (unlike
    ``remove_boilerplate_lines``, which needs the cross-doc line
    frequency shuffle — compose the two: C4 rules first shrink the
    line table that the boilerplate pass must shuffle).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    lines = base.select(
        "doc_id",
        F.posexplode(F.split("_t", "\n")).alias("pos", "line"),
    ).withColumn("_trim", F.trim("line"))
    word_count = F.size(F.split(F.col("_trim"), "\\s+"))
    kept = lines.filter(
        (F.col("_trim").rlike('[.!?"]$'))
        & (word_count >= min_words)
        & (~F.lower(F.col("_trim")).contains("javascript"))
    )
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "_trim"))),
                lambda s: s["_trim"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    flags = base.select(
        "doc_id",
        F.size(F.split("_t", "\n")).cast("long").alias("n_lines"),
        (
            F.lower(F.col("_t")).contains("lorem ipsum")
            | F.col("_t").contains("{")
        ).alias("_page_kill"),
    )
    return flags.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (
            F.col("_page_kill")
            | (F.coalesce("n_kept", F.lit(0)) < min_kept_lines)
        ).alias("doc_dropped"),
    )


def budget_select(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    score_col: str = "quality",
    token_budget: int = 10_000,
) -> DataFrame:
    """Quality-first selection under a per-group token budget — the
    greedy knapsack every mixture recipe ends with ("take each
    source's best documents until its token allocation is spent"):
    within each group, documents are taken in (score DESC, id ASC)
    order while the RUNNING token total stays ≤ ``token_budget``;
    the first document that would overflow the budget is dropped and
    so is everything after it at lower scores (strict prefix rule —
    deterministic and auditable, unlike best-fit backfilling which
    reorders by size).  A document alone larger than the budget is
    never taken.

    Returns every input doc with (doc_id, group, score, n_tokens,
    cum_tokens, selected) — keep ``selected`` docs, audit the rest.

    Scale shape: one window pass partitioned by the group (per-group
    sort, never global), token counting in the same projection;
    output is input-sized.  The cumulative sum is integer-exact, so
    the contract is engine-portable with no rounding anywhere."""
    from ..functions.text import tokens

    # NULL text must count as empty text, NOT as size(NULL) = -1:
    # a -1 token count breaks cum_tokens' monotonicity and lets a
    # doc AFTER the first overflow re-satisfy cum <= budget (ADVICE
    # r8); the DuckDB oracle twin coalesces identically.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("group"),
        F.col(score_col).cast("double").alias("score"),
        F.size(tokens(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("long")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("group")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    # strict prefix: selected iff EVERY doc up to and incl. this one
    # fits, i.e. the running max of cum_tokens so far ≤ budget ⇔
    # cum_tokens ≤ budget AND no earlier overflow — with positive
    # token counts cum is monotone, so cum ≤ budget suffices
    return cum.withColumn(
        "selected", F.col("cum_tokens") <= F.lit(token_budget)
    )


def blocklist_filter(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Word-boundary blocklist screening — the unsophisticated but
    universal first toxicity/brand-safety pass (C4 dropped any page
    hitting the "List of Dirty, Naughty ..." list; max_hits=0 is that
    rule).  Returns every doc with (n_blocked_hits, n_blocked_terms,
    first_blocked, keep = hits ≤ max_hits) — flag-don't-delete, so
    the audit trail survives.

    Matching is case-insensitive on word boundaries (``\\b``), the
    terms compiled into ONE alternation regex evaluated by
    ``regexp_count`` — a single codegen pass per row, not |terms|
    scans; the term list is a plan-time literal (the sane size for a
    blocklist; a list too big for a regex belongs in a broadcast-join
    token table instead, which is what ``decontaminate`` does).
    Terms are regex-escaped, so ``c++`` style entries are safe."""
    import re as _re

    if not terms:
        raise ValueError("blocklist_filter: at least one term")

    def bounded(t: str) -> str:
        # \b only works at word-char edges; terms ending in
        # punctuation ('c++') get lookarounds instead (Java regex —
        # oracle twins use plain-word terms where \b suffices)
        left = r"\b" if _re.match(r"\w", t) else r"(?<![\w])"
        right = r"\b" if _re.search(r"\w$", t) else r"(?![\w])"
        return f"{left}{_re.escape(t)}{right}"

    uniq = sorted(set(t.lower() for t in terms))
    alts = "|".join(bounded(t) for t in uniq)
    pat = f"(?i)(?:{alts})"
    # NULL text counts as empty (hits=0, keep=true) — bare NULL would
    # propagate into n_blocked_hits/keep so the doc is neither kept
    # nor flagged downstream (ADVICE r8); the oracle twin coalesces.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    hits = F.regexp_count(txt, F.lit(pat))
    first = F.regexp_extract(txt, f"(?i)({alts})", 1)
    per_term = F.array(
        *[
            (F.regexp_count(txt, F.lit(f"(?i){bounded(t)}")) > 0).cast(
                "int"
            )
            for t in uniq
        ]
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        hits.cast("long").alias("n_blocked_hits"),
        F.aggregate(per_term, F.lit(0), lambda a, x: a + x)
        .cast("long")
        .alias("n_blocked_terms"),
        F.lower(first).alias("first_blocked"),
        (hits <= max_hits).alias("keep"),
    )


def balance_classes(
    df: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    per_class: int | None = None,
    salt: str = "balance-v1",
) -> DataFrame:
    """Deterministic class rebalancing by downsampling: keep
    ``per_class`` rows per class (default: the MINORITY class size —
    the classic balanced-training-set recipe), chosen by the salted
    md5 order of the id — content-stable, partition-independent, and
    reproducible like every sampler in this repo (sample_split /
    stratified_sample / weighted_sample).  Output = kept rows with
    ``class_n`` (the class's original size) carried for the audit.

    Scale shape: one window rank per class (per-class sort, never
    global) + a broadcast of the (class, size) table; when
    ``per_class`` defaults, the minority size is one tiny aggregate
    of class counts.  Rows stream through one shuffle on the class
    key."""
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("class_n"))
    if per_class is None:
        per_class_col = counts.agg(F.min("class_n")).first()[0]
        if per_class_col is None:
            return df.join(F.broadcast(counts), class_col).limit(0)
        per_class = int(per_class_col)
    w = Window.partitionBy(class_col).orderBy(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_class)
        .drop("_rn")
        .join(F.broadcast(counts), class_col)
    )
