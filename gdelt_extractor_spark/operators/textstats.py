"""Text analysis operators for training-data curation (SURVEY.md §2c
31-34): language ID, quality scoring, token stats, fingerprinting.
All pure JVM expressions — these run at scan speed on 100 TB.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens

# Tiny per-language marker lexicons for the n-gram/stopword heuristic
# language id.  Deterministic argmax with fixed priority order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "es": ("el", "los", "las", "y", "es", "en"),
    "zh": (),  # handled via CJK codepoint detection
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("it", "that", "this", "for", "on", "with")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    if not markers:
        return F.lit(0)
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Heuristic language ID: CJK codepoint presence → zh, else
    argmax of marker-lexicon hit counts (priority en>de>fr>es on
    ties), 'und' (undetermined, BCP-47) when no marker hits.

    Tokens are materialized in their own projection (Catalyst does
    not CSE inside lambdas, so inlining would re-tokenize once per
    lexicon); CJK detection is an ``rlike`` existence check, not a
    full scrub of the string."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),
        F.col(text_col).rlike("[一-鿿]").alias("_cjk"),
        *keep_cols,
    )
    toks = F.col("_toks")
    en, de, fr, es = (
        _marker_hits(toks, LANG_MARKERS[l]) for l in ("en", "de", "fr", "es")
    )
    best = F.greatest(en, de, fr, es)
    pred = (
        F.when(F.col("_cjk"), F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return base.select("doc_id", pred.alias("lang_pred"), *keep_cols)


def lang_id_ngram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    n_buckets: int = 4096,
    train_pct: int = 80,
    salt: str = "langnb-v1",
) -> DataFrame:
    """Trained language ID: multiclass Naive Bayes over hashed char
    n-grams — the fastText/langid.py recipe re-expressed as one
    distributed train+predict pass, upgrading the zero-shot stopword
    heuristic (``lang_id``) for real multilingual corpora: char
    n-grams catch orthography (ß, accents, suffix morphology) even in
    documents that contain no function words at all, where the marker
    heuristic can only answer 'und' (measured on the committed
    fixture: tests/test_textstats.py::test_lang_ngram_beats_heuristic).

    One labeled frame in, per-doc predictions out:
    (doc_id, split, lang_true, lang_pred, nb_score) where ``split``
    is the deterministic md5 train/val marker (train rows fit the
    model, every row is scored — evaluate on val), ``lang_pred`` the
    argmax class and ``nb_score`` its rounded posterior log-score

        score(d, L) = ln((D_L+1)/(D+K))                 [prior]
          + Σ_{g∈d, (b_g,L) seen}  ln((c[b_g,L]+1)/(N_L+B))
          + (t_d − m_{d,L}) · ln(1/(N_L+B))             [unseen grams]

    with b = md5-hashed n-gram bucket (engine-portable, the DSIR/NB
    scheme), c the train (bucket, lang) counts, N_L the lang's train
    gram total, t_d the doc's gram count, m the matched count —
    i.e. add-one smoothing over the ``n_buckets`` vocabulary with
    unseen buckets folded in arithmetically instead of densifying
    the weight table to every (bucket, lang) pair.

    Scale shape: training is ONE partial-aggregated shuffle on the
    (bucket, lang) key (≤ B·K result rows) + a K-row prior aggregate;
    the weight table broadcasts onto the gram stream; per-doc scoring
    is one shuffle on (doc, lang) with a decimal (order-independent)
    sum, then a K-row-per-doc argmax window.  Two corpus scans, two
    shuffles — the nb_domain_classifier shape, multiclass.
    Ties (after 6-decimal rounding) break by lang ascending, so the
    argmax is deterministic and engine-portable.
    """
    from pyspark.sql import Window

    split_bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    norm = normalize_text(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("lang_true"),
        F.when(split_bucket < train_pct, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
        norm.alias("_norm"),
        F.greatest(F.length(norm) - (n - 1), F.lit(1)).alias("_t"),
    )
    grams = base.select(
        "doc_id",
        "lang_true",
        "split",
        F.explode(F.sequence(F.lit(1), F.col("_t"))).alias("_pos"),
        "_norm",
    ).select(
        "doc_id",
        "lang_true",
        "split",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt + ":"),
                            F.substring("_norm", F.col("_pos"), n),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )
    train = grams.filter(F.col("split") == "train")
    # the (bucket, lang) count table (≤ B·K rows) feeds lang_tot AND
    # weights — two static evaluations of the train-gram corpus pass;
    # one eager materialization runs it once (r12, guide §5)
    counts = (
        train.groupBy("bucket", F.col("lang_true").alias("lang"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    b = F.lit(n_buckets).cast("long")
    lang_tot = counts.groupBy("lang").agg(F.sum("_c").alias("_n_lang"))
    weights = counts.join(F.broadcast(lang_tot), "lang").select(
        "bucket",
        "lang",
        F.log((F.col("_c") + 1) / (F.col("_n_lang") + b).cast("double")).alias("_w"),
    )
    # per-lang prior + unseen-gram default, one tiny frame (K rows);
    # d_tot is DERIVED from it — _d = Σ per-lang doc counts (incl. a
    # NULL-lang group), _k = #non-NULL lang rows ≡
    # countDistinct(lang_true) — so the prior needs one base pass,
    # not two (r12)
    per_lang = (
        base.filter(F.col("split") == "train")
        .groupBy(F.col("lang_true").alias("lang"))
        .agg(F.count(F.lit(1)).alias("_d_lang"))
        .localCheckpoint(eager=True)
    )
    d_tot = per_lang.agg(
        F.sum("_d_lang").alias("_d"),
        F.count("lang").alias("_k"),
    )
    lang_model = (
        per_lang.join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(d_tot))
        .select(
            "lang",
            F.log((F.col("_d_lang") + 1) / (F.col("_d") + F.col("_k")).cast("double")).alias("_prior"),
            F.log(F.lit(1.0) / (F.col("_n_lang") + b).cast("double")).alias("_default"),
        )
    )
    matched = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("_w").cast("decimal(30,15)")).alias("_sw"),
            F.count(F.lit(1)).alias("_m"),
        )
    )
    skeleton = base.select("doc_id", "lang_true", "split", "_t").crossJoin(
        F.broadcast(lang_model)
    )
    scored = skeleton.join(matched, ["doc_id", "lang"], "left").select(
        "doc_id",
        "lang_true",
        "split",
        "lang",
        F.round(
            F.col("_prior")
            + F.coalesce(F.col("_sw").cast("double"), F.lit(0.0))
            + (F.col("_t") - F.coalesce(F.col("_m"), F.lit(0))) * F.col("_default"),
            6,
        ).alias("_score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("_score").desc(), F.col("lang").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "split",
            "lang_true",
            F.col("lang").alias("lang_pred"),
            F.col("_score").alias("nb_score"),
        )
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace-token counts + a BPE-ish subword estimate.

    ``n_subwords`` approximates a BPE tokenizer with the standard
    ~4-chars-per-token heuristic applied per word:
    ceil(len(word)/4) summed over words — cheap, deterministic, and
    good enough for per-corpus budget accounting.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),  # materialized: tokenize once
        F.length(normalize_text(text_col)).cast("long").alias("n_chars_norm"),
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    subw = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0)
    )
    return base.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_unique"),
        F.round(n_uniq / n_tok, 6).alias("ttr"),
        subw.alias("n_subwords"),
        "n_chars_norm",
    )


def quality_score(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Composite curation score in [0,1]:
    0.4·length-score (tokens/100 capped at 1)
    + 0.3·alpha ratio (alphanumeric+space chars / all chars)
    + 0.3·(1 − stopword ratio).
    The components mirror standard quality filters (Gopher/C4-style
    length, symbol, and stopword heuristics).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),  # materialized: tokenize once
        (
            F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", ""))
            / F.length(F.col(text_col))
        ).alias("_alpha"),
        *keep_cols,
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    stop_ratio = _marker_hits(toks, EN_STOPWORDS) / n_tok
    alpha_ratio = F.col("_alpha")
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.3
        + (1 - stop_ratio) * 0.3
    )
    return base.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality"),
        *keep_cols,
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition metrics: per-document duplicate-line
    fraction (boilerplate / templated-page detector).

    Lines are trimmed and empties dropped; ``dup_line_frac`` is
    1 − distinct/total (0 for line-free docs).  Pure per-row JVM
    array expressions — no shuffle, runs at scan speed.
    """
    lines = F.filter(
        # explicit unary lambda: F.trim's optional 2nd arg would make
        # transform bind it as an (element, index) function
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    base = df.select(F.col(id_col).alias("doc_id"), lines.alias("_lines"))
    n = F.size("_lines")
    nd = F.size(F.array_distinct("_lines"))
    return base.select(
        "doc_id",
        n.cast("long").alias("n_lines"),
        nd.cast("long").alias("n_distinct_lines"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.round(1 - nd / n, 6))
        .alias("dup_line_frac"),
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    idf = ln((N+1)/(df+1)) + 1 (smoothed); scores are rounded to 6
    decimals BEFORE ranking so the ordering is reproducible across
    engines, with the term as deterministic tie-break.

    Scale shape: one shuffle on (doc, term) for TF, one on term for
    the DF window, the corpus size joins in as a broadcast scalar,
    and the final top-k is a window on the doc key.  Document
    frequency is computed as a COUNT window over the TF frame (r13 —
    formerly a groupBy(term) aggregate joined back; the window input
    is the join's own streamed side, so the swap drops the aggregate
    exchange and the join and leaves TF with a single consumer: the
    tokenize+explode now runs once where it used to run twice —
    which also retires the pre-r13 "Known recompute" note and its
    checkpoint A/B).
    """
    # explode + groupBy for TF: a per-row array-expression count
    # (transform over array_distinct with a filter per term) was
    # measured SLOWER — nested higher-order functions run
    # interpreted, outside whole-stage codegen — so the hash-partial
    # shuffle on (doc, term) is the faster and the scalable path.
    t = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    from pyspark.sql import Window

    # r13 (guide §2.2): document frequency is a COUNT window over the
    # TF frame itself instead of a groupBy(term) aggregate joined
    # back — the window input IS the join's streamed side, so the
    # aggregate exchange and the sort-merge join drop out (plan:
    # 22 → 16 Exchange refs).  A/B at sf0.1: 2.28s → 1.76s median,
    # 6/7 pairwise, rows identical.
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    scored = (
        scored.join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tfidf")
    )


def top_bigrams(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-wide top-k token bigrams (collocation mining).

    Bigrams come from exploding token positions and projecting the
    pair AFTER the explode (the shingle_hash_rows discipline: HOF
    zip_with lambdas run interpreted; post-explode F.get projections
    stay in whole-stage codegen — measured 1.8× on the build).  One
    partial-aggregated shuffle on the bigram, then a global top-k
    (the ORDER BY + LIMIT compiles to TakeOrderedAndProject —
    per-partition heaps, no full sort)."""
    toks = tokens(text_col)
    base = df.select(toks.alias("_toks"), F.size(toks).alias("_n")).filter(
        F.col("_n") >= 2
    )
    pair = F.concat(
        F.get(F.col("_toks"), F.col("_i").cast("int")),
        F.lit(" "),
        F.get(F.col("_toks"), (F.col("_i") + 1).cast("int")),
    )
    return (
        base.select(
            F.explode(F.sequence(F.lit(0), F.col("_n") - 2)).alias("_i"), "_toks"
        )
        .select(pair.alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(k)
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup
    key) plus a 64-bit xxhash64 (cheap join/bucket key).  The
    rolling-hash shingle variant lives in dedup.shingles/minhash."""
    norm = normalize_text(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


# Gopher rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A —
# the canonical rule-based quality baseline).  Word-count bounds are
# tightened from the paper's [50, 100k] so the synthetic corpus
# exercises both outcomes; at production scale use the paper's.
GOPHER_RULES = {
    "min_words": 30,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "min_alpha_word_frac": 0.8,
    "max_symbol_ratio": 0.1,
    "min_stopwords": 2,
}


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style rule FILTER: per-document rule measurements plus a
    ``keep`` verdict (every rule passes).  Unlike ``quality_score``
    (a soft composite), this is the hard-threshold baseline most
    pipelines run first.  Pure per-row JVM expressions — one
    projection, no shuffle, scan-speed at 100 TB.

    Rules: word count within bounds, mean word length within bounds,
    ≥80% of words contain a letter, symbol-to-word ratio (``#`` and
    ``...``) ≤ 0.1, and ≥2 distinct English stopwords present.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_txt"),
        tokens(text_col).alias("_toks"),  # materialized: tokenize once
    )
    toks = F.col("_toks")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_wl = sum_len / n_words
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n_words
    symbols = F.regexp_count(F.col("_txt"), F.lit("#")) + F.regexp_count(
        F.col("_txt"), F.lit(r"\.\.\.")
    )
    sym_ratio = symbols / n_words
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.lit(list(EN_STOPWORDS))
        )
    )
    R = GOPHER_RULES
    keep = (
        n_words.between(R["min_words"], R["max_words"])
        & mean_wl.between(R["min_mean_word_len"], R["max_mean_word_len"])
        & (alpha_frac >= R["min_alpha_word_frac"])
        & (sym_ratio <= R["max_symbol_ratio"])
        & (n_stop >= R["min_stopwords"])
    )
    return base.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        sym_ratio.alias("symbol_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        keep.alias("keep"),
    )


def compression_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Compression-ratio quality signal (the RefinedWeb/MassiveText
    heuristic): zlib-compressed size over raw size per document.
    Highly repetitive or templated text compresses far below natural
    prose (~0.4-0.6 for English), machine-generated keyword stuffing
    lower still, and high-entropy noise approaches (or exceeds) 1.0
    — a one-number complement to the line-level repetition metrics.

    This is one of the few justified Python edges in the repo: DEFLATE
    is not expressible in SQL/Catalyst, so the operator runs an
    Arrow-batched pandas UDF over zlib (stdlib, level 6) — a few
    hundred MB/s per core, vectorized per batch, no JVM round-trips
    per row.  Downstream thresholding stays in codegen.

    Returns (id, n_bytes, n_compressed, compression_ratio); empty
    documents report ratio NULL rather than dividing by zero.
    """
    import zlib

    @F.pandas_udf("long")
    def _zsize(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8", "replace"), 6))
            if t is not None
            else None
        )

    n_bytes = F.octet_length(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col),
        n_bytes.alias("n_bytes"),
        _zsize(F.col(text_col)).alias("n_compressed"),
    ).select(
        id_col,
        "n_bytes",
        "n_compressed",
        F.when(
            F.col("n_bytes") > 0, F.col("n_compressed") / F.col("n_bytes")
        ).alias("compression_ratio"),
    )


# bigram join key separator: US (unit separator, \x1f) cannot appear
# in whitespace-split tokens of ordinary text; documents containing
# raw control characters should be scrubbed first (text_filter)
_BIGRAM_SEP = "\x1f"


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Corpus-trained bigram language-model quality score (the CCNet
    recipe shape: score documents under an n-gram LM and filter or
    bucket on the result — here the LM is trained on the corpus
    itself in the same job, the standard self-scoring setup when no
    reference LM ships with the pipeline).

    Per document: mean log-probability of its token bigrams under an
    add-one-smoothed bigram model,
    ``lm_score = avg ln((c(w1,w2)+1) / (c(w1)+V))``, plus the bigram
    count.  Natural repeated prose scores higher than shuffled or
    keyword-stuffed text; documents with fewer than two tokens
    report NULL.

    Scale shape: two global aggregates build the model — bigram
    counts (shuffle on the bigram) and unigram counts (shuffle on
    the token) — then each DISTINCT bigram's probability is computed
    once on the model side and joined back to per-document bigram
    instances (shuffle on the bigram key, content-derived and
    uniform), and one final per-doc aggregate.  The vocabulary size
    is c1's own row count (it IS the distinct-unigram count), so
    the c1 exchange is reused at runtime instead of a fourth
    tokenize+countDistinct pass (r12; a full per-(doc, w1, bigram)
    pre-aggregate was also A/B'd and REJECTED — it added a
    full-token-stream shuffle with almost no partial reduction,
    1.67s → 2.30s).  The model is never collected or broadcast:
    vocab² does not fit a driver; a join scales.  log-probs are
    rounded to ``round_to`` decimals before the decimal-sum mean so
    the value gate is engine-stable (the same ln convention tfidf
    uses).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    )
    toks = F.col("_toks")
    # explode-the-positions-THEN-project (the shingle_hash_rows
    # discipline): zip_with/slice lambdas run on the interpreted
    # expression walker; post-explode F.get projections stay in
    # whole-stage codegen — measured 1.8× on the bigram build
    staged = base.withColumn("_n", F.size(toks)).filter(F.col("_n") >= 2)
    w1 = F.get(F.col("_toks"), F.col("_i").cast("int"))
    w2 = F.get(F.col("_toks"), (F.col("_i") + 1).cast("int"))
    doc_bigrams = staged.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("_n") - 2)).alias("_i"),
        "_toks",
    ).select(
        "doc_id",
        w1.alias("w1"),
        F.concat_ws(_BIGRAM_SEP, w1, w2).alias("bigram"),
    )
    c2 = doc_bigrams.groupBy("w1", "bigram").agg(
        F.count(F.lit(1)).alias("c2")
    )
    unigrams = base.select(F.explode(toks).alias("w1"))
    c1 = unigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    probs = (
        c2.join(c1, "w1")
        .join(F.broadcast(vocab))
        .select(
            "bigram",
            F.round(
                F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))), round_to
            ).alias("logp"),
        )
    )
    scored = (
        doc_bigrams.join(probs, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(F.col("logp").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("lm_score"),
        )
    )
    return (
        base.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )


def ngram_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Within-document n-gram repetition signals (the Gopher
    repetition family beyond duplicate LINES — `repetition_stats`
    covers those):

    - ``top_ngram_char_frac``: character mass of the single most
      frequent n-gram (count × length) over the total n-gram
      character mass — Gopher's "fraction of characters in the most
      common n-gram" signal (n = 2..4 there).
    - ``dup_ngram_char_frac``: character mass of ALL n-grams
      occurring ≥ 2 times over the total — Gopher's "fraction of
      characters in duplicated n-grams" (n = 5..10 there).  Like the
      published reimplementations (overlap-unaware), every occurrence
      counts; Gopher's once-per-character refinement needs positional
      interval union, which buys little discrimination.

    Ties for the top n-gram break on the lexically smallest gram
    (MIN over struct(−count, gram) — one aggregate, no window), so
    the report is engine-deterministic.  Documents with fewer than
    ``n`` tokens carry no n-gram and are dropped (the fractions are
    undefined there) — callers wanting full coverage left-join back.

    Plan shape: tokenize once, explode each document's n_toks−n+1
    grams (bounded per-doc fan-out, no shuffle), then ONE
    partial-aggregated shuffle on (doc, gram) — a content-derived
    uniform key — and ONE doc-keyed rollup.  No UDFs, no self-joins:
    the within-doc counting that would be O(len²) as per-row array
    ops is linear as a grouped aggregate.
    """
    toks = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") >= n)
    gram = F.array_join(
        F.slice(F.col("_toks"), (F.col("_i") + 1).cast("int"), n), " "
    )
    grams = staged.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), (F.col("_n") - n).cast("long"))
        ).alias("_i"),
        "_toks",
    ).select("doc_id", gram.alias("gram"))
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    mass = F.col("cnt") * F.length("gram")
    top = F.min(
        F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g"))
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.sum(mass).alias("_total_mass"),
            F.sum(F.when(F.col("cnt") >= 2, mass).otherwise(F.lit(0))).alias(
                "_dup_mass"
            ),
            top.alias("_top"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_distinct_grams",
            F.col("_top.g").alias("top_gram"),
            (-F.col("_top.nc")).alias("top_gram_count"),
            F.round(
                (-F.col("_top.nc")) * F.length("_top.g") / F.col("_total_mass"), 6
            ).alias("top_ngram_char_frac"),
            F.round(F.col("_dup_mass") / F.col("_total_mass"), 6).alias(
                "dup_ngram_char_frac"
            ),
        )
    )


def vocab_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_k: int = 1000,
) -> DataFrame:
    """Per-group vocabulary drift vs the corpus: smoothed KL
    divergence D(group ‖ corpus) over the corpus's top-``vocab_k``
    terms — the audit behind "did dump N's content shift?" /
    "which source is distributionally unlike the rest?".

    Distributions are restricted to the shared top-K vocabulary
    (selected by corpus frequency, term as tie-break) and add-one
    smoothed over that support (denominators in_vocab_tokens + K and
    corpus_vocab_tokens + K), so every group is comparable on the
    same support and a term missing from a group costs a finite,
    smoothing-controlled amount.  Output per group: token counts,
    in-vocab coverage, and ``kl_divergence`` (natural log, rounded
    to 6 — both engines' ``log`` agree to the last ulp and the
    K-term sum keeps the error far below the rounding grain).

    Scale shape: ONE (group, term) shuffle for group counts and a
    term rollup for corpus counts; the top-K vocabulary is K rows by
    construction (TakeOrderedAndProject — the FULL vocabulary is
    never collected or broadcast), so the observed in-vocab cells
    shrink to ≤ groups×K rows through a broadcast semi join and the
    dense grid / KL rollup are all broadcast-sized.  Per-cell KL
    contributions are plain codegen arithmetic — no higher-order
    array aggregate (interpreted) anywhere.
    """
    t = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("term")
    )
    # gt feeds FOUR plan branches (corpus counts, group totals,
    # in-vocab cells, in-vocab totals) and Catalyst does not
    # common-subexpress them — without materialization the corpus
    # tokenize+explode+shuffle runs four times.  Eager
    # localCheckpoint evaluates it once; gt is (groups × vocabulary)
    # rows, orders of magnitude below corpus size, so the
    # materialization is cheap at any scale (same rationale as the
    # semantic-dedup probe checkpoint at dedup.py:644).
    gt = (
        t.groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("n_gt"))
        .localCheckpoint(eager=True)
    )
    corpus = gt.groupBy("term").agg(F.sum("n_gt").alias("n_t"))
    vocab = corpus.orderBy(F.col("n_t").desc(), F.col("term").asc()).limit(vocab_k)
    g_tot = gt.groupBy("grp").agg(F.sum("n_gt").alias("n_g"))
    # observed in-vocab cells: ≤ groups × K rows after the broadcast
    # semi join — small from here on out
    gt_v = gt.join(F.broadcast(vocab.select("term")), "term", "left_semi")
    in_g = gt_v.groupBy("grp").agg(F.sum("n_gt").alias("in_g"))
    vocab_tot = vocab.agg(
        F.sum("n_t").alias("v_tot"), F.count(F.lit(1)).alias("v_k")
    )
    # dense (group × vocab-term) grid: every cell must exist for the
    # smoothed distribution (missing term → count 0, not absent)
    grid = (
        g_tot.join(in_g, "grp")
        .crossJoin(F.broadcast(vocab))
        .join(gt_v, ["grp", "term"], "left")
        .select(
            "grp", "n_g", "in_g", "n_t",
            F.coalesce("n_gt", F.lit(0)).alias("n_gt"),
        )
        .crossJoin(F.broadcast(vocab_tot))
    )
    p = (F.col("n_gt") + 1) / (F.col("in_g") + F.col("v_k"))
    q = (F.col("n_t") + 1) / (F.col("v_tot") + F.col("v_k"))
    # decimal-cast sum (module convention): per-term doubles are
    # IEEE-identical across engines (same divisions, log to 1 ulp ≪
    # the 1e-15 decimal grain) and decimal addition is
    # order-independent, so the K-term sum cannot drift with
    # partitioning or engine accumulation order
    return (
        grid.groupBy("grp", "n_g", "in_g")
        .agg(
            F.sum((p * F.log(p / q)).cast("decimal(30,15)"))
            .cast("double")
            .alias("_kl")
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n_g").alias("n_tokens"),
            F.col("in_g").alias("n_in_vocab"),
            F.round(F.col("in_g") / F.col("n_g"), 6).alias("vocab_coverage"),
            F.round(F.col("_kl"), 6).alias("kl_divergence"),
        )
    )


def bpe_pair_counts(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 100
) -> DataFrame:
    """First BPE merge-step statistics: corpus-wide counts of
    adjacent character pairs inside words, weighted by word
    frequency — what a tokenizer trainer computes before every merge
    (Sennrich et al. 2016).

    The scale trick is aggregating to DISTINCT words first (Zipf:
    distinct words ≪ corpus tokens), so the pair explosion runs over
    the vocabulary, not the corpus: one shuffle to the word
    frequency table, a per-word position explode (substring window,
    the repo's explode-positions-then-project pattern — no
    interpreted array lambda), one shuffle to pair totals, and a
    TakeOrderedAndProject top-k.  Deterministic tie-break by pair.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = words.select(
        "f",
        "w",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    ).select(F.substring("w", F.col("i"), 2).alias("pair"), "f")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def _feature_hash_counts(
    toks: DataFrame, dim: int, seed: str, hash_fn: str
) -> DataFrame:
    """(id, t) non-empty token rows → (id, b, c) signed bucket
    counts — the Weinberger hashing-trick core shared by
    ``hashed_embedding`` and ``hybrid_search``'s dense tower (r11:
    one definition of the md5/xxhash bucket+sign idiom)."""
    if hash_fn == "md5":
        hx = F.md5(F.concat(F.lit(seed + ":"), F.col("t")))
        h = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
        sign_even = (
            F.pmod(F.conv(F.substring(hx, 13, 1), 16, 10).cast("long"), F.lit(2))
            == 0
        )
    else:
        h = F.xxhash64(F.col("t"), F.lit(seed))
        sign_even = (
            F.pmod(F.xxhash64(F.col("t"), F.lit(seed + ":sign")), F.lit(2)) == 0
        )
    bucketed = toks.select(
        "id",
        F.pmod(h, F.lit(dim)).cast("int").alias("b"),
        F.when(sign_even, -1.0).otherwise(1.0).alias("s"),
    )
    return bucketed.groupBy("id", "b").agg(F.sum("s").alias("c"))


def hashed_embedding(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    seed: str = "hash-emb-v1",
    hash_fn: str = "xxhash64",
    layout: str = "dense",
) -> DataFrame:
    """Feature-hashed document embeddings (Weinberger et al. 2009):
    every token hashes to one of ``dim`` buckets with a ±1 sign from
    a second hash bit; the L2-normalized bucket-count vector is a
    cheap, deterministic, model-free embedding — the bridge that
    lets the TEXT corpus flow into the embedding machinery
    (ann_bruteforce / dedup_embedding / SemDeDup / kmeans) without
    any external model.

    Scale shape: explode → one (doc, bucket) shuffle with map-side
    partial sums → per-doc map assembly → a codegen projection
    densifies to array<double> and normalizes.  No UDF anywhere;
    signs cancel hash collisions in expectation (the standard
    trick).  Output: (id, embedding array<double>, unit L2 norm;
    all-zero docs yield the zero vector).

    ``hash_fn``: ``"xxhash64"`` (default — the fastest JVM hash) or
    ``"md5"`` — the engine-portable variant (bucket from the first
    12 hex digits of md5(seed:token), sign from the parity of hex
    digit 13; the repo-wide md5-bucket idiom DuckDB reproduces
    verbatim), which is what lets the oracle twin replicate the full
    embedding value-for-value.  Same plan shape either way; md5
    costs one extra hash-width per token at scan time.

    ``layout``: ``"dense"`` (default — one row per doc with the
    array<double> column, the shape the ANN machinery consumes) or
    ``"long"`` — one row per (id, bucket, value), built straight
    from the bucket aggregates by a codegen explode + two equi-joins
    with NO array construction.  Use "long" when the consumer wants
    exploded values anyway: posexplode over the dense column
    re-evaluates the (interpreted) densify/normalize lambdas once
    per OUTPUT row — measured 9.3s vs 1.5s at sf0.1.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(
            f"hashed_embedding: unknown hash_fn {hash_fn!r} "
            "(expected 'xxhash64' or 'md5')"
        )
    if layout not in ("dense", "long"):
        raise ValueError(
            f"hashed_embedding: unknown layout {layout!r} "
            "(expected 'dense' or 'long')"
        )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    ).filter(F.col("t") != "")
    counts = _feature_hash_counts(toks, dim, seed, hash_fn)
    if layout == "long":
        # the bucket aggregate feeds BOTH the (id, bucket) grid join
        # and the nrm_l rollup — two static evaluations of the
        # tokenize+hash corpus lineage (different exchange keys, so
        # no ReuseExchange).  The frame is narrow and bounded
        # (n_docs × ≤dim rows of (id, int, double)); one eager
        # materialization runs the corpus scan once (r12, guide §5).
        counts = counts.localCheckpoint(eager=True)
        # codegen path: ids × bucket grid → left-join counts + norms;
        # Σc² over the nonzero buckets equals the dense bucket-order
        # sum exactly (counts are integer-valued doubles — exact,
        # order-independent addition)
        # norm via window-over-the-grid was A/B'd flat-to-negative
        # (r13: 2.13s vs 2.17s, 3/7 pairwise) and is structurally
        # WORSE at scale: the window sorts the full n_docs×dim grid
        # while this aggregate runs on the smaller nonzero-counts
        # frame (contrast hybrid_search's dense tower, where the
        # window input IS the counts frame and the swap won 7/7).
        nrm_l = counts.groupBy("id").agg(
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("_n")
        )
        grid = (
            df.select(F.col(id_col).alias("id"))
            .distinct()
            .select(
                "id",
                F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("_bk"),
            )
            .select("id", F.col("_bk").cast("int").alias("bucket"))
        )
        return (
            grid.join(counts, (grid.id == counts.id) & (grid.bucket == counts.b), "left")
            .drop(counts.id)
            .join(nrm_l, "id", "left")
            .select(
                F.col("id").alias(id_col),
                "bucket",
                F.when(
                    F.coalesce("_n", F.lit(0.0)) > 0,
                    F.coalesce("c", F.lit(0.0)) / F.col("_n"),
                )
                .otherwise(F.lit(0.0))
                .alias("value"),
            )
        )
    # Left-join the bucket aggregates back onto the distinct input ids:
    # a doc whose text tokenizes to nothing emits no explode rows and
    # would otherwise vanish from the output instead of yielding the
    # documented zero vector (ADVICE r5).  The ids frame is one row
    # per doc and joins on the same key the aggregate shuffled on.
    ids = df.select(F.col(id_col).alias("id")).distinct()
    as_map = ids.join(
        counts.groupBy("id").agg(
            F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m")
        ),
        "id",
        "left",
    ).withColumn(
        "m",
        F.coalesce(
            "m",
            F.map_from_arrays(
                F.array().cast("array<int>"), F.array().cast("array<double>")
            ),
        ),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i.cast("int")], F.lit(0.0)),
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("_v"), lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return (
        as_map.withColumn("_v", dense)
        .withColumn("_n", nrm)
        .select(
            F.col("id").alias(id_col),
            F.when(
                F.col("_n") > 0,
                F.transform(F.col("_v"), lambda x: x / F.col("_n")),
            )
            .otherwise(F.col("_v"))
            .alias("embedding"),
        )
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a fixed term query —
    the lexical half of every retrieval stack (the dense half is
    ``hashed_embedding``/``ann_*``).

    Engine-portable scoring: the classic log-idf is replaced by its
    monotone rational core ``(N - df + 0.5) / (df + 0.5)`` — same
    ranking, no transcendental function whose last-ulp behavior could
    differ between engines — and the per-term contributions are
    decimal-summed (micro-unit convention, see plans/queries.py) so
    float summation order cannot flip the hash.

    Plan: one corpus scan explodes tokens; doc length comes from the
    same explode via a size() projection BEFORE the term filter (no
    second scan); the per-term doc frequencies are a tiny |terms|-row
    aggregate broadcast back; scoring is one (doc, term) aggregate
    and a TakeOrderedAndProject top-k.  No UDF, no driver collect.
    At 100 TB: the explode is map-side, both shuffles are keyed on
    (doc, term) / doc, and the broadcast is |query| rows.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(text_col)).alias("_t"),
        F.size(tokens(text_col)).alias("_dl"),
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n"),
                       (F.sum(F.size(tokens(text_col)))).alias("_toks"))
    return _bm25_scored(toks, n_docs, terms, k1, b, top_k, id_col)


def _bm25_scored(
    toks: DataFrame,
    n_docs: DataFrame,
    terms: list[str],
    k1: float,
    b: float,
    top_k: int,
    id_col: str,
) -> DataFrame:
    """BM25 scoring core over a prepared (_id, _t, _dl) token frame
    and a 1-row (_n, _toks) corpus-stats frame — split out (r11) so
    ``hybrid_search`` can feed both towers from ONE tokenized corpus
    scan instead of re-tokenizing per ranker."""
    tf = (
        toks.filter(F.col("_t").isin(terms))
        .groupBy("_id", "_t")
        .agg(F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl"))
    )
    # tf is tiny (docs containing a query term × |terms| rows) but
    # carries the corpus tokenize lineage, and BOTH the document-
    # frequency rollup and the scoring join consume it — eager
    # materialization tokenizes the corpus once (r12, guide §5;
    # bm25 1.33s → 1.21s at sf0.1, hybrid_search inherits the win)
    tf = tf.localCheckpoint(eager=True)
    dfreq = (
        tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "_t")
        .join(F.broadcast(n_docs))
        .withColumn("_avgdl", F.col("_toks") / F.col("_n"))
        .withColumn(
            "_idf", (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * F.col("_tf")
            / (
                F.col("_tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    dsum = F.sum(F.col("_contrib").cast("decimal(25,6)")).cast("double")
    return (
        scored.groupBy("_id")
        .agg(dsum.alias("score"), F.count(F.lit(1)).alias("n_terms_hit"))
        .select(F.col("_id").alias(id_col), "score", "n_terms_hit")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def hybrid_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    top_k: int = 20,
    rrf_k: int = 60,
    final_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    Büttcher, SIGIR 2009: "Reciprocal rank fusion outperforms Condorcet
    and individual rank learning methods"): fuse the LEXICAL ranker
    (``bm25_search``) with the DENSE ranker (cosine between the
    query's and each document's md5 feature-hashed embedding) as
    score(d) = Σ_r 1/(rrf_k + rank_r(d)) over the rankers that
    retrieved d in their top-``top_k``.  The standard two-tower
    fusion shape with zero trained components — both towers are
    already engine-portable, so the WHOLE hybrid is value-hash
    oracle-gated.

    Determinism/portability: ranks are integers; 1/(rrf_k + r) is the
    same IEEE double in any engine; each fused score is a sum of at
    most two such terms (one add — order-free).  The dense cosine
    decimal-sums its per-bucket products (both embeddings unit-L2
    from ``hashed_embedding``), so bucket order can't flip ranks.

    Plan shape at scale (r11): ONE tokenized corpus scan feeds both
    towers — the per-doc token arrays are checkpointed once and BM25
    (explode + term filter), the corpus stats (count + Σlen) and the
    dense bucket aggregates all read that materialization instead of
    re-tokenizing the corpus per ranker (three tokenize passes →
    one).  BM25 = tiny broadcast joins + TakeOrdered; dense = bucket
    aggregates + a broadcast join with the 64-row query vector; only
    the NONZERO buckets score (zero-bucket rows add exact decimal
    zeros, so values are unchanged vs the dense grid); fusion = a
    full-outer join of two ≤top_k-row frames.  No global window ever
    sees a corpus-sized frame — both rankers cut to top_k with
    distributed TakeOrdered BEFORE row_number runs on the bounded
    result."""
    terms = [t.lower() for t in query_terms]
    base = (
        df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_tk"))
        .withColumn("_dl", F.size("_tk"))
        .localCheckpoint(eager=True)
    )
    toks = base.select("_id", F.explode("_tk").alias("_t"), "_dl")
    n_docs = base.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_toks")
    )
    lex = _bm25_scored(toks, n_docs, terms, k1, b, top_k, id_col)
    from pyspark.sql import Window

    w_lex = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    lex_r = lex.select(
        F.col(id_col).alias("_id"),
        F.row_number().over(w_lex).alias("r_lex"),
    )

    counts = _feature_hash_counts(
        toks.filter(F.col("_t") != "").select(
            F.col("_id").alias("id"), F.col("_t").alias("t")
        ),
        dim=64,
        seed="hash-emb-v1",
        hash_fn="md5",
    )
    # unit-L2 normalization per hashed_embedding's long-layout
    # contract (value = c / sqrt(Σc²), zero-norm → 0.0): keep this
    # expression in lockstep with hashed_embedding — the docstring
    # promises the dense tower IS that embedding's cosine
    # r13 (guide §2.2): the norm rides a window over the counts frame
    # instead of a groupBy(id) aggregate + sort-merge join-back — the
    # window input IS the nonzero-bucket counts frame (≤ the old
    # join's left side at any scale), so this strictly drops the
    # aggregate exchange and the join (plan: 24 → 18 Exchange refs).
    # Values are identical: window SUM over the same rows, and Σc² of
    # integer-valued doubles is exact order-free addition (the
    # hashed_embedding long-layout precedent).  A/B at sf0.1:
    # 3.64s → 3.05s median, 7/7 pairwise, rows identical.
    w_id = Window.partitionBy("id")
    emb = counts.withColumn(
        "_n", F.sqrt(F.sum(F.col("c") * F.col("c")).over(w_id))
    ).select(
        F.col("id").alias("_eid"),
        F.col("b").alias("bucket"),
        F.when(F.col("_n") > 0, F.col("c") / F.col("_n"))
        .otherwise(F.lit(0.0))
        .alias("value"),
    )
    spark = df.sparkSession
    # r12 (guide §1.2 / §5): the query-side embedding is O(|terms|)
    # work on a 1-row frame, but routing it through the distributed
    # hashed_embedding pipeline cost ~4 exchanges+jobs per search.
    # Computed driver-side instead with the IDENTICAL md5 bucket/sign
    # idiom and IEEE double ops (sign sums are exact small integers,
    # so addition order cannot matter; sqrt/div are the same doubles
    # the JVM produces) — value-for-value equal to
    # hashed_embedding(layout="long"), pinned by
    # tests/test_textstats.py::test_hybrid_query_embedding_driver_twin.
    # Zero-valued buckets are omitted: their join terms added exact
    # decimal zeros to the cosine sum (the dense-grid note below).
    import hashlib as _hl
    import math as _math
    import re as _re

    _qnorm = _re.sub(r"\s+", " ", " ".join(query_terms).lower()).strip()
    _cnt: dict[int, float] = {}
    for _t in _qnorm.split(" "):
        if _t == "":
            continue
        _hx = _hl.md5(f"hash-emb-v1:{_t}".encode()).hexdigest()
        _b = int(_hx[:12], 16) % 64
        _s = -1.0 if int(_hx[12], 16) % 2 == 0 else 1.0
        _cnt[_b] = _cnt.get(_b, 0.0) + _s
    _nrm = _math.sqrt(sum(_c * _c for _c in _cnt.values()))
    _qrows = (
        [(int(_b), _c / _nrm) for _b, _c in sorted(_cnt.items()) if _c != 0.0]
        if _nrm > 0
        else []
    )
    qemb = spark.createDataFrame(_qrows, "bucket int, _qv double")
    dense = (
        emb.join(F.broadcast(qemb), "bucket")
        .groupBy(F.col("_eid").alias("_id"))
        .agg(
            F.sum(
                (F.col("value") * F.col("_qv")).cast("decimal(38,18)")
            )
            .cast("double")
            .alias("_cos")
        )
    )
    # zero-token docs have no bucket rows but the old dense-grid
    # layout still gave them cosine 0.0 (and thus top-k eligibility
    # on tiny corpora) — restore them with a doc-keyed left join so
    # the scan-sharing rewrite is value-identical
    # r12: ids are unique per the retrieval contract (duplicate ids
    # already merge upstream in every groupBy("_id")), so the old
    # ``.distinct()`` here was a corpus-wide exchange that never
    # changed a row — dropped (guide §2.4 "a distinct on data that is
    # already unique").
    dense = (
        base.select("_id")
        .join(dense, "_id", "left")
        .withColumn("_cos", F.coalesce("_cos", F.lit(0.0)))
    )
    dense_top = dense.orderBy(
        F.col("_cos").desc(), F.col("_id").asc()
    ).limit(top_k)
    w_d = Window.orderBy(F.col("_cos").desc(), F.col("_id").asc())
    dense_r = dense_top.select(
        "_id", F.row_number().over(w_d).alias("r_dense")
    )

    fused = (
        lex_r.join(dense_r, "_id", "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(rrf_k) + F.col("r_dense")), F.lit(0.0)
                ),
                6,
            ),
        )
        .orderBy(F.col("rrf").desc(), F.col("_id").asc())
        .limit(final_k)
    )
    w_f = Window.orderBy(F.col("rrf").desc(), F.col("_id").asc())
    return fused.select(
        F.col("_id").alias(id_col),
        F.row_number().over(w_f).cast("long").alias("rank"),
        "rrf",
        "r_lex",
        "r_dense",
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    coverage: float = 0.9,
) -> DataFrame:
    """Cumulative vocabulary coverage — the tokenizer-budget planning
    table: tokens ranked by corpus frequency with each rank's
    cumulative share of total token mass, plus the flag marking the
    smallest prefix that covers ``coverage`` of the corpus.  The
    answer to "how big must the vocab be to cover 90% of tokens?" is
    ``max(rank) WHERE needed``.

    Plan: one corpus explode → token-frequency aggregate (map-side
    combined), then ONE global window over the |vocab|-sized
    frequency table (not the corpus) for rank + running sum.  The
    deterministic (freq desc, token asc) order makes ranks and the
    cumulative sum engine-portable; the 1-row total joins back as a
    broadcast.  At 100 TB the window input is the vocabulary —
    orders of magnitude smaller than the corpus; cap it with a
    HAVING-style frequency floor upstream if even that is too wide.
    """
    from pyspark.sql import Window

    freq = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    tot = freq.agg(F.sum("freq").alias("_tot"))
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        freq.join(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum_freq", F.sum("freq").over(w))
        .select(
            "rank",
            "token",
            "freq",
            F.round(F.col("cum_freq") / F.col("_tot"), 6).alias("cum_share"),
            # needed = ranks up to and including the first that
            # reaches the coverage target
            (
                F.lag(F.col("cum_freq"), 1, 0).over(w) / F.col("_tot")
                < F.lit(coverage)
            ).alias("needed"),
        )
    )


def zipf_fit(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Zipf's-law fit over the corpus token distribution: OLS of
    ln(freq) on ln(rank) — slope ≈ -1 for natural text, and the
    deviation is a fast corpus-health signal (synthetic/templated
    text flattens the head, boilerplate steepens it).

    One corpus scan (explode → map-side-combined token aggregate),
    then ln/rank and the five OLS sufficient statistics over the
    VOCABULARY-sized frequency table — like ``vocab_coverage``, the
    global rank window's input is |vocab|, orders of magnitude below
    the corpus; raise ``min_freq`` to shrink it further at scale.
    x = ln(rank), y = ln(freq) as doubles; the sufficient statistics
    use the decimal-sum convention (plans/queries.py) so both
    engines round each term to 6 dp before summing — partition-order
    independent and engine-portable.
    """
    from pyspark.sql import Window

    freq = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    xy = freq.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
        F.col("freq"),
    )

    def _dsum(c: Column) -> Column:
        return F.sum(c.cast("decimal(25,6)")).cast("double")

    stats = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("x") * F.col("y")).alias("sxy"),
        _dsum(F.col("x") * F.col("x")).alias("sxx"),
        _dsum(F.col("y") * F.col("y")).alias("syy"),
        F.sum("freq").alias("n_tokens"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r_den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return stats.select(
        F.col("n").cast("long").alias("n_types"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r_num / r_den, 6).alias("r"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Top-k token-bigram collocations by pointwise mutual
    information — PMI(x,y) = ln( p(xy) / (p(x)·p(y)) ) with
    p(xy) = c_xy / n_pairs and p(w) = c_w / n_tokens (natural log,
    rounded to 6), gated by a minimum pair count so rare
    coincidences don't dominate.  The collocation miner behind
    phrase vocabularies and tokenizer merge seeding (reference
    parity: keyword analytics, extractor.py keyword path).

    Scale shape: one partial-aggregated shuffle for the unigram
    counts, one for the bigram counts (pairs projected AFTER the
    positional explode — the shingle_hash_rows codegen discipline),
    then the unigram table (vocab-sized, ≪ corpus) is broadcast
    twice onto the pair counts and the two scalar totals arrive via
    a broadcast single-row cross join — no shuffle after the counts.
    The final ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition heaps, no global sort).
    """
    toks = tokens(text_col)
    base = df.select(toks.alias("_toks"), F.size(toks).alias("_n"))
    uni = (
        base.select(F.explode("_toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_term"))
    )
    pairs = (
        base.filter(F.col("_n") >= 2)
        .select(
            F.explode(F.sequence(F.lit(0), F.col("_n") - 2)).alias("_i"),
            "_toks",
        )
        .select(
            F.get(F.col("_toks"), F.col("_i").cast("int")).alias("w1"),
            F.get(F.col("_toks"), (F.col("_i") + 1).cast("int")).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .filter(F.col("c_pair") >= min_count)
    )
    tot = base.agg(
        F.sum(F.col("_n").cast("long")).alias("n_tokens"),
        F.sum(F.greatest(F.col("_n") - 1, F.lit(0)).cast("long")).alias(
            "n_pairs"
        ),
    )
    p_xy = F.col("c_pair") / F.col("n_pairs").cast("double")
    p_x = F.col("c1") / F.col("n_tokens").cast("double")
    p_y = F.col("c2") / F.col("n_tokens").cast("double")
    return (
        pairs.join(
            F.broadcast(
                uni.select(
                    F.col("term").alias("w1"), F.col("c_term").alias("c1")
                )
            ),
            "w1",
        )
        .join(
            F.broadcast(
                uni.select(
                    F.col("term").alias("w2"), F.col("c_term").alias("c2")
                )
            ),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.concat("w1", F.lit(" "), "w2").alias("bigram"),
            F.col("c_pair").alias("n"),
            F.round(F.log(p_xy / (p_x * p_y)), 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("bigram").asc())
        .limit(k)
    )


def rouge_n(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
    n: int = 2,
) -> DataFrame:
    """ROUGE-N overlap scoring over paired texts — the n-gram
    recall/precision/F1 used to audit summarization/SFT outputs
    against references, and as a cheap contamination double-check on
    suspected (candidate, source) pairs.  Per pair:

        n_match = Σ_g min(count_cand(g), count_ref(g))   (clipped)
        rouge_p = n_match / n_cand,  rouge_r = n_match / n_ref,
        rouge_f = 2·P·R / (P + R)

    counts are CLIPPED multiset overlap (the ROUGE paper's
    definition) — a candidate repeating one reference n-gram ten
    times only scores it min(10, ref count) times.  Pairs where
    either side has fewer than ``n`` tokens report zero counts on
    that side and NULL metrics from the 0/0 divisions.

    Scale shape (r12): the two sides are STACKED into one tagged
    stream off a single scan of ``pairs`` — explode a 2-struct array
    per pair, tokenize each side once — then ONE partial-aggregated
    count on (pair, gram) carries per-side conditional counts, and
    ONE per-pair rollup produces n_match/n_cand/n_ref together
    (Σ least(c_cand, c_ref) ≡ the inner-join-of-matched-grams sum,
    because an unmatched gram contributes least(c, 0) = 0).  The
    pre-r12 shape ran a gram-count pass per side plus an inner join
    plus three per-pair aggregates joined back onto the pair
    universe — five corpus-lineage evaluations and three broadcast
    joins collapse to zero joins and two shuffles.  A NULL-gram
    sentinel row per gram-less side (explode_outer over the
    position sequence) keeps every pair in the rollup, restoring
    the zero counts the old left joins provided.
    """
    from ..functions.text import tokens

    stacked = pairs.select(
        F.col(pair_col).alias("pair"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("side"), F.col(cand_col).alias("txt")
                ),
                F.struct(
                    F.lit(1).alias("side"), F.col(ref_col).alias("txt")
                ),
            )
        ).alias("_s"),
    ).select("pair", F.col("_s.side").alias("side"), F.col("_s.txt").alias("txt"))
    # drop the split-tokenizer's empty-text artifact ([""]) so an
    # empty side scores 0 n-grams, not one empty unigram
    toks = F.filter(tokens("txt"), lambda x: x != "")
    staged = stacked.select("pair", "side", toks.alias("_t")).withColumn(
        "_n", F.size("_t")
    )
    # explode-the-positions-THEN-project: the n-gram string is a
    # plain codegen concat after the explode; the transform+slice
    # array form ran on the interpreted expression walker (same
    # rewrite as shingle_hash_rows — measured ~4x on this operator
    # at sf0.1)
    gram = F.concat_ws(
        " ",
        *[F.get(F.col("_t"), (F.col("_i") + k).cast("int")) for k in range(n)],
    )
    rows = staged.select(
        "pair",
        "side",
        F.explode_outer(
            F.when(F.col("_n") >= n, F.sequence(F.lit(0), F.col("_n") - n))
        ).alias("_i"),
        "_t",
    ).select(
        "pair",
        "side",
        F.when(F.col("_i").isNotNull(), gram).alias("gram"),
    )
    counts = rows.groupBy("pair", "gram").agg(
        F.count_if(
            (F.col("side") == 0) & F.col("gram").isNotNull()
        ).alias("c_cand"),
        F.count_if(
            (F.col("side") == 1) & F.col("gram").isNotNull()
        ).alias("c_ref"),
    )
    per_pair = counts.groupBy("pair").agg(
        F.sum(F.least("c_cand", "c_ref")).alias("n_match"),
        F.sum("c_cand").alias("n_cand"),
        F.sum("c_ref").alias("n_ref"),
    )
    # ANSI-safe divisions: a side with zero n-grams yields NULL P/R;
    # zero matches over non-empty sides is a defined 0.0 F-score.
    p = F.when(F.col("n_cand") > 0, F.col("n_match") / F.col("n_cand"))
    r_ = F.when(F.col("n_ref") > 0, F.col("n_match") / F.col("n_ref"))
    f = (
        F.when(
            (F.col("n_cand") > 0)
            & (F.col("n_ref") > 0)
            & (F.col("n_match") > 0),
            2.0
            * (F.col("n_match") / F.col("n_cand"))
            * (F.col("n_match") / F.col("n_ref"))
            / (
                F.col("n_match") / F.col("n_cand")
                + F.col("n_match") / F.col("n_ref")
            ),
        )
        .when((F.col("n_cand") > 0) & (F.col("n_ref") > 0), F.lit(0.0))
    )
    return (
        per_pair.select(
            F.col("pair").alias(pair_col),
            F.col("n_match").cast("long").alias("n_match"),
            F.col("n_cand").cast("long").alias("n_cand"),
            F.col("n_ref").cast("long").alias("n_ref"),
        )
        .withColumn("rouge_p", F.round(p, 6))
        .withColumn("rouge_r", F.round(r_, 6))
        .withColumn("rouge_f", F.round(f, 6))
    )


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document.

    Classic readability filtering signal for training-data curation
    (too-low ease ≈ boilerplate/code/garbled text; grade bands drive
    curriculum ordering).  Syllables use the standard vowel-group
    heuristic — every maximal run of [aeiouy] in a lowercased word is
    one syllable — computed corpus-portably as
    ``regexp_count(lower(text), '[aeiouy]+')`` so the DuckDB oracle
    applies the IDENTICAL definition.  Words are maximal [a-z] runs
    after lowercasing, sentences are [.!?] runs (min 1 when any word
    exists).  Vowel-less texts score 0 syllables; wordless texts get
    NULL scores rather than a division blow-up.

    Scale shape: one codegen projection over the corpus scan — three
    ``regexp_count`` calls and closed-form arithmetic; no shuffle, no
    Python.  Scores round to 4 decimals.
    """
    lowered = F.lower(F.col(text_col))
    words = F.regexp_count(lowered, F.lit("[a-z]+"))
    syllables = F.regexp_count(lowered, F.lit("[aeiouy]+"))
    sentences = F.greatest(F.regexp_count(lowered, F.lit("[.!?]+")), F.lit(1))
    wps = words / sentences
    spw = syllables / words
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.when(
            words > 0,
            F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4),
        ).alias("flesch_ease"),
        F.when(
            words > 0,
            F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4),
        ).alias("fk_grade"),
    )

def byte_stats(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source", "lang"),
) -> DataFrame:
    """Per-group byte/char/token accounting — the shard-sizing and
    multilingual-balance table a 100 TB pipeline plans exports with:
    UTF-8 bytes (what disk and network bill), characters (what
    context windows bill), whitespace tokens, and bytes-per-token
    (the multibyte-script cost multiplier; CJK corpora run ~3× the
    bytes of English at equal token budgets).

    One codegen projection + one partial-aggregated shuffle on the
    (low-cardinality) group key; no UDF, no second pass.
    """
    safe = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        *group_cols,
        F.octet_length(safe).alias("_b"),
        F.length(safe).alias("_c"),
        F.size(tokens(safe)).alias("_t"),
    )
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_b").cast("long").alias("total_bytes"),
        F.sum("_c").cast("long").alias("total_chars"),
        F.sum("_t").cast("long").alias("total_tokens"),
        # exact-integer ratio: the double division is bit-identical in
        # any IEEE engine, so no rounding (which would only add
        # half-even-vs-half-up midpoint risk)
        (F.sum("_b").cast("double") / F.sum("_t")).alias("bytes_per_token"),
    )


def hapax_stats(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-source vocabulary concentration: token occurrences, type
    count, hapax legomena (types seen exactly once) and hapax
    fraction.  A high hapax fraction flags OCR noise, garbled
    encodings, or ID-heavy boilerplate inside one source — a
    corpus-level complement to the per-document quality scores.

    Scale shape: explode → TWO partial-aggregated shuffles, first on
    (group, token) for per-type counts, then on the group for the
    rollup — the same two-stage discipline as duplicate_spans; a
    COUNT(DISTINCT) in one agg would Expand every token row instead.
    """
    per_type = (
        df.select(
            F.col(group_col).alias("grp"),
            tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
        )
        .select("grp", F.explode("_t").alias("tok"))
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        per_type.groupBy("grp")
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum((F.col("_c") == 1).cast("long")).alias("n_hapax"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "n_types",
            "n_hapax",
            # exact-integer ratio — bit-identical across engines unrounded
            (F.col("n_hapax").cast("double") / F.col("n_types")).alias(
                "hapax_frac"
            ),
        )
    )


def class_tfidf(
    df: DataFrame,
    class_col: str,
    text_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Class-based TF-IDF top terms (the BERTopic labeling step,
    Grootendorst 2022): treat each class (source, cluster id, topic)
    as ONE concatenated document and score its terms by

        c-TF-IDF(t, c) = (count(t, c) / n_c) · ln(1 + A / f_t)

    with n_c the class's token total, f_t the term's corpus count and
    A the mean tokens per class — the terms that characterize a class
    AGAINST the rest of the corpus, unlike per-document
    ``tfidf_top_terms``.  The canonical use here: label k-means /
    IVF embedding clusters or audit what a source actually contains.
    Returns (class, term, n, score, rank) for each class's ``top_k``
    terms (ties → term ascending, deterministic).

    Scale shape: one explode + THREE partial-aggregated shuffles
    ((class, term), class, term) — all keyed, no row blowup; the
    class-size and mean frames are broadcast-sized; final top-k is a
    per-class window over the (class, term) aggregate, vocabulary-
    bounded, never corpus-bounded."""
    from pyspark.sql import Window

    t = df.select(
        F.col(class_col).alias("class"), F.explode(tokens(text_col)).alias("term")
    )
    # ct (classes × vocab, ≪ corpus) feeds cls_tot, term_tot AND the
    # scored join.  AQE's stage cache reuses the ct exchange for
    # cls_tot/scored, but term_tot's twin subtree canonicalizes
    # DIFFERENTLY (the inner join on class infers isnotnull(class)
    # onto the other branches only), so the corpus tokenize ran
    # twice at runtime; one eager materialization runs it once
    # (r12, guide §5 — A/B 1.09s → 0.86s at sf0.1, 7/7 pairwise).
    ct = (
        t.groupBy("class", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    cls_tot = ct.groupBy("class").agg(F.sum("n").alias("_n_class"))
    avg_a = cls_tot.agg(
        (F.sum("_n_class") / F.count(F.lit(1))).alias("_A")
    )
    # r13: the corpus term total is a SUM window over ct (the window
    # input is the join's own streamed side — the tfidf_top_terms
    # rule), replacing the term_tot aggregate + join-back.  A/B at
    # sf0.1: 1.40s → 1.31s median, 6/7 pairwise, rows identical.
    with_ft = ct.withColumn(
        "_f_t", F.sum("n").over(Window.partitionBy("term"))
    )
    scored = (
        with_ft.join(F.broadcast(cls_tot), "class")
        .crossJoin(F.broadcast(avg_a))
        .withColumn(
            "score",
            F.round(
                (F.col("n") / F.col("_n_class"))
                * F.log(F.lit(1.0) + F.col("_A") / F.col("_f_t")),
                6,
            ),
        )
    )
    w = Window.partitionBy("class").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("class", "term", "n", "score", "rank")
    )
