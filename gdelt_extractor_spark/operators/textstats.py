"""Text analysis operators for training-data curation (SURVEY.md §2c
31-34): language ID, quality scoring, token stats, fingerprinting.
All pure JVM expressions — these run at scan speed on 100 TB.
"""

from __future__ import annotations

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


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
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
    return base.select("doc_id", pred.alias("lang_pred"))


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


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
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
