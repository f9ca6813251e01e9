"""BPE tokenizer training and application (Sennrich et al. 2016) —
the full pipeline ``textstats.bpe_pair_counts`` previews one step of.

Scale decomposition (the part that matters at 100 TB):

1. **Word-frequency aggregate — distributed.** The only pass over
   corpus bytes: tokenize → groupBy word → count.  Zipf makes the
   resulting vocabulary orders of magnitude smaller than the corpus,
   and it is the COMPLETE sufficient statistic for BPE training —
   merges depend on nothing else.
2. **Merge loop — driver-side over the bounded vocab.** Classic BPE
   trainers (subword-nmt, HuggingFace) train from exactly this
   word→count dict; the loop is O(merges · vocab) on a few MB of
   driver memory.  Running it distributed would pay a full shuffle
   per merge for work a laptop does in seconds — the same
   bounded-driver trade as the IVF/PQ quantizer fits, with
   ``max_vocab_rows`` as the explicit cap (most-frequent rows kept,
   deterministic (freq desc, word asc) order).
3. **Encode — distributed.** Learned merges broadcast to an Arrow
   UDF that applies them in rank order per word; one scan, no
   shuffle.  A word-level LRU memoizes within each batch (Zipf again:
   a batch's distinct words ≪ its tokens).

Determinism: pair selection is (count desc, pair asc) — the same
total order everywhere in this repo — so the merge list is a pure
function of the word-frequency table, which is itself
partition-independent.
"""

from __future__ import annotations

from collections import Counter


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

_EOW = "</w>"  # end-of-word marker, as in the original BPE paper


def word_frequencies(
    df: DataFrame, text_col: str, max_vocab_rows: int = 200_000
) -> DataFrame:
    """The corpus's word-frequency table — BPE training's sufficient
    statistic.  One distributed aggregate; the ``max_vocab_rows`` cap
    keeps the driver transfer bounded (deterministic most-frequent
    prefix, (freq desc, word asc))."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.col("f").desc(), F.col("w").asc())
        .limit(max_vocab_rows)
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == pair:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    max_vocab_rows: int = 200_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge list [(left, right), ...]; stops early when no pair
    occurs twice."""
    vocab_rows = word_frequencies(df, text_col, max_vocab_rows).collect()
    vocab: dict[tuple, int] = {
        tuple(r.w) + (_EOW,): r.f for r in vocab_rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair — matching the repo's (count desc, key asc)
        # convention
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        if pairs[best_pair] < 2:
            break
        merges.append(best_pair)
        vocab = {
            _merge_word(syms, best_pair): f for syms, f in vocab.items()
        }
    return merges


def _bpe_encode_udf(merges: list[tuple[str, str]]):
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        # plain-dict word memo (lru_cache on a closure doesn't
        # pickle); bounded: cleared when it outgrows the cap
        memo: dict[str, tuple] = {}

        def encode_word(w: str) -> tuple:
            got = memo.get(w)
            if got is not None:
                return got
            syms = tuple(w) + (_EOW,)
            while len(syms) > 1:
                # lowest-rank (earliest-learned) applicable merge
                # first — the standard BPE application order
                cand = [
                    ranks[(syms[i], syms[i + 1])]
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks
                ]
                if not cand:
                    break
                syms = _merge_word(syms, merges[min(cand)])
            if len(memo) > 65536:
                memo.clear()
            memo[w] = syms
            return syms

        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return encode


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply learned merges to the corpus: (id, subword tokens,
    n_subwords).  One scan, one Arrow pass, no shuffle; the merge
    table rides to executors inside the UDF closure (KBs)."""
    enc = _bpe_encode_udf(merges)
    # match word_frequencies' tokenization (normalize → split) by
    # normalizing before the UDF so encode sees the same words
    from ..functions.text import normalize_text

    normed = df.select(
        F.col(id_col).alias("doc_id"), normalize_text(text_col).alias("_t")
    )
    return normed.select(
        "doc_id",
        enc(F.col("_t")).alias("subwords"),
    ).withColumn("n_subwords", F.size("subwords").cast("long"))
