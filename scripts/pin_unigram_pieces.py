#!/usr/bin/env python
"""Regenerate the data-pinned unigram-LM piece tables (r11 — the
SentencePiece-style sibling of scripts/pin_bpe_merges.py).

``unigram_train``'s EM loop is iterative — not SQL-expressible — but
the learned piece table is a deterministic pure function of the
word-frequency table, so the DuckDB oracle hash-gates train+encode by
inlining the (piece, score_u) literals and replaying only the Viterbi
encode: an exact 64-bit integer DP (score_u·2^20 − n_pieces combined
objective) via a list-state recursive CTE.  Pins are keyed by the
same documents-table fingerprint as the BPE pins; a fingerprint miss
yields all-zero piece counts vs the live-trained Spark side (the
loud-failure contract).

Run after any testdata regeneration:
    python scripts/pin_unigram_pieces.py
writes gdelt_extractor_spark/operators/_unigram_pins.py.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

def main() -> None:
    from gdelt_extractor_spark.operators.tokenizer import (
        DOC_FINGERPRINT_SQL,
        unigram_train,
    )
    from gdelt_extractor_spark.session import get_spark
    from gdelt_extractor_spark.sources.tables import load_table

    spark = get_spark("pin-unigram")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    pins: dict[str, list[tuple[str, int]]] = {}
    for sf_dir in SF_DIRS:
        fp = con.sql(
            f"SELECT {DOC_FINGERPRINT_SQL} FROM '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
        docs = load_table(spark, sf_dir, "documents")
        pieces = unigram_train(docs, "text")
        pins[fp] = [(p, int(s)) for p, s in pieces]
        print(f"{sf_dir}: fingerprint {fp}, {len(pieces)} pieces")

    out = os.path.join(
        REPO, "gdelt_extractor_spark", "operators", "_unigram_pins.py"
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Data-pinned unigram-LM piece tables (GENERATED — do not'
            " edit).\n\nRegenerate with scripts/pin_unigram_pieces.py"
            " after any testdata\nchange.  Keys are the documents-table"
            " fingerprint the oracle\nrecomputes in SQL; values are the"
            " (piece, log-prob micro-unit)\ntables a fresh"
            " unigram_train() refit produced at record time.\n"
            '"""\n\nPINS = %r\n' % (pins,)
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
