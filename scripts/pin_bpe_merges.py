#!/usr/bin/env python
"""Regenerate the data-pinned BPE merge tables (r11 graduation of
bpe_subwords from rows-only to hash-gated).

``bpe_train``'s merge loop is iterative — not SQL-expressible — but
the learned merge LIST is a deterministic pure function of the
corpus word-frequency table, so the DuckDB oracle can hash-gate the
FULL train+encode pipeline by inlining the merge literals and
replaying only the (closed-form) encode step: 50 greedy left-to-right
``replace()`` calls over a separator-wrapped symbol string, applied
in rank order.  Rank-order single-pass application is equivalent to
the production kernel's iterative lowest-applicable-rank loop because
a merge at rank j only ever CREATES pairs of rank > j (a new symbol
participates only in pairs learned after it existed) and never forms
a new adjacency between two pre-existing symbols.

Like scripts/pin_kmeans_centroids.py, the pins are keyed by a DATA
FINGERPRINT the oracle recomputes inside the query (COUNT + total
text length of the documents table): the oracle carries every pinned
merge set and selects the matching fingerprint, so one SQL string is
correct at every pinned SF and fails LOUDLY (all-zero subword counts
vs the live-trained Spark side) on unpinned/regenerated data.

Certification at record time: the merges stored here ARE a fresh
``bpe_train`` refit over each SF's documents table — run after any
testdata regeneration:
    python scripts/pin_bpe_merges.py
writes gdelt_extractor_spark/operators/_bpe_pins.py.
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

N_MERGES = 50  # must match __spark_entry__._bpe_subwords


def fingerprint(sf_dir: str) -> str:
    from gdelt_extractor_spark.operators.tokenizer import DOC_FINGERPRINT_SQL

    con = duckdb.connect()
    return con.sql(
        f"SELECT {DOC_FINGERPRINT_SQL} FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]


def main() -> None:
    from gdelt_extractor_spark.operators.tokenizer import bpe_train
    from gdelt_extractor_spark.session import get_spark
    from gdelt_extractor_spark.sources.tables import load_table

    spark = get_spark("pin-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    pins: dict[str, list[tuple[str, str]]] = {}
    for sf_dir in SF_DIRS:
        fp = fingerprint(sf_dir)
        docs = load_table(spark, sf_dir, "documents")
        # the oracle's encode replay wraps symbols in chr(31)
        # separators — a corpus containing that control char would
        # break pattern uniqueness, so refuse to pin one
        n_bad = docs.filter(docs.text.contains(chr(31))).count()
        assert n_bad == 0, f"{sf_dir}: {n_bad} docs contain chr(31)"
        merges = bpe_train(docs, "text", n_merges=N_MERGES)
        pins[fp] = [(left, right) for left, right in merges]
        print(f"{sf_dir}: fingerprint {fp}, {len(merges)} merges")

    out = os.path.join(
        REPO, "gdelt_extractor_spark", "operators", "_bpe_pins.py"
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Data-pinned BPE merge tables (GENERATED — do not edit).\n\n'
            "Regenerate with scripts/pin_bpe_merges.py after any testdata\n"
            "change.  Keys are the documents-table fingerprint the oracle\n"
            "recomputes in SQL; values are the ordered merge lists a fresh\n"
            "bpe_train(n_merges=%d) refit produced at record time.\n"
            '"""\n\nN_MERGES = %d\n\nPINS = %r\n' % (N_MERGES, N_MERGES, pins)
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
