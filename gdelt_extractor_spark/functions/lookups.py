"""Code→label lookup dimensions, joined via broadcast.

The reference ships a CAMEO root-code dict
(reference/extractor/schema.py:153-174) and six TSV lookup tables
(reference/extractor/lookups/*.txt) that it joins driver-side.  Here
lookups are small DataFrames broadcast into the join so the fact scan
never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# CAMEO root event codes (public CAMEO taxonomy; mirrors the dict at
# reference/extractor/schema.py:153-174).
CAMEO_ROOT = {
    "1": "Public Comment",
    "2": "Appeal",
    "3": "Cooperate",
    "4": "Consult",
    "5": "Diplomatic",
    "6": "Material",
    "7": "Aid",
    "8": "Yield",
    "9": "Investigate",
    "10": "Demand",
    "11": "Disapprove",
    "12": "Reject",
    "13": "Threaten",
    "14": "Protest",
    "15": "Force Posture",
    "16": "Reduce Relations",
    "17": "Coerce",
    "18": "Assault",
    "19": "Fight",
    "20": "Mass Violence",
}

# Dimension for the synthetic events table (event_type → rollup
# category + a unit weight), playing the role the CAMEO quad-class
# rollup plays for GDELT events.
EVENT_TYPE_DIM = [
    ("click", "engagement", 1.0),
    ("view", "engagement", 0.5),
    ("purchase", "commerce", 5.0),
    ("signup", "growth", 3.0),
    ("error", "reliability", -1.0),
]


def event_type_dim_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        EVENT_TYPE_DIM, "event_type string, category string, weight double"
    )


def cameo_root_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(CAMEO_ROOT.items()), "root_code string, root_label string"
    )


def load_lookup_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-style CODE\\tLABEL lookup file."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .schema("CODE string, LABEL string")
        .csv(path)
        .select(F.col("CODE").alias("code"), F.col("LABEL").alias("label"))
    )


# The six code→label lookup tables the reference ships
# (reference/extractor/lookups/{cameo,country,ethnic,groups,religion,
# types}.txt).  Bundled copies live in sources/lookups/ in the same
# CODE\tLABEL TSV format — the COMPLETE public CAMEO / FIPS taxonomies
# (cameo 310, country 261, ethnic 646, groups 117, religion 31,
# types 40 data rows), so real GDELT actor codes resolve.
LOOKUP_NAMES = ("cameo", "country", "ethnic", "groups", "religion", "types")

# Data-row counts of the bundled taxonomies (header excluded) — the
# parity contract with the reference's lookup files, pinned by
# tests/test_sources_gdelt.py.
LOOKUP_ROW_COUNTS = {
    "cameo": 310,
    "country": 261,
    "ethnic": 646,
    "groups": 117,
    "religion": 31,
    "types": 40,
}


def lookup_path(name: str) -> str:
    """Filesystem path of a bundled lookup table."""
    import os

    if name not in LOOKUP_NAMES:
        raise ValueError(f"unknown lookup {name!r}; expected one of {LOOKUP_NAMES}")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(pkg_root, "sources", "lookups", f"{name}.txt")


def load_lookup(spark: SparkSession, name: str) -> DataFrame:
    """One bundled lookup table as a (code, label) dimension with MAP
    semantics: exactly one row per code (keep-first in file order).

    The public taxonomy files contain a handful of duplicate codes
    (e.g. types.txt lists UIS twice, groups.txt reuses CEM for two
    bodies); a code-keyed dimension join must never fan out the fact
    table, so duplicates collapse here.  The files are dimension-sized
    (≤646 rows), so the keep-first pass runs driver-side where file
    order is well-defined; callers broadcast the result into joins.
    ``load_lookup_tsv`` remains the raw distributed reader for
    arbitrary-size code→label files.
    """
    return spark.createDataFrame(lookup_rows(name), "code string, label string")


def load_all_lookups(spark: SparkSession) -> dict[str, DataFrame]:
    """All six lookup dimensions, keyed by name.  Each is dimension-
    sized (hundreds of rows) — broadcast them into fact joins."""
    return {n: load_lookup(spark, n) for n in LOOKUP_NAMES}


def lookup_rows(name: str, *, dedup: bool = True) -> list[tuple[str, str]]:
    """Driver-side (code, label) rows of a bundled lookup — the
    oracle-SQL side reads the same file so the Spark query and its
    DuckDB twin can never drift from each other.

    ``dedup=True`` (default) applies the same keep-first-per-code map
    semantics as ``load_lookup``; ``dedup=False`` returns the raw file
    rows (duplicates included).
    """
    import csv

    with open(lookup_path(name), newline="") as f:
        rdr = csv.reader(f, delimiter="\t")
        next(rdr)  # header
        rows = [(r[0], r[1]) for r in rdr if r]
    if not dedup:
        return rows
    seen: set[str] = set()
    out: list[tuple[str, str]] = []
    for code, label in rows:
        if code not in seen:
            seen.add(code)
            out.append((code, label))
    return out
