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
# types}.txt).  Bundled fixtures live in sources/lookups/ in the same
# CODE\tLABEL TSV format — hand-picked subsets of the public CAMEO /
# FIPS taxonomies, so load_lookup_tsv round-trips the reference's file
# shape end-to-end.
LOOKUP_NAMES = ("cameo", "country", "ethnic", "groups", "religion", "types")


def lookup_path(name: str) -> str:
    """Filesystem path of a bundled lookup fixture."""
    import os

    if name not in LOOKUP_NAMES:
        raise ValueError(f"unknown lookup {name!r}; expected one of {LOOKUP_NAMES}")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(pkg_root, "sources", "lookups", f"{name}.txt")


def load_lookup(spark: SparkSession, name: str) -> DataFrame:
    """One bundled lookup table as a (code, label) DataFrame."""
    return load_lookup_tsv(spark, lookup_path(name))


def load_all_lookups(spark: SparkSession) -> dict[str, DataFrame]:
    """All six lookup dimensions, keyed by name.  Each is dimension-
    sized (tens of rows) — broadcast them into fact joins."""
    return {n: load_lookup(spark, n) for n in LOOKUP_NAMES}


def lookup_rows(name: str) -> list[tuple[str, str]]:
    """Driver-side (code, label) rows of a bundled lookup — the
    oracle-SQL side reads the same file so the Spark query and its
    DuckDB twin can never drift from each other."""
    import csv

    with open(lookup_path(name), newline="") as f:
        rdr = csv.reader(f, delimiter="\t")
        next(rdr)  # header
        return [(r[0], r[1]) for r in rdr if r]
