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
