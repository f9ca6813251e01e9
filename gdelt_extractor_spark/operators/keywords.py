"""Keyword frequency — Spark re-expression of the reference's
``get_keywords`` + Counter wordcloud prep
(reference/extractor/extractor.py:398-406, the_words.py:28-30):
pull the keywords column, split on ';', strip, count frequencies,
drop an ignore-list.

Here the explode+groupBy runs distributed with map-side partial
aggregation; the reference pulls every keyword row to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyword_freq(
    enriched: DataFrame,
    keywords_col: str = "keywords",
    sep: str = "; ",
    ignore: Sequence[str] = ("state",),
    min_count: int = 1,
) -> DataFrame:
    """(keyword, freq) from a '; '-joined keywords column.

    ``ignore`` mirrors the_words.py:11 (the reference drops
    "state").  Empty strings (docs with no keywords) are dropped as
    the reference's ``if r[0]`` does.
    """
    kw = (
        enriched.select(F.explode(F.split(F.col(keywords_col), sep)).alias("keyword"))
        .withColumn("keyword", F.trim("keyword"))
        .filter((F.col("keyword") != "") & ~F.col("keyword").isin(*ignore))
    )
    return (
        kw.groupBy("keyword")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
