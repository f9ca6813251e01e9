"""Market-basket affinity: pairwise association rules at scale.

The reference's analytics stack (pandas frames queried ad hoc —
reference/gdelt_extractor/extractor.py pushes everything to
PostgreSQL) has no co-occurrence mining; this is part of the §2c
scale family: item↔item affinity is the standard first analytic over
any (basket, item) interaction log — orders×parts here, doc×theme or
user×source in the GDELT/corpus setting.

Scale shape (100 TB posture): ONE shuffle on the basket key builds
per-basket pairs (work bounded by Σ n_i², controlled by
``max_basket_items``), one aggregate on the (antecedent, consequent)
pair key, and item marginals joined back — AQE broadcasts the
marginal side when it is small.  No all-pairs item join ever forms:
candidate pairs only materialize where the two items actually
co-occur.  Hub baskets (carts with thousands of items) are the skew
risk; the cap drops them loudly into the audit columns rather than
silently squaring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Mine pairwise association rules from a (basket, item) frame.

    Returns one row per UNORDERED co-occurring item pair that appears
    in at least ``min_pair_count`` baskets, with both rule directions'
    confidences on the same row:

    (antecedent, consequent, pair_baskets, antecedent_baskets,
     consequent_baskets, support, confidence, reverse_confidence,
     lift) — antecedent < consequent lexicographically; ``support`` =
    pair/N, ``confidence`` = P(consequent|antecedent),
    ``lift`` = support / (P(a)·P(c)), all rounded to 6 decimals.

    ``max_basket_items`` (optional) drops baskets with more distinct
    items than the cap BEFORE pairing — the standard guard against
    quadratic hub baskets; None keeps exact semantics (the DuckDB
    oracle twin runs uncapped).
    """
    pres = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).cast("string").alias("item")
    ).filter(F.col("basket").isNotNull() & F.col("item").isNotNull()).distinct()

    if max_basket_items is not None:
        sizes = pres.groupBy("basket").agg(F.count(F.lit(1)).alias("_n"))
        pres = (
            pres.join(sizes.filter(F.col("_n") <= max_basket_items), "basket", "left_semi")
        )

    # basket total stays IN-PLAN (1-row broadcast) — no eager
    # driver count, no extra scan of the distinct build
    n_b = pres.agg(
        F.count_distinct("basket").cast("double").alias("_nb")
    )

    item_counts = pres.groupBy("item").agg(F.count(F.lit(1)).alias("item_baskets"))

    lhs = pres.withColumnRenamed("item", "antecedent")
    rhs = pres.withColumnRenamed("item", "consequent")
    pairs = (
        lhs.join(rhs, "basket")
        .filter(F.col("antecedent") < F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_pair_count)
    )

    a_counts = item_counts.withColumnsRenamed(
        {"item": "antecedent", "item_baskets": "antecedent_baskets"}
    )
    c_counts = item_counts.withColumnsRenamed(
        {"item": "consequent", "item_baskets": "consequent_baskets"}
    )
    return (
        pairs.join(a_counts, "antecedent")
        .join(c_counts, "consequent")
        .crossJoin(F.broadcast(n_b))
        .select(
            "antecedent",
            "consequent",
            "pair_baskets",
            "antecedent_baskets",
            "consequent_baskets",
            F.round(F.col("pair_baskets") / F.col("_nb"), 6).alias("support"),
            F.round(F.col("pair_baskets") / F.col("antecedent_baskets"), 6).alias(
                "confidence"
            ),
            F.round(F.col("pair_baskets") / F.col("consequent_baskets"), 6).alias(
                "reverse_confidence"
            ),
            F.round(
                (F.col("pair_baskets") * F.col("_nb"))
                / (
                    F.col("antecedent_baskets").cast("double")
                    * F.col("consequent_baskets")
                ),
                6,
            ).alias("lift"),
        )
    )
