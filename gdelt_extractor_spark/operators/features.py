"""Feature engineering over heterogeneous sources: cross-group score
calibration and categorical target encoding.

Part of the §2c training-data family: corpus curation constantly
compares scores that were produced by different scorers on different
slices (per-source LM perplexity, per-crawl quality, per-annotator
grades) — raw values are incomparable across groups, and categorical
columns need leakage-safe numeric encodings before any model fit.

Scale shape: everything here is per-group windows (partitioned, never
global-order single-partition) + small aggregate joins; sums follow
the decimal convention so results are partition-order-exact and
hash-match the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    n_q: int = 100,
) -> DataFrame:
    """Classic quantile normalization: map every group's value
    distribution onto the SHARED reference distribution, so a
    "0.8 from src3" and a "0.8 from src7" become comparable.

    Recipe (Bolstad et al. 2003, the microarray standard, in its
    n_q-bucket form for unequal group sizes): rank rows within each
    group into ``n_q`` ntile buckets, take each group's per-bucket
    mean, average those means ACROSS groups into the per-bucket
    reference, and replace every row's value with its bucket's
    reference.  After normalization all groups share (up to bucket
    resolution) one distribution.

    ``tiebreak_col`` (unique) makes the within-group order total, so
    bucket assignment — and therefore the output — is deterministic
    and engine-portable (ntile semantics match DuckDB exactly).

    Output: input id/group/value plus (bucket, normalized).  One
    shuffle on the group key for the ntile window; the per-bucket
    frames are ≤ groups × n_q rows and broadcast back.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    # NULL values are dropped explicitly: Spark sorts NULLS FIRST
    # ascending while DuckDB sorts NULLS LAST, so leaving them in
    # would silently shift every bucket boundary between engines
    df = df.filter(F.col(value_col).isNotNull())
    bucketed = df.select(
        F.col(tiebreak_col),
        F.col(group_col),
        F.col(value_col).cast("double").alias(value_col),
    ).withColumn("bucket", F.ntile(n_q).over(w).cast("long"))

    group_means = bucketed.groupBy(group_col, "bucket").agg(
        (
            F.sum(F.col(value_col).cast("decimal(30,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_gm")
    )
    ref = group_means.groupBy("bucket").agg(
        (
            F.sum(F.col("_gm").cast("decimal(30,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_ref")
    )
    return bucketed.join(F.broadcast(ref), "bucket").select(
        tiebreak_col,
        group_col,
        value_col,
        "bucket",
        F.round("_ref", 6).alias("normalized"),
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 0.0,
    loo: bool = True,
) -> DataFrame:
    """Leakage-safe target encoding of a categorical column: each
    row's category becomes the mean target of the OTHER rows in that
    category (leave-one-out), optionally shrunk toward the global
    prior by ``smoothing`` pseudo-counts:

        enc = (sum_cat − y_own·loo + m·prior) / (n_cat − loo + m)

    Plain per-category mean encoding leaks the row's own label into
    its feature (a category with one row encodes as exactly its
    label); LOO is the standard fix.  A singleton category with
    m = 0 has no other rows — it encodes as the global prior.

    Scale shape: one groupBy shuffle builds the ≤|categories| stats
    frame, the 1-row prior and the stats broadcast back onto the
    scan; sums run decimal-exact.  Output: input columns plus
    ``encoded`` (round 6).
    """
    t = F.col(target_col).cast("double")
    # rows with NULL target carry no signal and would skew the
    # count-based denominators — excluded from stats AND output
    base = df.filter(t.isNotNull()).withColumn("__y", t)
    stats = base.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("__y").cast("decimal(30,15)")).alias("_s"),
    )
    prior = base.agg(
        (
            F.sum(F.col("__y").cast("decimal(30,15)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_prior")
    )
    own = F.col("__y") if loo else F.lit(0.0)
    k = 1 if loo else 0
    num = (
        F.col("_s").cast("double")
        - own
        + F.lit(float(smoothing)) * F.col("_prior")
    )
    den = F.col("_n") - F.lit(k) + F.lit(float(smoothing))
    return (
        base.join(stats, cat_col)
        .crossJoin(F.broadcast(prior))
        .withColumn(
            "encoded",
            F.round(
                F.when(den > 0, num / den).otherwise(F.col("_prior")), 6
            ),
        )
        .drop("_n", "_s", "_prior", "__y")
    )
