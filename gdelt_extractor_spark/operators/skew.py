"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting handles sort-merge joins whose partitions
are detectably oversized, but it cannot help when (a) the skew is in
an aggregation key, (b) the join is already a broadcast candidate on
the other side, or (c) the engine is streaming (no runtime re-plan).
Salting is the static fix: spread each hot key across ``n_salts``
sub-keys, do the heavy shuffle on the salted key, then (for aggs)
merge the partials.

Both operators are pure DataFrame compositions — deterministic,
engine-portable, no RNG (the salt is a hash, not ``rand()``, so
retried tasks produce identical output)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_by: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the (big) left side.

    Left rows are salted with ``pmod(xxhash64(salt_by), n_salts)`` —
    ``salt_by`` is any set of left columns that varies within a hot
    key (a row id, a timestamp) so a hot key's rows spread uniformly
    over ``n_salts`` reducers.  The right side is replicated once
    per salt via an exploded sequence (size × n_salts — keep the
    right side the smaller one).  Join keys become on + [salt], so
    the shuffle partitions a hot key n_salts ways.

    Only ``how`` in ('inner', 'left', 'left_semi', 'left_anti') is
    supported: the right side is replicated n_salts times, so any
    right-preserving join ('right', 'full') would emit each unmatched
    right row once PER SALT — n_salts duplicates.  Salt the other
    side (swap the arguments) for those.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated right side "
            "would duplicate unmatched right rows n_salts times; swap sides instead"
        )
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_by]), F.lit(n_salts))
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l.join(r, [*on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_by: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys.

    ``aggs`` maps output name → (merge_fn_name, partial_expr) where
    merge_fn_name ∈ {'sum', 'min', 'max'} — the decomposable
    aggregates.  Stage 1 aggregates on (keys, salt): each hot key's
    rows split over n_salts reducers.  Stage 2 merges the ≤ n_salts
    partial rows per key — trivially small.

    Example — skew-proof count + decimal sum:
        salted_agg(df, ["k"], {
            "n":   ("sum", F.count(F.lit(1))),
            "tot": ("sum", F.sum(F.col("v").cast("decimal(25,6)"))),
        }, salt_by=["row_id"])
    """
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _) in aggs.items():
        if fn not in merge_fns:
            raise ValueError(f"{name}: merge fn must be one of {sorted(merge_fns)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_by]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (_, expr) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge_fns[fn](F.col(name)).alias(name) for name, (fn, _) in aggs.items()]
    )
