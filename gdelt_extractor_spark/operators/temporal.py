"""Temporal operators Spark lacks natively: as-of join.

Spark has no ASOF JOIN; the composition here is the standard
union-and-window trick: tag both sides, union them, sort within the
``by`` key by time, and carry the most recent right-side values
forward with ``last(ignorenulls)``.  One shuffle on the ``by`` key —
the same cost as a sort-merge join — no Python, no range explosion.

DuckDB's native ``ASOF JOIN`` serves as the oracle for this operator
(see __spark_entry__.oracle_sql()["asof_last_click"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """Left as-of join: for each left row attach ``value_cols`` from
    the latest right row with ``right.on < left.on`` (strict, the
    DuckDB ``l.ts > r.ts`` shape) or ``<=`` (non-strict), matched on
    ``by``.  Unmatched left rows keep NULLs.

    Output columns: all of ``left`` plus ``asof_<c>`` per value col.
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in value_cols
        ],
    )
    tagged_r = right.select(
        *[
            (F.col(c) if c in (on, by) else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # At equal ts: strict → left sorts BEFORE right (side desc: 1,0)
    # so the right row is not yet visible; non-strict → right first.
    side_order = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
