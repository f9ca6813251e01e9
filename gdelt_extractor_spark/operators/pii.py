"""PII detection and redaction over a text column.

A training-data pipeline has to find and strip personally
identifiable information before anything ships; at 100 TB that means
pure JVM regexp work inside whole-stage codegen — one scan, no
Python, no UDFs.  Patterns are deliberately engine-portable (same
semantics under Java regex and RE2) so the DuckDB oracle can apply
the identical definitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top to bottom, and detection counts are
# computed on the ORIGINAL text, so order only matters for redaction
# (email first so its local-part digits can't be half-eaten by the
# phone pattern; SSN before phone since both are digit-dash shapes).
#
# ipv4 octets are range-constrained to 0-255 (leading-zero-free), so
# 999.999.999.999 no longer counts.  Known residual over-match: RE2
# (the DuckDB oracle engine) has no lookarounds, so a valid-octet
# PREFIX of a longer dotted run ("10.0.1.2.3" → "10.0.1.2") still
# matches; that is the precision floor of engine-portable patterns.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", rf"\b{_OCTET}(?:\.{_OCTET}){{3}}\b"),
    # 13-16 digit cards in 4-4-4-(1..4) grouping with optional space/
    # dash separators.  No Luhn check — a checksum is not expressible
    # in RE2-portable regex, so plain 16-digit runs in that grouping
    # over-count; the standard redaction trade-off (better to redact
    # a fake card than leak a real one).
    ("credit_card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{1,4}\b"),
]


def scan_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``n_<kind>`` count column per PII pattern plus a
    ``has_pii`` flag.  All counts run on the original text in a
    single projection — one codegen stage, zero shuffles."""
    out = df
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
    flag = None
    for kind, _ in PII_PATTERNS:
        c = F.col(f"n_{kind}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def redact_expr(col: Column) -> Column:
    """The chained-replace expression: each PII kind replaced by its
    ``[KIND]`` tag, applied in ``PII_PATTERNS`` order."""
    out = col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with its ``[KIND]`` tag (in place by
    default).  Pure projection — composes with any downstream
    operator without breaking pushdown or partitioning."""
    return df.withColumn(out_col or text_col, redact_expr(F.col(text_col)))


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """K-anonymity audit over a set of quasi-identifier columns — the
    re-identification risk report run alongside PII scanning before a
    corpus release: a row is k-anonymous when at least k−1 other rows
    share its full quasi-identifier tuple.

    Output: ONE summary row — total rows/groups, the minimum group
    size, how many groups (and rows) fall below k, and the at-risk
    row fraction.

    Plan: one groupBy shuffle on the quasi tuple (map-side combined),
    then a single-row aggregate over the group sizes.  Nothing is
    collected; the group-size frame never contains payload columns.
    NULL quasi values group together (SQL GROUP BY semantics), which
    is the conservative choice for an anonymity audit.
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return sizes.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("_n").alias("min_group_size"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0)).alias("n_small_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias(
            "n_at_risk_rows"
        ),
    ).select(
        "n_rows",
        "n_groups",
        "min_group_size",
        "n_small_groups",
        "n_at_risk_rows",
        F.round(F.col("n_at_risk_rows") / F.col("n_rows"), 6).alias(
            "at_risk_frac"
        ),
    )


def luhn_valid(col: Column) -> Column:
    """True iff the digit-string Column passes the Luhn mod-10
    checksum (ISO/IEC 7812) — the validity gate real card-number
    detection adds on top of the regex shape match (the docstring on
    ``PII_PATTERNS`` notes plain regex over-counts).

    Pure higher-order-function expression: reverse, per-position
    digit extract, double-every-second with the >9 → −9 fold, one
    ``aggregate`` sum — no UDF, runs inside codegen, and has an
    exact DuckDB twin (list_transform over range + list_sum), so the
    check is oracle-portable.
    """
    rev = F.reverse(col)

    def term(i: Column) -> Column:
        d = F.substr(rev, i, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(
            F.pmod(i, F.lit(2)) == 0,
            F.when(dbl > 9, dbl - 9).otherwise(dbl),
        ).otherwise(d)

    s = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.length(col)), term),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.pmod(s, F.lit(10)) == 0


def luhn_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Card-number candidate extraction + Luhn validation: every
    13–19 digit run in the text becomes one output row with its
    checksum verdict.  This is the precision upgrade over the
    regex-only ``credit_card`` pattern: a pipeline redacts shape
    matches but ALERTS (routes for review / hard-drops the doc) only
    on checksum-valid hits, which is the standard precision/recall
    split for card PII.

    Scale shape: ``regexp_extract_all`` + explode + the ``luhn_valid``
    HOF — a single projection stage over the scan, zero shuffles,
    zero Python.  Docs without candidates emit nothing (explode, not
    explode_outer): at 100 TB the hit set is sparse and the output
    should be too.
    """
    cand = F.regexp_extract_all(F.col(text_col), F.lit(r"\d{13,19}"), 0)
    return (
        df.select(F.col(id_col), F.posexplode(cand).alias("pos", "candidate"))
        .select(
            id_col,
            F.col("pos").cast("long").alias("pos"),
            "candidate",
            F.length("candidate").cast("long").alias("n_digits"),
            luhn_valid(F.col("candidate")).alias("luhn_ok"),
        )
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """L-diversity audit — the companion to ``k_anonymity``: a
    quasi-identifier group is l-diverse when it contains at least
    ``l`` DISTINCT sensitive values, so group membership alone cannot
    reveal the sensitive attribute even when k-anonymity holds (the
    classic homogeneity attack: a k=50 group whose 50 rows all share
    one diagnosis).

    Output: ONE summary row — rows/groups, the minimum per-group
    distinct-sensitive count, groups (and rows) below ``l``, and the
    at-risk row fraction.

    Plan: one groupBy shuffle on the quasi tuple with a per-group
    count + count_distinct (partial-aggregated), then a single-row
    aggregate over group stats.  NULL sensitive values are excluded
    from the diversity count (they are absence, not a value an
    attacker learns); NULL quasi values group together, as in
    ``k_anonymity``.
    """
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(F.col(sensitive_col)).alias("_l"),
    )
    return groups.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("_l").cast("long").alias("min_diversity"),
        F.sum(F.when(F.col("_l") < l, 1).otherwise(0))
        .cast("long")
        .alias("n_low_groups"),
        F.sum(F.when(F.col("_l") < l, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_at_risk_rows"),
    ).select(
        "n_rows",
        "n_groups",
        "min_diversity",
        "n_low_groups",
        "n_at_risk_rows",
        F.round(F.col("n_at_risk_rows") / F.col("n_rows"), 6).alias(
            "at_risk_frac"
        ),
    )
