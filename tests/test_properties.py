"""Property tests (hypothesis) for hash/dedup/text invariants.

Each example materializes a whole batch of generated documents into
one Spark job, so examples stay cheap; max_examples is small because
every example is already a many-row test.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gdelt_extractor_spark.functions.text import normalize_text, tokens
from gdelt_extractor_spark.operators.curation import sample_split
from gdelt_extractor_spark.operators.dedup import dedup_exact, simhash
from gdelt_extractor_spark.operators.textstats import token_stats

TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cc", "Cs")),
    min_size=0,
    max_size=120,
)
DOCS = st.lists(TEXT, min_size=1, max_size=24)

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(DOCS)
@PROP
def test_normalize_idempotent(spark, texts):
    df = _df(spark, texts).select(
        normalize_text("text").alias("n1"),
        normalize_text(normalize_text("text")).alias("n2"),
    )
    assert df.filter(F.col("n1") != F.col("n2")).count() == 0


@given(DOCS)
@PROP
def test_dedup_exact_partitions_rows(spark, texts):
    """Group sizes must sum to the row count, and keep_id must be a
    real doc id — dedup never invents or drops rows."""
    df = _df(spark, texts)
    groups = dedup_exact(df, "text", "doc_id").collect()
    assert sum(g.n_dups for g in groups) == len(texts)
    ids = set(range(len(texts)))
    assert all(g.keep_id in ids for g in groups)


@given(DOCS)
@PROP
def test_simhash_equal_text_equal_hash(spark, texts):
    """Docs with identical text must collide exactly (same token
    multiset → same bit votes → same fingerprint)."""
    df = _df(spark, texts + texts)  # guaranteed duplicates
    rows = (
        simhash(df, "text", "doc_id")
        .join(df.select(F.col("doc_id").alias("id"), "text"), "id")
        .collect()
    )
    by_text: dict[str, set] = {}
    for r in rows:
        by_text.setdefault(r.text, set()).add(r.simhash)
    assert all(len(v) == 1 for v in by_text.values())


@given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=50))
@PROP
def test_sample_split_is_content_stable(spark, ids):
    """bucket/split depend only on the id value — identical across
    duplicate rows, orderings, and partitionings — and ~90/10."""
    df = spark.createDataFrame([(i,) for i in ids + ids], "doc_id long")
    out = sample_split(df, "doc_id").collect()
    by_id: dict[int, set] = {}
    for r in out:
        by_id.setdefault(r.doc_id, set()).add((r.bucket, r.split))
    assert all(len(v) == 1 for v in by_id.values())
    assert all(0 <= r.bucket < 100 for r in out)
    assert all((r.split == "train") == (r.bucket < 90) for r in out)


@given(DOCS)
@PROP
def test_token_stats_bounds(spark, texts):
    rows = token_stats(_df(spark, texts), "doc_id", "text").collect()
    for r in rows:
        assert 0 <= r.n_unique <= r.n_tokens
        assert r.n_subwords >= r.n_tokens or r.n_tokens == 0 or r.n_subwords >= 0
