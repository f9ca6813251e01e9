"""canonicalize_url: spec cases + codegen-only plan."""

from pyspark.sql import functions as F

from gdelt_extractor_spark.functions.text import canonicalize_url

CASES = [
    # (raw, canon)
    ("HTTPS://Example.COM:443/a/b#frag", "https://example.com/a/b"),
    ("http://Site.ORG:80/", "http://site.org"),  # bare root: slash dropped
    ("http://site.org/page/", "http://site.org/page"),
    ("http://s.o/p?utm_source=x&id=1", "http://s.o/p?id=1"),
    ("http://s.o/p?id=1&utm_medium=m", "http://s.o/p?id=1"),
    ("http://s.o/p?utm_a=1&utm_b=2", "http://s.o/p"),
    ("http://s.o/p?fbclid=abc", "http://s.o/p"),
    ("http://s.o/p?gclid=", "http://s.o/p"),
    ("http://s.o:8080/p", "http://s.o:8080/p"),  # non-default port kept
    ("no-scheme/path/", "no-scheme/path"),
    ("http://s.o/p?a=1&b=2", "http://s.o/p?a=1&b=2"),  # order preserved
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("u").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "http://a.b/c")], "i long, u string")
    plan = (
        df.select(canonicalize_url("u"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
