"""CLI: the engine's command-line surface, mirroring how the
reference is actually invoked (reference/v1.py and v2.py are
``python v1.py`` scripts that construct an Extractor and call
run_v1/run_v2) while adding the query-registry and SQL surfaces a
Spark deployment wants:

    python -m gdelt_extractor_spark list
    python -m gdelt_extractor_spark query q1_pricing_summary \
        [--sf-dir DIR] [--limit N] [--out PATH --fmt parquet|orc|json|csv]
    python -m gdelt_extractor_spark sql "SELECT count(*) FROM lineitem"
    python -m gdelt_extractor_spark run-v1 --tsv PATH --out DIR
    python -m gdelt_extractor_spark run-v2 --zips GLOB --out DIR

``main(argv, spark)`` takes an injectable session so tests drive the
wiring without a subprocess; the module entry builds one from
``session.get_spark``.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gdelt_extractor_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry queries (* = oracle-gated)")

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.add_argument("--limit", type=int, default=20, help="rows to print")
    q.add_argument("--out", help="write full result here instead of printing")
    q.add_argument("--fmt", default="parquet",
                   choices=("parquet", "orc", "json", "csv"))

    s = sub.add_parser("sql", help="ad-hoc SQL over the registered tables")
    s.add_argument("statement")
    s.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    s.add_argument("--limit", type=int, default=20)
    s.add_argument("--out")
    s.add_argument("--fmt", default="parquet",
                   choices=("parquet", "orc", "json", "csv"))

    v1 = sub.add_parser("run-v1", help="daily v1 TSV -> cleaned tables")
    v1.add_argument("--tsv", required=True)
    v1.add_argument("--out", required=True)

    v2 = sub.add_parser("run-v2", help="15-min v2 zip drops -> tables")
    v2.add_argument("--zips", required=True)
    v2.add_argument("--out", required=True)
    return p


def _emit(df, args) -> None:
    if args.out:
        from .sinks.files import export_table

        export_table(df, args.out, fmt=args.fmt)
        print(f"wrote {args.out} ({args.fmt})")
    else:
        df.show(args.limit, truncate=False)


def _load_registry():
    """Import the repo-root ``__spark_entry__`` module regardless of
    the process cwd (``python -m`` from elsewhere would otherwise
    miss it): the repo root is this package's parent directory."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import __spark_entry__ as entry_mod

    return entry_mod


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    args = _parser().parse_args(argv)
    if spark is None:
        from .session import get_spark

        spark = get_spark("gdelt-extractor-cli")

    if args.cmd == "list":
        entry_mod = _load_registry()

        oracles = set(entry_mod.oracle_sql())
        for name in entry_mod.queries():
            print(("*" if name in oracles else " ") + " " + name)
        return 0

    if args.cmd == "query":
        entry_mod = _load_registry()

        registry = entry_mod.queries()
        if args.name not in registry:
            print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
            return 2
        _emit(registry[args.name](spark, args.sf_dir), args)
        return 0

    if args.cmd == "sql":
        from .sql import run_sql

        _emit(run_sql(spark, args.sf_dir, args.statement), args)
        return 0

    if args.cmd == "run-v1":
        from .pipelines.batch import run_v1_batch

        tables = run_v1_batch(spark, args.tsv, args.out)
        print("tables:", ", ".join(tables))
        return 0

    if args.cmd == "run-v2":
        from .pipelines.batch import run_v2_batch

        tables = run_v2_batch(spark, args.zips, args.out)
        print("tables:", ", ".join(tables))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
