#!/usr/bin/env python
"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage:
    python scripts/explain_dump.py r12 before q1,q2,...   # -> plans/r12/<q>_before.txt
    python scripts/explain_dump.py r12 after q1,q2,...

The judge reads these files to check plan claims (Exchange counts,
join strategies, PushedFilters, BatchEvalPython/ArrowEvalPython
nodes) against OPTIMIZATION notes, so capture them from the SAME
code that bench.py times (queries() at $SPARK_GRAFT_SF_DIR).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from gdelt_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, stage, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{stage}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
