#!/usr/bin/env python
"""Dump the formatted physical plan of every ``queries()`` entry to
a directory (default /tmp/plans) plus a one-line-per-query summary of
the scale-relevant counts: Exchange nodes, broadcast joins, Python
evals, cartesian products, and pushed-filter scans.

The per-operator plan-shape CONTRACTS live in tests/test_plan_shape.py;
this tool is the exploratory companion — run it after touching an
operator to eyeball what Catalyst actually planned, or diff two dumps
across a change:

    python scripts/explain_all.py [outdir] [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entry_mod  # noqa: E402
from gdelt_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plans"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("explain-all")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — survey tool, keep going
            rows.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            continue
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        rows.append(
            (
                name,
                "exchanges={} bcast_joins={} py_evals={} cartesian={} pushed_scans={}".format(
                    len(re.findall(r"\(\d+\) Exchange", plan)),
                    plan.count("BroadcastHashJoin"),
                    len(re.findall(r"\(\d+\) \w*EvalPython", plan)),
                    plan.count("CartesianProduct"),
                    sum(
                        1
                        for l in plan.splitlines()
                        if "PushedFilters" in l and "PushedFilters: []" not in l
                    ),
                ),
            )
        )
    width = max(len(n) for n, _ in rows)
    for name, summary in rows:
        print(f"{name:<{width}}  {summary}")
    print(f"\nplans written to {outdir}/")


if __name__ == "__main__":
    main()
