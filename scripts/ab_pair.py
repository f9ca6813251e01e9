#!/usr/bin/env python
"""Same-session alternating A/B of one registry query under an env
toggle — the repo's established adjudication protocol (host swings
2-3x across sessions, so cross-session timings never decide a
change).

Usage:
    python scripts/ab_pair.py <query> <TOGGLE_ENV> [reps]

Builds the query twice in ONE Spark session — once with
<TOGGLE_ENV>=old, once with <TOGGLE_ENV>=new (the operator reads the
toggle at DataFrame-BUILD time) — asserts the two outputs are
row-identical (sorted collect compare), runs untimed warmups of
both, then times them alternating A,B,A,B,... with the noop sink and
prints one JSON line with per-rep times and medians.

Each timed rep REBUILDS the DataFrame (bench.py's own methodology:
``materialize(queries[name](spark, sf_dir))`` inside the timer), so
build-time work — eager localCheckpoints in particular — is charged
to the variant that performs it.  Timing a pre-built frame would
credit a checkpointing variant with the materialization it did for
free at build time.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    query, toggle = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab_{query}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    def build(variant: str):
        os.environ[toggle] = variant
        # rebuild the registry so module-level state can't pin a variant
        return E.queries()[query](spark, sf_dir)

    old_df, new_df = build("old"), build("new")

    # row-identity gate first: sorted rows must match exactly
    cols = old_df.columns
    assert cols == new_df.columns, (cols, new_df.columns)
    a = sorted(map(tuple, old_df.collect()))
    b = sorted(map(tuple, new_df.collect()))
    assert len(a) == len(b), (len(a), len(b))
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert not mism, [(a[i], b[i]) for i in mism]

    def run(variant: str) -> float:
        t0 = time.time()
        df = build(variant)  # build INSIDE the timer, like bench.py
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for v in ("old", "new"):  # untimed warmups
        run(v)
    times: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(reps):
        for name in ("old", "new"):
            spark.sparkContext.setJobDescription(f"ab:{query}:{name}")
            times[name].append(round(run(name), 3))
    out = {
        "query": query,
        "rows": len(a),
        "reps": reps,
        "old": times["old"],
        "new": times["new"],
        "old_median": round(statistics.median(times["old"]), 3),
        "new_median": round(statistics.median(times["new"]), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
