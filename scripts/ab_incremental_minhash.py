"""Same-session alternating A/B of the incremental-MinHash anchor
(xxhash64 fast path) vs its md5 portable twin (VERDICT r11 item 1).

Runs the two registry entries back-to-back A,B,A,B,... in ONE Spark
session after untimed warmups of both, so JVM state, code cache and
host load are shared like-for-like — the adjudication protocol the
r11 verdict asked for.  Prints one JSON line with per-rep times and
medians.

Usage: python scripts/ab_incremental_minhash.py [reps]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_incremental_minhash")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = E.queries()
    pair = {
        "anchor": q["dedup_incremental_minhash"],
        "portable": q["dedup_incremental_minhash_portable"],
    }
    # untimed warmups (both sides) — JIT, file listing, Arrow init
    for fn in pair.values():
        fn(spark, sf_dir).count()
    times: dict[str, list[float]] = {k: [] for k in pair}
    for _ in range(reps):
        for name, fn in pair.items():  # alternating A,B per rep
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            times[name].append(round(time.monotonic() - t0, 3))
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "times": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
