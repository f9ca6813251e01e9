#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (write-side action,
no driver collect).  A warmup pass on sf0.001 first-touches JVM/codegen
so measured numbers are steady-state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gdelt_extractor_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

# Headline set: ALL queries() entries, so every operator's regression
# is visible round-over-round (VERDICT r1: the exact pair-join
# baselines and LSH ANN are benched too, not just their scale paths).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_region_volume",
    "topk_per_group",
    "events_hourly",
    "sessionize",
    "pivot_event_values",
    "anti_join_inactive",
    "dedup_first_by_key",
    "enrich_articles",
    "keyword_freq",
    "lookup_rollup",
    "lookup_country_rollup",
    "gkg_theme_cooccurrence",
    "quad_class_rollup",
    "goldstein_daily",
    "geo_project",
    "dedup_exact",
    "dedup_apply",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_semantic",
    "dup_clusters",
    "pii_scan",
    "pack_sequences",
    "mix_sources",
    "ann_topk",
    "ann_lsh_topk",
    "lang_id",
    "quality_score",
    "gopher_rules",
    "token_stats",
    "fingerprint",
    "rollup_daily",
    "value_quantiles",
    "asof_last_click",
    "decontaminate",
    "sample_split",
    "corpus_stats",
    "q17_small_qty_revenue",
    "window_running",
    "range_count_clicks_after_error",
    "user_set_ops",
    "approx_distinct_users",
    "ann_ivf_topk",
    "props_json_extract",
    "stratified_sample",
    "user_top_event",
    "cube_volume",
    "q4_priority_exists",
    "order_price_ranks",
    "repetition_stats",
    "remove_boilerplate",
    "lang_confusion",
    "tfidf_top_terms",
    "top_bigrams",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def release(spark) -> None:
    """Drop the finished query's leftover storage blocks (persisted
    frames, localCheckpoint RDDs) before timing the next one, so 48
    back-to-back queries in one JVM don't accrete executor memory and
    make later queries pay the earlier ones' eviction pressure — a
    bench-harness artifact, not a property of the queries.

    Targeted unpersist, NOT a forced full GC: System.gc() was measured
    to slow every subsequent query ~1.5× uniformly (it throws away
    JIT/codegen warm state), while doing nothing for localCheckpoint
    blocks until the Python wrapper died anyway."""
    spark.catalog.clearCache()  # Dataset.persist entries (CacheManager)
    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():  # RDD.persist (localCheckpoint)
        rdd.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("gdelt-extractor-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    missing = sorted(set(queries) - set(HEADLINE))
    assert not missing, f"queries() entries missing from bench HEADLINE: {missing}"

    # One broken query must not sink the whole bench (r3 lost ALL perf
    # data to a single warmup AnalysisException): catch per query,
    # record {"err": ...}, keep timing the rest.
    errors: dict[str, str] = {}
    for name in HEADLINE:  # warmup 1: tiny SF — JIT/codegen first-touch
        try:
            materialize(queries[name](spark, "/root/testdata/sf0.001"))
        except Exception as exc:  # noqa: BLE001 — recorded, not swallowed
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    release(spark)
    for name in HEADLINE:  # warmup 2: target SF — page cache, AQE
        if name in errors:  # plans, and allocation paths at real size
            continue
        try:
            materialize(queries[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        release(spark)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in errors:
            continue
        t0 = time.perf_counter()
        try:
            materialize(queries[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        release(spark)

    out: dict = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {**timings, **{n: {"err": e} for n, e in errors.items()}},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Always exit 0 with the JSON line emitted: the driver's parse of
    # stdout is the gate; per-query errors are visible in "queries".
    print(json.dumps(out))


if __name__ == "__main__":
    main()
