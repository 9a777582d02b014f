#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query seconds.

Methodology: one shared SparkSession (the reference's DuckDB baseline also
keeps one connection), a warm-up job to absorb JVM/codegen startup, then each
query executed once end-to-end into the `noop` sink (full computation, no
driver materialization cost). BASELINE.md carries the DuckDB twin numbers
measured by scripts/bench_duckdb.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: one per major plan shape (scan-agg, join, window, topk,
# time bucketing, dedup, text map, vector search).
HEADLINE = [
    "q1_pricing_summary",
    "q_groupby",
    "q_join_left",
    "q_window_agg",
    "q_topk",
    "q_tumble",
    "ext_dedup_exact",
    "ext_text_stats",
    "vector_search",
    "ext_similarity_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from agentic_data_pipeline_spark.registry import all_queries
    from agentic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="adps-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm-up: JVM, codegen, parquet footer caches.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
