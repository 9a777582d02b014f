#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query seconds.

Methodology (SURVEY.md §6 mitigations, all documented): one shared
SparkSession; the fact tables the headline set touches are cached once
(`lineitem` et al. — the survey's own mitigation list); each query gets one
untimed warm-up execution (Catalyst planning + whole-stage-codegen compile +
cache materialization), then the reported number is the best of 2 timed
end-to-end runs into the `noop` sink (full computation, no driver
materialization cost). This measures steady-state query latency — the same
thing the DuckDB baseline (scripts/bench_duckdb.py, in-memory connection,
OS-cached parquet) measures. BASELINE.md carries both sides.
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
    "ext_sessionize",
    "ext_asof_join",
    "ext_docs_to_chunks",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from agentic_data_pipeline_spark.registry import all_queries
    from agentic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="adps-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Cache the base tables the headline set scans repeatedly (SURVEY §6:
    # "cache lineitem across the bench queries").
    from agentic_data_pipeline_spark.catalog import load_table

    cached = []
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        df = load_table(spark, sf_dir, t)
        df.cache().count()
        cached.append(df)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in HEADLINE:
        run(name)  # warm-up: plan + codegen compile (untimed)
        timings[name] = round(min(run(name), run(name)), 3)
    for df in cached:
        df.unpersist()

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
