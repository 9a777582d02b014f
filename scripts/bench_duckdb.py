#!/usr/bin/env python
"""DuckDB baseline for BASELINE.md: run each headline query's oracle SQL
(the exact semantics twin of the Spark op) on the same parquet at the same
sf. This *is* the engine the reference delegates to (engine.py:44,58-63),
so it is the operative baseline (BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # same query set


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
    from tests.parity_util import duck_connect

    _ensure_loaded()
    con = duck_connect(sf_dir)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        oracle = OPS[name].oracle
        if oracle is None:
            continue

        def run() -> float:
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            return time.perf_counter() - t0

        run()  # warm-up (parse + OS page cache), mirroring bench.py
        timings[name] = round(min(run(), run()), 3)
    print(json.dumps({
        "metric": "duckdb_headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "")),
    }))


if __name__ == "__main__":
    main()
