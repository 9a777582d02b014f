#!/usr/bin/env python
"""Growth evidence for the floor-bound TPC-H micro queries (r7 verdict
item 5, extended): per-query {spark, duck, ratio} at a replica-
parameterized tier, limited to the micro set so the tier can go to sf10
(REPLICAS=100, lineitem 60M rows) without paying the heavy ext ops'
wall. The claim under test: these queries' sf0.1/sf1 ratios are Spark's
multi-stage dispatch floor, so the ratio must FALL as the tier grows —
if one's ratio is flat-or-rising with scale it is throughput-bound and
belongs on the weak list, not the watch list.

Usage: SPARK_GRAFT_REPLICAS=100 python scripts/probe_micro_growth.py
(one invocation per tier; lake built/reused at .tmp/sf{N}). Prints ONE
JSON line; results are transcribed into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_sf1 import DST, REPLICAS, TIER_SF, build_lake  # noqa: E402

MICRO = [
    "q4_late_shipments", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_priority_by_delay",
    "q13_order_distribution", "q15_top_supplier",
    "q16_part_supplier_counts", "q17_small_quantity",
    "q20_promotion_suppliers", "q21_waiting_suppliers",
    "q22_dormant_customers",
]


def main() -> None:
    build_lake()
    import pyarrow.parquet as pq

    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
    from agentic_data_pipeline_spark.session import (
        apply_scaled_shuffle, get_spark,
    )
    from tests.parity_util import duck_connect

    _ensure_loaded()
    spark = get_spark(app_name=f"adps-micro-growth-sf{TIER_SF:g}")
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = pq.ParquetFile(
        os.path.join(DST, "lineitem.parquet")).metadata.num_rows
    n_parts = apply_scaled_shuffle(spark, n_fact)
    dfs = {n: OPS[n].fn(spark, DST) for n in MICRO}

    def run(name: str) -> float:
        t0 = time.perf_counter()
        dfs[name].write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    for _ in range(2):
        for n in MICRO:
            run(n)
    timings = {n: round(min(run(n) for _ in range(3)), 3) for n in MICRO}

    con = duck_connect(DST)
    duck = {}
    for n in MICRO:
        o = OPS[n].oracle

        def one() -> float:
            t0 = time.perf_counter()
            con.execute(o).fetchall()
            return time.perf_counter() - t0

        one()
        duck[n] = round(min(one(), one(), one()), 3)

    s, d = sum(timings.values()), sum(duck.values())
    print(json.dumps({
        "metric": "micro_growth_tier",
        "sf": TIER_SF, "replicas_of_sf0.1": REPLICAS,
        "fact_rows": n_fact, "shuffle_partitions": n_parts,
        "spark_sec": {n: timings[n] for n in MICRO},
        "duck_sec": {n: duck[n] for n in MICRO},
        "ratio": {n: round(timings[n] / duck[n], 2) for n in MICRO},
        "spark_total": round(s, 3), "duck_total": round(d, 3),
        "total_ratio": round(s / d, 3),
        "invocation_unix": round(time.time(), 1),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
