#!/usr/bin/env python
"""Scan-parallelism probe (r11, guide §6.1): at sf10 the lake's biggest
file (lineitem, ~1.1 GB) yields only ~9 scan tasks under the default
spark.sql.files.maxPartitionBytes=128m — local[32] runs scan-bound
queries on a quarter of its cores. spark.sql.files.minPartitionNum
floors the split count at the session's core count (the files ARE
splittable: DuckDB writes ~122k-row row groups). sf0.1 fixtures are
single-row-group so the floor cannot fragment the of-record tier's
scans into real extra work there — but the conf is still proposed
volume-gated (apply_scaled_shuffle), like the bloom ratchet, so the
dispatch-bound tier keeps its exact current plans.

Interleaved A/B (conf is runtime-settable), fresh noop writes, rows
asserted identical first. Scan-bound subjects: q1 (pure scan+agg), q6
(scan+filter+agg), q14 (scan+broadcast probe), q19 (disjunctive scan).

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_scan_minpartitions.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.flagship import q1_pricing_summary
from agentic_data_pipeline_spark.operators.analytics import (
    q14_promo_revenue, q19_disjunctive_filter,
)
from agentic_data_pipeline_spark.operators.tpch_full import (
    q6_forecast_revenue,
)
from agentic_data_pipeline_spark.session import (
    apply_scaled_shuffle, default_parallelism, get_spark,
)

TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))

SUBJECTS = [
    ("q1", q1_pricing_summary),
    ("q6", q6_forecast_revenue),
    ("q14", q14_promo_revenue),
    ("q19", q19_disjunctive_filter),
]


def main() -> None:
    spark = get_spark()
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)
    floor = str(default_parallelism())

    def set_minpn(on: bool) -> None:
        if on:
            spark.conf.set("spark.sql.files.minPartitionNum", floor)
        else:
            spark.conf.unset("spark.sql.files.minPartitionNum")

    out: dict = {"tier": TIER, "passes": PASSES, "minPartitionNum": floor}
    for name, fn in SUBJECTS:
        set_minpn(False)
        base = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        set_minpn(True)
        alt = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        assert base == alt, f"{name}: rows differ under minPartitionNum"
        times: dict = {"off": [], "on": []}
        for p in range(PASSES):
            for label, on in (("off", False), ("on", True)):
                set_minpn(on)
                spark.sparkContext.setJobDescription(
                    f"probe minpn {name} {label} pass {p}")
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                times[label].append(round(time.monotonic() - t0, 3))
        set_minpn(False)
        out[name] = {k: {"times": v, "min": min(v)} for k, v in times.items()}
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
