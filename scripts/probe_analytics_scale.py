#!/usr/bin/env python
"""Probe: funnel / retention / SCD-2 growth curves + exchange counts.

The temporal.py docstrings claim single-digit exchange counts and
linear-ish scaling for ext_funnel (2 exchanges), ext_retention (2) and
ext_scd2_history (1). The plan tests pin the exchange counts; this probe
closes the loop with measured wall-time growth: the sf0.01 events table is
exploded ×1/×4/×20 with user_id offsets (user count scales with volume —
the realistic growth mode, keeping per-user partition slices constant),
written to scratch, and each op runs against it unmodified.

Run:  python scripts/probe_analytics_scale.py   (results in BASELINE.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from agentic_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".tmp", "probe_analytics")
TARGETS = ("ext_funnel", "ext_retention", "ext_scd2_history")


def exploded_events_dir(spark, mult: int) -> str:
    """events ×mult with distinct user/event id spaces per replica."""
    out = os.path.join(SCRATCH, f"x{mult}")
    ev = load_table(spark, BASE, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    rep = spark.range(mult).select(F.col("id").alias("rep"))
    big = (ev.crossJoin(F.broadcast(rep))
           .select((F.col("event_id") + F.col("rep") * n_events)
                   .alias("event_id"),
                   "ts",
                   (F.col("user_id") + F.col("rep") * n_users)
                   .alias("user_id"),
                   "event_type", "value", "props"))
    big.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="probe-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    prev: dict[str, float] = {}
    for mult in (1, 4, 20):
        sf_dir = exploded_events_dir(spark, mult)
        n = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
        for name in TARGETS:
            df = OPS[name].fn(spark, sf_dir)
            rows = df.count()

            def one() -> float:
                # noop sink evaluates EVERY column — count() would let
                # Catalyst prune the window columns right out of the plan
                # (observed: scd2 "ran" in constant 0.1 s at any scale).
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                return time.perf_counter() - t0

            one()  # JIT/paging warm-up
            dt = min(one(), one())
            growth = (f"  x{dt / prev[name]:.2f} vs prev"
                      if name in prev else "")
            print(f"x{mult:2d} (n={n:9,d})  {name:17s}  rows={rows:7,d}  "
                  f"{dt:6.2f} s  exchanges={n_exchanges(df)}{growth}",
                  flush=True)
            prev[name] = dt
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
