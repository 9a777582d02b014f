#!/usr/bin/env python
"""Probe: streaming state growth under watermarks.

The windows.py docstrings claim watermarks keep stateful-stream state
proportional to the horizon (open windows × groups), NOT the stream
length — the property that makes a 100 TB/day stream runnable. This
drives stream_tumbling_agg over ×1/×4/×20 exploded events with a
BOUNDED 2-hour watermark, feeding the stream in several availableNow
micro-batch files so late-bucket finalization actually happens between
batches, and reads the state-store metrics Spark itself reports
(stateOperators[0].numRowsTotal from the query's recentProgress).

Expected: wall time grows ≤ linearly; state rows track (#open hourly
buckets × #event types), NOT input rows — flat across corpus size when
the event-time span is fixed, growing only with the time span.

Run:  python scripts/probe_stream_state.py   (results in BASELINE.md)
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
from agentic_data_pipeline_spark.session import get_spark
from agentic_data_pipeline_spark.streaming.windows import (
    _scoped_stream_shuffle, stream_tumbling_agg,
)

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".tmp", "probe_stream_state")
N_FILES = 4  # micro-batch granularity: maxFilesPerTrigger=1 → 4 batches


def exploded_dir(spark, mult: int) -> str:
    out = os.path.join(SCRATCH, f"x{mult}")
    ev = load_table(spark, BASE, "events")
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    rep = spark.range(mult).select(F.col("id").alias("rep"))
    big = (ev.crossJoin(F.broadcast(rep))
           .select((F.col("event_id") + F.col("rep") * n_events)
                   .alias("event_id"),
                   "ts", "user_id", "event_type", "value", "props"))
    # Split by event-time order so later files carry later hours and the
    # watermark advances batch over batch (event-time-ordered arrival).
    big.orderBy("ts").coalesce(N_FILES).write.mode("overwrite").parquet(out)
    return out


def run_probe(spark, mult: int) -> None:
    src = exploded_dir(spark, mult)
    n = spark.read.parquet(src).count()
    sdf = stream_tumbling_agg(spark, src, window="1 hour",
                              watermark="2 hours")
    name = f"probe_state_x{mult}"
    ckpt = os.path.join(SCRATCH, f"ckpt_x{mult}")
    with _scoped_stream_shuffle(spark):
        t0 = time.perf_counter()
        q = (sdf.writeStream.format("memory").queryName(name)
             .outputMode("append")          # append: finalized buckets only
             .option("checkpointLocation", ckpt)
             .option("maxFilesPerTrigger", 1)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        dt = time.perf_counter() - t0
        state_rows = [p["stateOperators"][0]["numRowsTotal"]
                      for p in q.recentProgress
                      if p.get("stateOperators")]
    out_rows = spark.table(name).count()
    print(f"x{mult:2d} (n={n:9,d})  wall={dt:6.2f} s  "
          f"finalized_rows={out_rows:6,d}  "
          f"state_rows_per_batch={state_rows}", flush=True)


def main() -> None:
    spark = get_spark(app_name="probe-stream-state")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, 4, 20):
        run_probe(spark, mult)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
