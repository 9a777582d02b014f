#!/usr/bin/env python
"""Probe: custom stateful sessionization growth (VERDICT r3 #7).

probe_stream_state.py covers the BUILT-IN stateful op (watermarked
tumbling agg); this one drives the applyInPandasWithState sessionizer
(streaming/sessions.py) — the "operator Spark lacks" case — over
×1/×4/×20 exploded events and reads the state-store rows Spark itself
reports per micro-batch.

Expected at 100 TB/day: state rows track ACTIVE USERS (one (last_ts,
session_id) tuple per user), not stream length — flat across corpus
multiplication when the user population is fixed, growing only with
users; wall grows ~linearly with input rows.

Run:  python scripts/probe_session_state.py   (results in BASELINE.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from probe_stream_state import exploded_dir

from agentic_data_pipeline_spark.session import get_spark
from agentic_data_pipeline_spark.streaming.sessions import stream_sessionize
from agentic_data_pipeline_spark.streaming.windows import (
    _scoped_stream_shuffle,
)

SCRATCH = os.path.join(REPO, ".tmp", "probe_stream_state")


def run_probe(spark, mult: int) -> None:
    src = exploded_dir(spark, mult)
    n = spark.read.parquet(src).count()
    n_users = spark.read.parquet(src).select("user_id").distinct().count()
    sdf = stream_sessionize(spark, src)
    name = f"probe_sessions_x{mult}"
    ckpt = os.path.join(SCRATCH, f"sess_ckpt_x{mult}")
    with _scoped_stream_shuffle(spark):
        t0 = time.perf_counter()
        q = (sdf.writeStream.format("memory").queryName(name)
             .outputMode("append")
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
    print(f"x{mult:2d} (n={n:9,d} users={n_users:4,d})  wall={dt:6.2f}s  "
          f"session_rows={out_rows:6,d}  "
          f"state_rows_per_batch={state_rows}", flush=True)


def main() -> None:
    spark = get_spark(app_name="probe-session-state")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, 4, 20):
        run_probe(spark, mult)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
