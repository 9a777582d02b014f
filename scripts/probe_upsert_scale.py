#!/usr/bin/env python
"""Probe: stream_upsert growth — the property that matters at 100 TB/day
is that per-batch merge work and final state are KEY-CARDINALITY-sized,
not fact-table-sized. Events replicated with re-keyed event_ids but the
SAME user population (x1/x4/x20): state rows must stay constant at the
user count while wall grows ~linearly with input rows.

Run:  python scripts/probe_upsert_scale.py   (results in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table, ts_us_long
from agentic_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".tmp", "probe_upsert")
C = F.col


def exploded_events_dir(spark, mult: int, n_files: int = 4) -> str:
    """Events x mult with re-keyed event_ids, same users/timestamps,
    written as n ts-range part files (the micro-batch structure)."""
    out = os.path.join(SCRATCH, f"x{mult}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    ev = load_table(spark, BASE, "events")
    n = ev.agg(F.max("event_id")).collect()[0][0] + 1
    rep = spark.range(mult).select(C("id").alias("rep"))
    (ev.crossJoin(F.broadcast(rep))
       .select((C("event_id") + C("rep") * n).alias("event_id"),
               "ts", "user_id", "event_type", "value", "props")
       .repartitionByRange(n_files, "ts", "event_id")
       .write.mode("overwrite").parquet(out))
    open(done, "w").close()
    return out


def run_upsert(spark, split: str) -> tuple[float, int, int]:
    """The same foreachBatch merge as stream_upsert (operators/
    streaming_ops.py), against an arbitrary pre-split events dir."""
    run_dir = os.path.join(SCRATCH, "runs", uuid.uuid4().hex[:8])
    os.makedirs(run_dir, exist_ok=True)
    schema = spark.read.parquet(split).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(split))
    stream = stream.withColumn("ts_us", ts_us_long(stream))
    state = {"path": None, "batches": 0}
    last = F.max_by(F.struct("last_event_id", "last_event_type",
                             "last_value"),
                    F.struct("last_ts_us", "last_event_id"))

    def merge_batch(batch_df, batch_id):
        agg = (batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by(F.struct(C("event_id").alias("last_event_id"),
                              C("event_type").alias("last_event_type"),
                              C("value").alias("last_value")),
                     F.struct("ts_us", "event_id")).alias("s"),
            F.max(C("ts_us")).alias("last_ts_us"))
            .select("user_id", "n_events", C("s.last_event_id"),
                    "last_ts_us", C("s.last_event_type"), C("s.last_value")))
        if state["path"] is not None:
            prev = batch_df.sparkSession.read.parquet(state["path"])
            agg = (prev.unionByName(agg).groupBy("user_id")
                   .agg(F.sum("n_events").cast("bigint").alias("n_events"),
                        last.alias("s"),
                        F.max("last_ts_us").alias("last_ts_us"))
                   .select("user_id", "n_events", C("s.last_event_id"),
                           "last_ts_us", C("s.last_event_type"),
                           C("s.last_value")))
        out = os.path.join(run_dir, f"state_v{batch_id}")
        agg.write.mode("overwrite").parquet(out)
        state["path"] = out
        state["batches"] += 1

    t0 = time.perf_counter()
    q = (stream.writeStream.foreachBatch(merge_batch)
         .option("checkpointLocation", os.path.join(run_dir, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n_state = spark.read.parquet(state["path"]).count()
    return round(wall, 3), n_state, state["batches"]


def main() -> None:
    spark = get_spark(app_name="probe-upsert")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for mult in (1, 4, 20):
        d = exploded_events_dir(spark, mult)
        wall, n_state, batches = run_upsert(spark, d)
        rows = mult * 100_000  # sf0.1 events ~100k
        out[f"x{mult}"] = {"wall_s": wall, "state_rows": n_state,
                           "micro_batches": batches}
        print(json.dumps({f"x{mult}": out[f"x{mult}"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
