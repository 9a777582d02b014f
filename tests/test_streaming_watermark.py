"""Multi-batch watermark semantics (the availableNow single-pass tests
elsewhere can't exercise these — one micro-batch never advances the
watermark mid-run). Two parquet files + maxFilesPerTrigger=1 force two
micro-batches through the same stateful aggregation.

What Spark GUARANTEES (and we assert): late rows still inside the
watermark horizon are merged into their open window's state, and append
mode emits each window exactly once — only after the watermark passes its
end. (Dropping of too-late rows is explicitly best-effort in Spark's
contract — observed here: a too-late row gets a fresh state row that is
evicted the same batch — so no test pins that behavior.)
"""

import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from agentic_data_pipeline_spark.streaming.windows import EVENTS_SCHEMA

HOUR_US = 3_600 * 1_000_000
BASE_US = 1_700_000_000 * 1_000_000  # 2023-11-14T22:13:20Z — NOT hour-aligned


def _write_events(path: str, hours: list[int]) -> None:
    n = len(hours)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([BASE_US + h * HOUR_US + i
                        for i, h in enumerate(hours)], pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["click"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    }), path)


def test_late_within_watermark_merges_and_emits_once(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # Batch 1: hours 10,11,12 → watermark after the batch = 12h − 2h = 10h.
    _write_events(os.path.join(src, "f1.parquet"), [10, 11, 12])
    time.sleep(1.1)  # distinct mtime → stable file order
    # Batch 2: a LATE row for hour 10 (its window [10h,11h) ends at 11h,
    # which is ahead of the 10h watermark → must merge into the open
    # bucket) plus a punctual row at 14 (advances the watermark to 12h,
    # finalizing buckets 10 and 11).
    _write_events(os.path.join(src, "f2.parquet"), [10, 14])

    agg = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts_us", F.col("ts").cast("timestamp"))
        .withWatermark("ts_us", "2 hours")
        .groupBy(F.window("ts_us", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            ((F.unix_timestamp("w.start") - BASE_US // 1_000_000) / 3600)
            .cast("int").alias("rel_hour"),
            "cnt",
        )
    )
    table = f"wm_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(table)
         .outputMode("append")        # append = emit only finalized buckets
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    assert len(q.recentProgress) >= 2, "expected two micro-batches"

    got = {r.rel_hour: r.cnt for r in spark.table(table).collect()}
    # Windows are aligned to the wall-clock hour and BASE is offset from
    # it, so "hour h" events land in the window starting at rel_hour h-1.
    # Bucket for hour 10 must contain BOTH rows: the batch-1 original and
    # the batch-2 late arrival (merge, not drop, not double-emit).
    assert got.get(9) == 2, got
    assert got.get(10) == 1, got                    # hour-11 row, finalized
    # Open buckets (hour 12 and 14 — at/after the final 12h watermark)
    # must NOT have been emitted by append mode.
    assert all(h <= 10 for h in got), got


def _write_typed_events(path: str, rows: list[tuple[int, int, str]]) -> None:
    """rows = [(event_id, hour_offset, event_type)] for one user."""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([BASE_US + r[1] * HOUR_US for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), path)


def test_stream_stream_join_matches_and_evicts_across_batches(spark, tmp_path):
    """Two micro-batches through the stream-stream interval join: a click
    must match errors arriving in a LATER batch while it is inside the
    buffer horizon, and state metrics must show eviction once the
    watermark passes (the property that bounds the join at 100 TB/day —
    single-pass parity tests can't see either)."""
    from agentic_data_pipeline_spark.streaming.windows import (
        stream_interval_join,
    )

    src = str(tmp_path / "ssj_src")
    os.makedirs(src)
    # Batch 1: click@h0 and error@h0.5 — in-batch pair (click within the
    # 1h lookback). Use half-hour = minute offsets via fractional hours:
    # stick to whole hours for clarity: click@h0, error@h0 (same ts pairs).
    _write_typed_events(os.path.join(src, "f1.parquet"),
                        [(1, 0, "click"), (2, 0, "error")])
    time.sleep(1.1)
    # Batch 2: error@h1 — exactly 1h after the click: still within the
    # [err−1h, err] bound, and the click is still buffered (watermark
    # after batch 1 = 0h − 2h). Plus far-future events on BOTH sides at
    # h9: the global watermark is the MIN across the two stream sides, so
    # both must advance for it to reach 7h.
    _write_typed_events(os.path.join(src, "f2.parquet"),
                        [(3, 1, "error"), (4, 9, "click"), (6, 9, "error")])
    time.sleep(1.1)
    # Batch 3: punctual events far beyond — eviction happens at the START
    # of the batch AFTER the watermark advanced, so a third batch is
    # needed to observe it in the state metrics.
    _write_typed_events(os.path.join(src, "f3.parquet"),
                        [(5, 20, "click"), (7, 20, "error")])

    sdf = stream_interval_join(spark, src)
    table = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (sdf.writeStream.format("memory").queryName(table)
         .outputMode("append")
         .option("maxFilesPerTrigger", 1)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    assert len(q.recentProgress) >= 2, "expected two micro-batches"

    got = {(r.err_id, r.click_id) for r in spark.table(table).collect()}
    # error@h0 × click@h0 (same-batch), error@h1 × click@h0 (cross-batch:
    # the buffered click matched a later error), plus the same-ts pairs at
    # h9 and h20.
    assert got == {(2, 1), (3, 1), (6, 4), (7, 5)}, got

    # State must have been evicted once the watermark passed h1+lookback:
    # the last progress with state shows fewer buffered rows than the peak.
    rows_by_batch = [p["stateOperators"][0]["numRowsTotal"]
                     for p in (q.recentProgress or []) if p["stateOperators"]]
    assert rows_by_batch and rows_by_batch[-1] < max(rows_by_batch), \
        rows_by_batch
