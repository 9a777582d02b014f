"""Streaming op registrations (batch-parity checked).

stream_tumble runs a real Structured Streaming job (availableNow trigger)
and returns its result table; since a single-run availableNow pass drops
nothing at the watermark, the output equals batch q_tumble — so it shares
the same DuckDB oracle, giving the streaming plane a hash-parity check too.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table_path
from ..registry import op
from ..streaming.windows import run_stream_to_table
from .sessionize import SESSIONIZE_ORACLE as _SESSIONIZE_ORACLE


def _as_stream_dir(parquet_path: str) -> str:
    """The file stream source requires a *directory*; the fixtures are single
    parquet files — expose each via a scratch dir with a symlink."""
    if os.path.isdir(parquet_path):
        return parquet_path
    d = os.path.join("/root/repo/.tmp", "stream_src",
                     parquet_path.strip("/").replace("/", "_"))
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "part-0.parquet")
    if not os.path.exists(link):
        os.symlink(parquet_path, link)
    return d


@op("stream_tumble", oracle="""
    SELECT CAST(epoch(DATE_TRUNC('hour', ts)) AS BIGINT)       AS bucket_epoch,
           event_type,
           CAST(COUNT(*) AS BIGINT)                            AS cnt,
           (CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0)   AS sum_value
    FROM events
    GROUP BY 1, 2
""")
def stream_tumble_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg over events via readStream (availableNow)."""
    table = f"stream_tumble_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(spark, _as_stream_dir(table_path(sf_dir, "events")), table)
    return spark.table(table)


@op("stream_sliding", oracle="""
    WITH e AS (
        SELECT unnest([CAST(epoch(DATE_TRUNC('hour', ts)) AS BIGINT),
                       CAST(epoch(DATE_TRUNC('hour', ts)) AS BIGINT) - 3600])
                   AS bucket_epoch,
               event_type, value
        FROM events
    )
    SELECT bucket_epoch, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           (CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0)
               AS sum_value
    FROM e
    GROUP BY 1, 2
""")
def stream_sliding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window agg (2h window / 1h slide) via readStream: every event
    contributes to exactly two buckets. Oracle models window assignment by
    unnesting each event into its two slide-aligned window starts."""
    from ..streaming.windows import run_to_memory, stream_sliding_agg

    table = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    sdf = stream_sliding_agg(
        spark, _as_stream_dir(table_path(sf_dir, "events")))
    run_to_memory(sdf, table, output_mode="complete")
    return spark.table(table)


@op("stream_dedup", oracle="""
    SELECT DISTINCT user_id, event_type FROM events
""")
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via dropDuplicates state: the distinct
    (user_id, event_type) pairs, hash-equal to batch SELECT DISTINCT.
    Scale note in stream_distinct: unbounded streams swap in
    dropDuplicatesWithinWatermark for TTL'd state."""
    from ..streaming.windows import run_to_memory, stream_distinct

    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    sdf = stream_distinct(spark, _as_stream_dir(table_path(sf_dir, "events")))
    run_to_memory(sdf, table, output_mode="append")
    return spark.table(table)


@op("stream_dedup_watermark", oracle="""
    SELECT DISTINCT user_id, event_type FROM events
""")
def stream_dedup_watermark_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with WATERMARK-TTL'd state
    (dropDuplicatesWithinWatermark) — the unbounded-stream twin of
    stream_dedup: state rows evict once the horizon passes instead of
    accumulating forever. Horizon covers the bounded fixture, so the
    result hash-equals exact SELECT DISTINCT."""
    from ..streaming.windows import (
        run_to_memory, stream_distinct_within_watermark,
    )

    table = f"stream_dedup_wm_{uuid.uuid4().hex[:8]}"
    sdf = stream_distinct_within_watermark(
        spark, _as_stream_dir(table_path(sf_dir, "events")))
    run_to_memory(sdf, table, output_mode="append")
    return spark.table(table)


@op("stream_join", oracle="""
    SELECT n.n_name AS nation, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           (CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0)
               AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
""")
def stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: event stream joined to broadcast
    customer→nation dims, aggregated per (nation, event_type)."""
    from ..catalog import load_table
    from ..streaming.windows import run_to_memory, stream_static_enrich

    table = f"stream_join_{uuid.uuid4().hex[:8]}"
    sdf = stream_static_enrich(
        spark, _as_stream_dir(table_path(sf_dir, "events")),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"))
    run_to_memory(sdf, table, output_mode="complete")
    return spark.table(table)


@op("stream_sessionize", oracle=_SESSIONIZE_ORACLE)
def stream_sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    gap-based sessions per user, carrying (last_ts, session_id) state across
    micro-batches. A single availableNow pass reproduces the batch
    ext_sessionize result exactly, so it shares that op's DuckDB oracle —
    hash-parity for the hardest streaming API in the surface."""
    from ..streaming.sessions import run_sessionize_to_table

    table = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    run_sessionize_to_table(
        spark, _as_stream_dir(table_path(sf_dir, "events")), table)
    return spark.table(table)


@op("stream_stream_join", oracle="""
    SELECT e1.event_id AS err_id,
           e2.event_id AS click_id,
           e1.user_id
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >= e1.ts - INTERVAL 1 HOUR
     AND e2.ts <= e1.ts
    WHERE e1.event_type = 'error'
      AND e2.event_type = 'click'
""")
def stream_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (errors × same-user clicks within the
    preceding hour), both sides watermarked so join state evicts by event
    time. availableNow single-pass equals the batch interval join, so the
    hardest stateful join in the surface gets a hash-parity check too."""
    from ..streaming.windows import run_to_memory, stream_interval_join

    table = f"stream_ssj_{uuid.uuid4().hex[:8]}"
    sdf = stream_interval_join(
        spark, _as_stream_dir(table_path(sf_dir, "events")))
    run_to_memory(sdf, table, output_mode="append")
    return spark.table(table)


@op("stream_to_bronze", oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           (CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0)
               AS sum_value
    FROM events
    GROUP BY event_type
""")
def stream_to_bronze_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion into the bronze lake (foreachBatch → the same
    write_bronze sink batch ingestion uses; availableNow trigger +
    checkpoint for exactly-once). The op verifies the WHOLE loop: stream
    the events fixture into a scratch bronze dataset, read the bronze
    parquet back, and aggregate — hash-equal to aggregating the source
    directly iff no row was lost or doubled."""
    from ..functions.helpers import dec_sum
    from ..sources.bronze import read_bronze
    from ..streaming.windows import stream_to_bronze

    scratch = os.path.join("/root/repo/.tmp", "stream_bronze",
                           uuid.uuid4().hex[:8])
    path_lake = os.path.join(scratch, "lake")
    stream_to_bronze(spark, _as_stream_dir(table_path(sf_dir, "events")),
                     path_lake, "events_rt",
                     os.path.join(scratch, "ckpt"))
    df = read_bronze(spark, path_lake, "events_rt")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        dec_sum("value").alias("sum_value"))
