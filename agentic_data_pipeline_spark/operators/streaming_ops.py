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

from ..catalog import table_path
from ..registry import op
from ..streaming.windows import run_stream_to_table


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
