"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §1.1 — the only loop is the
Streamlit rerun loop); this module is the forward-looking twin of the batch
`q_tumble` operator: the *same* tumbling-window aggregation expressed over
`readStream`, with a watermark for late data. Batch and stream share the
window operator, which is the Spark-native way to keep the two planes
consistent (kappa-style: one query definition, two execution modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from ..functions.helpers import dec_sum
from ..session import tune

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("ts", LongType(), True),          # epoch nanos (see catalog)
    StructField("user_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
    StructField("props", StringType(), True),
])


def stream_tumbling_agg(spark: SparkSession, input_dir: str,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling-window counts/sums over an events file stream.

    Watermark bounds state: buckets older than (max event time − watermark)
    finalize and evict — the knob that keeps a 100 TB/day stream's state
    finite. Output mirrors q_tumble (epoch-second buckets).
    """
    tune(spark)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
        .withColumn("ts_us", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts_us", watermark)
    )
    return (
        stream.groupBy(F.window("ts_us", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dec_sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("bucket_epoch"),
            "event_type", "cnt", "sum_value",
        )
    )


def stream_to_bronze(spark: SparkSession, input_dir: str, lake_dir: str,
                     name: str, checkpoint_dir: str) -> str:
    """Streaming ingestion into the bronze lake via foreachBatch: each
    micro-batch appends through the same write_bronze path batch ingestion
    uses (one sink implementation, two execution modes). Exactly-once comes
    from the checkpoint + parquet append idempotence per epoch.

    Returns the bronze path.
    """
    import os

    from ..sources.bronze import bronze_path, write_bronze

    tune(spark)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_bronze(batch_df, lake_dir, name, mode="append")

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return bronze_path(lake_dir, name)


def run_stream_to_table(spark: SparkSession, input_dir: str, table: str,
                        window: str = "1 hour") -> None:
    """Drive the stream with availableNow (process-everything-then-stop) into
    an in-memory sink table — the batch-parity harness used by tests and the
    stream_tumble verification query."""
    q = (
        stream_tumbling_agg(spark, input_dir, window=window)
        .writeStream.format("memory").queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
