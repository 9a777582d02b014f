"""Multi-table catalog over the parquet lake.

The reference's "catalog" is one parquet file per dataset addressed by name
(reference engine.py:14,46-56) and one magic SQL binding ``CURRENT_TABLE``
that is string-substituted with a file path (engine.py:58-63). Here the
catalog is a real multi-table namespace: each dataset is a (partitioned)
parquet directory or file, loaded lazily as a DataFrame and registered as a
temp view, so Spark SQL sees every table at once and Catalyst gets partition
pruning + filter pushdown on the scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

# The fixture tables (TESTDATA.md). `events.ts` has shipped as either INT64
# nanos (r1 lake) or a real parquet TIMESTAMP (r2 lake) — see ts_us_long /
# ts_us_timestamp for the canonical schema-sniffing conversion.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one dataset from the lake directory.

    Mirrors reference engine.py:52-56 semantics *except* the empty-on-missing
    fallback, which lives in sources.bronze.read_bronze — for catalog reads a
    missing fixture is a hard error (fail fast beats silently-empty analytics).
    """
    tune(spark)  # nanosAsLong + UTC must be set before the parquet footer read
    return spark.read.parquet(table_path(sf_dir, name))


def ts_us_long(ev: DataFrame):
    """µs-since-epoch BIGINT expression for `events.ts`, schema-robust.

    The lake has shipped events.ts two ways: INT64 TIMESTAMP(NANOS) (read as
    LONG under nanosAsLong) and plain parquet TIMESTAMP (µs, read as
    TIMESTAMP_NTZ). Both reduce to the same µs integer DuckDB's
    ``epoch_us(ts)`` yields — nanos truncate, µs are exact (session tz is
    pinned UTC by session.tune, so the NTZ→instant cast is identity).
    """
    from pyspark.sql.types import LongType

    if isinstance(ev.schema["ts"].dataType, LongType):
        return F.expr("ts div 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def ts_us_timestamp(ev: DataFrame):
    """µs-precision TIMESTAMP expression for `events.ts` (twin of
    ts_us_long for window/date_trunc call sites)."""
    from pyspark.sql.types import LongType

    if isinstance(ev.schema["ts"].dataType, LongType):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events plus a usable µs-precision timestamp column `ts_us`."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", ts_us_timestamp(ev))


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every lake table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def bind_current_table(spark: SparkSession, df: DataFrame) -> None:
    """Bind a DataFrame to the reference's magic table name.

    The reference substitutes ``CURRENT_TABLE`` with a parquet path string
    before handing SQL to DuckDB (engine.py:62). With a real catalog the
    binding is just a temp view — no string surgery in the SQL text, and
    Catalyst resolves it like any other relation.
    """
    df.createOrReplaceTempView("CURRENT_TABLE")


def numeric_columns(df: DataFrame) -> list[str]:
    """Names of numeric columns (reference app.py:236 `select_dtypes` helper)."""
    from pyspark.sql.types import NumericType

    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
