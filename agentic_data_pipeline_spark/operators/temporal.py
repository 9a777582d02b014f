"""Temporal join operators the task brief calls out: as-of join and range
join — neither exists as a single Spark primitive; both are expressed as
compositions of built-ins chosen for their shuffle behavior at 100 TB
(task-brief "custom operators" route (a): composition over UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, ts_us_long, ts_us_timestamp
from ..functions.helpers import cents
from ..registry import op

C = F.col


def asof_join_events(ev: DataFrame, probe_type: str, ref_type: str) -> DataFrame:
    """AS-OF: for each ``probe_type`` event, the nearest *preceding*
    ``ref_type`` event of the same user.

    Implementation: union-free single pass — sort each user's partition
    once, carry the last reference timestamp forward with
    last(..., ignorenulls) over an unbounded-preceding frame. ONE shuffle
    on user_id; no join, no explode — the classic merge-style as-of shape
    that survives any scale with a sane key cardinality.
    """
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    ref_ts = F.when(C("event_type") == ref_type, C("ts_us"))
    with_ref = ev.withColumn("asof_ref_us",
                             F.last(ref_ts, ignorenulls=True).over(w))
    return (
        with_ref.filter(C("event_type") == probe_type)
        .select(
            "event_id", "user_id",
            F.expr("ts_us div 1000000").alias("ts_epoch"),
            F.expr("asof_ref_us div 1000000").alias("asof_ref_epoch"),
            ((C("ts_us") - C("asof_ref_us")) / 1_000_000).cast("bigint")
            .alias("gap_seconds"),
        )
    )


@op("ext_asof_join", oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               epoch_us(ts) AS ts_us,
               LAST_VALUE(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING) AS asof_ref_us
        FROM events
    )
    SELECT event_id, user_id,
           CAST(ts_us // 1000000 AS BIGINT)                        AS ts_epoch,
           CAST(asof_ref_us // 1000000 AS BIGINT)                  AS asof_ref_epoch,
           CAST((ts_us - asof_ref_us) // 1000000 AS BIGINT)        AS gap_seconds
    FROM e
    WHERE event_type = 'error'
""")
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event paired with the user's most recent
    preceding purchase (µs precision shared with the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", ts_us_long(ev))
    return asof_join_events(ev, probe_type="error", ref_type="purchase")


# Value bands for the range join: [lo, hi) tiers of events.value.
BAND_WIDTH = 50


@op("ext_range_join", oracle=f"""
    SELECT t.tier_name,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           (CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0)
               AS sum_value
    FROM events e
    JOIN (VALUES ('t0', 0), ('t1', 1), ('t2', 2), ('t3', 3))
         AS t(tier_name, band)
      ON CAST(FLOOR(e.value / {BAND_WIDTH}) AS INT) = t.band
    GROUP BY t.tier_name
""")
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (value ∈ [lo, hi) tier) via the *binning* rewrite: when
    range boundaries are regular, `floor(value/width)` turns the range
    predicate into an equi-join key — a hash join instead of the
    broadcast-nested-loop plan a raw `BETWEEN` join degenerates to. The
    tier table is broadcast either way; binning is what keeps this a
    single-pass hash join when the build side is NOT broadcastable.
    """
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [(f"t{i}", i) for i in range(4)], "tier_name string, band int")
    binned = ev.withColumn(
        "band", F.floor(C("value") / BAND_WIDTH).cast("int"))
    return (
        binned.join(F.broadcast(tiers), "band")
        .groupBy("tier_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(cents(C("value")))
             .cast("double") / 100.0).alias("sum_value"),
        )
    )


@op("ext_gap_fill", oracle="""
    WITH hourly AS (
        SELECT event_type,
               DATE_TRUNC('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               (CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
                / 100.0) AS sum_value
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
    ), series AS (
        SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        FROM bounds
    )
    SELECT s.event_type,
           CAST(epoch(s.h) AS BIGINT)       AS bucket_epoch,
           COALESCE(hourly.cnt, 0)          AS cnt,
           COALESCE(hourly.sum_value, 0.0)  AS sum_value,
           LAST_VALUE(hourly.sum_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.h
               ROWS UNBOUNDED PRECEDING)    AS locf_value
    FROM series s LEFT JOIN hourly USING (event_type, h)
""")
def ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (hypertable `time_bucket_gapfill` shape):
    per event type, the dense hourly series between that type's first and
    last event — missing hours materialized with zero counts plus a
    last-observation-carried-forward value column.

    Shape at scale: the hourly pre-aggregation collapses the raw stream to
    (#types × #hours) rows BEFORE the series is generated, so the dense
    grid (sequence + explode) and the LOCF window run on bucket-cardinality
    data — gap filling never touches raw-event volume. One shuffle for the
    pre-agg, one bucket-sized one for the window.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", ts_us_timestamp(ev))
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", C("ts_us")).alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             (F.sum(cents(C("value"))).cast("double") / 100.0)
             .alias("sum_value"))
    )
    series = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select("event_type",
                F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR")))
                .alias("h"))
    )
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        series.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.unix_timestamp("h").cast("bigint").alias("bucket_epoch"),
            F.coalesce(C("cnt"), F.lit(0)).alias("cnt"),
            F.coalesce(C("sum_value"), F.lit(0.0)).alias("sum_value"),
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )
