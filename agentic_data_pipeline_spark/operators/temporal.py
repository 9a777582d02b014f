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


FUNNEL_STEPS = ("view", "click", "purchase")

_FUNNEL_SQL = """
    WITH s1 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        GROUP BY 1
    )
    SELECT * FROM (
        SELECT 1 AS step, 'view' AS event_type,
               CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        UNION ALL
        SELECT 2, 'click',    CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        UNION ALL
        SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    )
"""


@op("ext_funnel", oracle=_FUNNEL_SQL)
def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): users counted at
    step k must have performed step k strictly AFTER their first completion
    of step k-1 — the product-analytics op every event warehouse grows.

    Shape at scale: each stage is one aggregation on user_id reusing the
    SAME key partitioning (Catalyst plans the s1→s2→s3 chain as joins on
    the user_id exchange already in place — no new shuffle per stage), and
    the stage tables shrink monotonically (funnel property), so cost is
    dominated by the first events scan. The 3-row result is three scalar
    counts unioned driver-free.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("us", ts_us_long(ev))
    stage = None
    counts = []
    for step, evt in enumerate(FUNNEL_STEPS, start=1):
        part = ev.filter(C("event_type") == evt).select("user_id", "us")
        if stage is not None:
            part = (part.join(stage, "user_id")
                    .filter(C("us") > C("prev_t"))
                    .select("user_id", "us"))
        stage = part.groupBy("user_id").agg(F.min("us").alias("prev_t"))
        counts.append(
            stage.agg(F.lit(step).alias("step"),
                      F.lit(evt).alias("event_type"),
                      F.count(F.lit(1)).alias("n_users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


@op("ext_retention", oracle="""
    WITH fd AS (
        SELECT user_id, MIN(DATE_TRUNC('day', ts)) AS d0
        FROM events GROUP BY 1
    )
    SELECT CAST(epoch(fd.d0) AS BIGINT)                              AS cohort_epoch,
           CAST(date_diff('day', fd.d0, DATE_TRUNC('day', e.ts)) AS INT)
                                                                     AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT)                 AS n_users
    FROM events e JOIN fd ON fd.user_id = e.user_id
    GROUP BY 1, 2
""")
def ext_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day (cohort),
    counted as retained for every later day they produce any event — the
    other canonical product-analytics aggregation beside ext_funnel.

    Shape at scale: the first-seen table is ONE aggregation on user_id;
    the events⋈first_day join reuses that user_id partitioning, and the
    final COUNT(DISTINCT user) per (cohort, offset) is a two-phase
    aggregate. Cohort tables are (days × offsets) tiny — the output never
    scales with event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", ts_us_timestamp(ev))
    with_day = ev.select("user_id", day.alias("d"))
    fd = with_day.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        with_day.join(fd, "user_id")
        .groupBy(
            F.unix_timestamp("d0").cast("bigint").alias("cohort_epoch"),
            F.datediff(C("d"), C("d0")).cast("int").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
