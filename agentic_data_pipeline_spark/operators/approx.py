"""Approximate aggregation surface: sketches and quantile estimates.

Nothing in the reference uses approximation (its DuckDB calls are exact,
reference engine.py:58-63) — but at the 100 TB design point exact
COUNT(DISTINCT) is a full shuffle of every distinct key and exact
percentiles are a sort per group, while sketches are single-pass, bounded
memory, and *mergeable* — the property that makes tiered rollups work:
sketch per partition/day, merge upward, never rescan. SURVEY.md §5 bans
approximate VALUES from oracle-checked queries (estimates are
engine-specific), so these ops hash-check their accuracy CONTRACTS
instead: the emitted columns are exact counts (integer, cross-engine
exact) plus booleans `abs(approx − exact)/exact ≤ eps` that the DuckDB
twin asserts as literal TRUE — a bound violation flips a boolean and
fails the hash, so the sketch's error contract is driver-checked without
ever hashing an estimate. Value-level accuracy stays pytest-asserted too
(tests/test_approx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import op

C = F.col


# HLL++ rsd=0.02 → observed error is a few ×rsd worst-case; 0.10 is a
# loose-but-meaningful driver bound (value-level tightness is pytest's
# job). percentile_approx at accuracy 10k has rank error ≤ n/10k —
# near-exact at fixture scale; 0.05 relative keeps the bound meaningful
# if a tier ever pushes groups past the summary size.
_HLL_EPS = 0.10
_MEDIAN_EPS = 0.05


@op("q_approx_agg", oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS hll_within_eps,
           TRUE AS median_within_eps,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
""")
def q_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates per order priority: HLL++ distinct customers
    and a KLL-style approximate median, BOUND-CHECKED against their exact
    twins computed in the same pass.

    One pass, no extra distinct-shuffle for the sketch: approx_count_
    distinct keeps a fixed ~kilobyte HLL register set per group;
    percentile_approx a bounded summary. The emitted surface is exact
    counts + `|approx − exact|/exact ≤ eps` booleans; the DuckDB oracle
    recomputes the exact columns and asserts the booleans as literal
    TRUE, so an out-of-bound estimate fails the driver hash — the
    approximate family's error contract is oracle-checked without
    hashing an engine-specific estimate (estimates themselves stay
    pytest-asserted at value level, tests/test_approx.py).
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx_c"),
        F.count_distinct("o_custkey").alias("exact_customers"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("__approx_m"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("__exact_m"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority", "exact_customers",
        (F.abs(C("__approx_c") - C("exact_customers"))
         / C("exact_customers") <= _HLL_EPS).alias("hll_within_eps"),
        (F.abs(C("__approx_m") - C("__exact_m"))
         / C("__exact_m") <= _MEDIAN_EPS).alias("median_within_eps"),
        "n_orders",
    )


@op("ext_hll_rollup", oracle=f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT DATE_TRUNC('hour', ts)) AS BIGINT)
               AS n_hourly_sketches,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
           TRUE AS merge_lossless,
           TRUE AS within_eps
    FROM events GROUP BY event_type
""")
def ext_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-(event_type, hour) HLL sketches of
    distinct users, merged upward to per-event_type totals WITHOUT
    rescanning the events — the tiered-rollup pattern (hypertable-style)
    that makes distinct-count dashboards O(sketch) instead of O(data) at
    100 TB.

    Both invariants are now ORACLE-checked (not just pytest): the emitted
    booleans assert (a) merge-losslessness — the union-merged estimate
    equals the estimate of a sketch built directly over the raw rows, the
    property that makes tiered rollups sound — and (b) the merged
    estimate is within eps of the exact distinct count; DuckDB emits
    literal TRUE plus the exact counts, so either violation fails the
    driver hash. The exact-count branch exists only to *check* the
    sketch; a production rollup ships the sketch branch alone.
    """
    from ..catalog import events_with_ts

    ev = events_with_ts(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", C("ts_us")).alias("hour"))
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    )
    merged = (
        hourly.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
             .alias("__merged"),
             F.count(F.lit(1)).alias("n_hourly_sketches"))
    )
    direct = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14)))
             .alias("__direct"),
             F.count_distinct("user_id").alias("exact_distinct_users"))
    )
    return merged.join(direct, "event_type").select(
        "event_type", "n_hourly_sketches", "exact_distinct_users",
        (C("__merged") == C("__direct")).alias("merge_lossless"),
        (F.abs(C("__merged") - C("exact_distinct_users"))
         / C("exact_distinct_users") <= _HLL_EPS).alias("within_eps"),
    )


@op("ext_histogram_rollup", oracle="""
    SELECT event_type,
           CAST(LEAST(FLOOR(value / 20.0), 24) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY 1, 2
""")
def ext_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable EXACT histogram rollup: per-(event_type, hour) equi-width
    bucket counts merged upward to per-event_type histograms by summing —
    the deterministic cousin of the HLL rollup (ext_hll_rollup) and the
    structure behind quantile dashboards at 100 TB: histograms are
    integer-mergeable with zero loss, so the tiered rollup (sketch per
    partition/day, merge upward, never rescan) is hash-checkable against
    bucketing the raw data directly — which is exactly what the oracle
    does, proving merge-losslessness, not just plausibility.

    Two-level plan: the hourly pre-aggregate shuffles once on (type, hour,
    bucket) — partial agg map-side — and the merge is a second tiny
    shuffle over rollup rows (bounded by types × hours × 25 buckets),
    never the events table.
    """
    from ..catalog import events_with_ts

    ev = events_with_ts(spark, sf_dir)
    bucket = F.least(F.floor(C("value") / 20.0), F.lit(24)).cast("int")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", C("ts_us")).alias("hour"),
                         bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    return (hourly.groupBy("event_type", "bucket")
            .agg(F.sum("cnt").cast("bigint").alias("cnt")))


# Quantile-rollup bucket geometry: width-2 equi-width buckets capped at
# 255 cover the events.value range (0–490 in the fixtures) with ≤ one
# bucket width of interpolation error; at median ≈ 34 that is ≲ 6%
# relative, so the 0.10 bound below is loose-but-meaningful the same way
# _HLL_EPS is.
_QR_WIDTH = 2.0
_QR_MAXB = 255
_QR_EPS = 0.10


@op("ext_quantile_rollup", oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT DATE_TRUNC('hour', ts)) AS BIGINT)
               AS n_hourly_histograms,
           ROUND(quantile_cont(value, 0.5), 6) AS exact_median,
           TRUE AS merge_lossless,
           TRUE AS median_within_eps
    FROM events GROUP BY event_type
""")
def ext_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiered QUANTILE rollup: per-(event_type, hour) equi-width
    histograms of `value`, integer-merged upward, median estimated from
    the MERGED histogram by linear interpolation — the quantile cousin of
    ext_hll_rollup and the structure behind latency/price percentile
    dashboards at 100 TB, where an exact per-window percentile is a sort
    per group but histogram merge is a sum.

    Oracle-checked contracts, same design as the HLL rollup (estimates
    are never hashed): (a) merge-losslessness — the hour-merged histogram
    equals the histogram built directly over the raw rows, bucket by
    bucket (integer counts, exact), which is what makes the tiered rollup
    sound; (b) the interpolated median from the merged histogram is
    within eps of the exact interpolated percentile. DuckDB emits the
    exact median + literal TRUE booleans; either violation flips a
    boolean and fails the driver hash.

    Plan: one shuffle on (type, hour, bucket) with map-side partial agg,
    then rollup-sized merges and a window over ≤256 buckets per type —
    the events table is scanned twice only because the *check* needs the
    exact twin; a production rollup ships the histogram branch alone.
    """
    from ..catalog import events_with_ts
    from pyspark.sql import Window

    ev = events_with_ts(spark, sf_dir)
    bucket = F.least(F.floor(C("value") / _QR_WIDTH),
                     F.lit(_QR_MAXB)).cast("int")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", C("ts_us")).alias("hour"),
                         bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    merged = (hourly.groupBy("event_type", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    direct = (ev.groupBy("event_type", bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("cnt")))

    # (a) bucket-exact merge equality (full outer: a bucket missing on
    # either side with nonzero count on the other is a violation).
    lossless = (
        merged.select("event_type", "bucket", C("cnt").alias("m_cnt"))
        .join(direct.select("event_type", "bucket", C("cnt").alias("d_cnt")),
              ["event_type", "bucket"], "full_outer")
        .groupBy("event_type")
        .agg(F.bool_and(F.coalesce(C("m_cnt"), F.lit(0))
                        == F.coalesce(C("d_cnt"), F.lit(0)))
             .alias("merge_lossless"))
    )

    # (b) interpolated median from the MERGED histogram: cumulative
    # counts over ≤256 buckets per type, pick the bucket whose cumsum
    # crosses n/2, interpolate within it.
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = merged.withColumn("cum", F.sum("cnt").over(w))
    tot = merged.groupBy("event_type").agg((F.sum("cnt") / 2.0)
                                           .alias("target"))
    est = (
        cum.join(tot, "event_type")
        .filter((C("cum") >= C("target"))
                & (C("cum") - C("cnt") < C("target")))
        .select("event_type",
                (C("bucket") * _QR_WIDTH
                 + _QR_WIDTH * (C("target") - (C("cum") - C("cnt")))
                 / C("cnt")).alias("est_median"))
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct(F.date_trunc("hour", C("ts_us")))
        .alias("n_hourly_histograms"),
        F.percentile("value", F.lit(0.5)).alias("__exact"),
    )
    return (
        exact.join(lossless, "event_type").join(est, "event_type")
        .select("event_type", "n_hourly_histograms",
                F.round(C("__exact"), 6).alias("exact_median"),
                "merge_lossless",
                (F.abs(C("est_median") - C("__exact")) / C("__exact")
                 <= _QR_EPS).alias("median_within_eps"))
    )
