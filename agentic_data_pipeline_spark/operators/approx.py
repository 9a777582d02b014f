"""Approximate aggregation surface: sketches and quantile estimates.

Nothing in the reference uses approximation (its DuckDB calls are exact,
reference engine.py:58-63) — but at the 100 TB design point exact
COUNT(DISTINCT) is a full shuffle of every distinct key and exact
percentiles are a sort per group, while sketches are single-pass, bounded
memory, and *mergeable* — the property that makes tiered rollups work:
sketch per partition/day, merge upward, never rescan. SURVEY.md §5 bans
approximate functions from oracle-checked queries (nondeterministic vs
DuckDB), so these register rows-only; their accuracy contracts are
pytest-asserted against exact twins instead (tests/test_approx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import op

C = F.col


@op("q_approx_agg")  # rows-only: HLL/KLL estimates are engine-specific
def q_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates per order priority: HLL++ distinct customers
    and approximate totalprice percentiles next to their exact twins.

    One pass, no distinct-shuffle: approx_count_distinct keeps a fixed
    ~kilobyte HLL register set per group; percentile_approx a bounded
    KLL-style summary. The exact columns exist so the accuracy gap is
    visible in the result itself (and asserted in tests).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02)
            .alias("approx_customers"),
            F.count_distinct("o_custkey").alias("exact_customers"),
            F.percentile_approx("o_totalprice", 0.5, 10_000)
            .alias("approx_median_price"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("exact_median_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@op("ext_hll_rollup")  # rows-only: sketch bytes are engine-specific
def ext_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-(event_type, hour) HLL sketches of
    distinct users, merged upward to per-event_type totals WITHOUT
    rescanning the events — the tiered-rollup pattern (hypertable-style)
    that makes distinct-count dashboards O(sketch) instead of O(data) at
    100 TB.

    Correctness invariant (pytest): the merged estimate equals the estimate
    of a sketch built directly over the raw data (HLL union is lossless),
    and is within the configured error of the exact distinct count.
    """
    from ..catalog import events_with_ts

    ev = events_with_ts(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", C("ts_us")).alias("hour"))
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    )
    return (
        hourly.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .alias("merged_distinct_users"),
            F.count(F.lit(1)).alias("n_hourly_sketches"),
        )
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
