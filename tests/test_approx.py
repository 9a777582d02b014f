"""Accuracy contracts for the approximate-aggregation surface.

Since r6 the registered ops are ORACLE-checked at bound level (they emit
exact counts + `|approx − exact|/exact ≤ eps` booleans the DuckDB twin
asserts as literal TRUE). These tests keep the tighter VALUE-level
assertions: the booleans must actually hold, and the underlying estimates
— recomputed here directly, since the op surface no longer ships them —
must sit well inside the registered bounds.
"""

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from tests.conftest import SF_SMOKE

_ensure_loaded()


def test_approx_agg_bounds_hold_and_are_tight(spark):
    rows = OPS["q_approx_agg"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.hll_within_eps for r in rows), rows
    assert all(r.median_within_eps for r in rows), rows

    from agentic_data_pipeline_spark.catalog import load_table
    est = {r.o_orderpriority: r for r in
           load_table(spark, SF_SMOKE, "orders")
           .groupBy("o_orderpriority")
           .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("ac"),
                F.count_distinct("o_custkey").alias("ec"),
                F.percentile_approx("o_totalprice", 0.5, 10_000).alias("am"),
                F.percentile("o_totalprice", F.lit(0.4)).alias("p40"),
                F.percentile("o_totalprice", F.lit(0.6)).alias("p60"))
           .collect()}
    for r in rows:
        e = est[r.o_orderpriority]
        assert e.ec == r.exact_customers
        # HLL++ at rsd=0.02 — allow 3x headroom on the tiny smoke groups,
        # well inside the op's registered 10% driver bound.
        assert abs(e.ac - e.ec) <= max(3, 0.06 * e.ec), r
        # percentile_approx returns an actual element (not interpolated);
        # with accuracy=10k on sub-10k groups it must land inside the
        # exact p40-p60 band — far tighter than the 5% value bound.
        assert e.p40 <= e.am <= e.p60, (r, e)


def test_hll_rollup_merge_is_lossless(spark):
    """The op's booleans hold, AND the recomputed merged estimate is
    bit-identical to a direct sketch over the raw data (HLL union is
    lossless) and within tight HLL error of the exact count."""
    from agentic_data_pipeline_spark.catalog import events_with_ts

    out = OPS["ext_hll_rollup"].fn(spark, SF_SMOKE).collect()
    assert len(out) > 0
    assert all(r.merge_lossless for r in out), out
    assert all(r.within_eps for r in out), out

    ev = events_with_ts(spark, SF_SMOKE)
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", F.col("ts_us")).alias("hour"))
              .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")))
    merged = {r.event_type: r.m for r in
              hourly.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m"))
              .collect()}
    direct = {r.event_type: r.d for r in
              ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(14))).alias("d"))
              .collect()}
    exact = {r.event_type: r.d for r in
             ev.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("d")).collect()}
    assert merged == direct                   # mergeability: bit-identical
    for k, est in merged.items():
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k]), (k, est, exact[k])


def test_quantile_rollup_merge_lossless_and_estimate_tight(spark):
    """Booleans hold, AND the recomputed merged-histogram median sits
    within one bucket width of the exact interpolated median — tighter
    than the op's registered 10% relative bound."""
    from agentic_data_pipeline_spark.catalog import events_with_ts
    from agentic_data_pipeline_spark.operators.approx import (_QR_MAXB,
                                                              _QR_WIDTH)

    out = OPS["ext_quantile_rollup"].fn(spark, SF_SMOKE).collect()
    assert len(out) > 0
    assert all(r.merge_lossless for r in out), out
    assert all(r.median_within_eps for r in out), out

    ev = events_with_ts(spark, SF_SMOKE)
    exact = {r.event_type: r.m for r in
             ev.groupBy("event_type")
             .agg(F.percentile("value", F.lit(0.5)).alias("m")).collect()}
    # Recompute the merged-histogram estimate exactly as the op does and
    # assert the one-bucket-width error bound that justifies _QR_EPS.
    hist = (ev.groupBy("event_type",
                       F.least(F.floor(F.col("value") / _QR_WIDTH),
                               F.lit(_QR_MAXB)).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")).collect())
    by_type: dict[str, dict[int, int]] = {}
    for r in hist:
        by_type.setdefault(r.event_type, {})[r.bucket] = r.cnt
    for et, buckets in by_type.items():
        n = sum(buckets.values())
        target, cum = n / 2.0, 0
        for b in sorted(buckets):
            if cum + buckets[b] >= target:
                est = b * _QR_WIDTH + _QR_WIDTH * (target - cum) / buckets[b]
                break
            cum += buckets[b]
        assert abs(est - exact[et]) <= _QR_WIDTH, (et, est, exact[et])
