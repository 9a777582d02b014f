"""Accuracy contracts for the approximate-aggregation surface (rows-only
ops can't be oracle-checked — SURVEY §5 bans approx functions from
hash-parity — so their error bounds are asserted here instead)."""

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from tests.conftest import SF_SMOKE

_ensure_loaded()


def test_approx_agg_within_error(spark):
    rows = OPS["q_approx_agg"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    from agentic_data_pipeline_spark.catalog import load_table
    bands = {r.o_orderpriority: (r.p40, r.p60) for r in
             load_table(spark, SF_SMOKE, "orders")
             .groupBy("o_orderpriority")
             .agg(F.percentile("o_totalprice", F.lit(0.4)).alias("p40"),
                  F.percentile("o_totalprice", F.lit(0.6)).alias("p60"))
             .collect()}
    for r in rows:
        # HLL++ at rsd=0.02 — allow 3x headroom on the tiny smoke groups.
        assert abs(r.approx_customers - r.exact_customers) \
            <= max(3, 0.06 * r.exact_customers), r
        # percentile_approx returns an actual element (not interpolated);
        # with accuracy=10k on sub-10k groups it must land inside the
        # exact p40-p60 band.
        p40, p60 = bands[r.o_orderpriority]
        assert p40 <= r.approx_median_price <= p60, (r, p40, p60)


def test_hll_rollup_merge_is_lossless(spark):
    """Merged hourly sketches == one sketch over the raw data (HLL union is
    lossless), and within HLL error of the exact distinct count."""
    from agentic_data_pipeline_spark.catalog import events_with_ts

    merged = {r.event_type: r.merged_distinct_users
              for r in OPS["ext_hll_rollup"].fn(spark, SF_SMOKE).collect()}
    ev = events_with_ts(spark, SF_SMOKE)
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
