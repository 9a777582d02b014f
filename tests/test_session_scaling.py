"""Volume-gated session tuning: shuffle-partition count and the runtime
bloom-filter ratchet both follow the caller-declared data volume
(session.apply_scaled_shuffle). The bloom gate exists because the
fixed build-side-aggregate overhead only amortizes past
BLOOM_MIN_FACT_ROWS (r9 three-tier measurement, BASELINE.md)."""

from agentic_data_pipeline_spark.session import (
    BLOOM_MIN_FACT_ROWS, SHUFFLE_ROWS_PER_PARTITION, apply_scaled_shuffle,
    default_parallelism, scaled_shuffle_partitions,
)

BLOOM_KEY = "spark.sql.optimizer.runtime.bloomFilter.enabled"


def test_scaled_partitions_follow_volume():
    cores = default_parallelism()
    assert scaled_shuffle_partitions(0) == cores
    assert scaled_shuffle_partitions(100 * SHUFFLE_ROWS_PER_PARTITION) \
        == max(cores, 100)


def test_bloom_gate_is_a_ratchet(spark):
    spark.conf.set(BLOOM_KEY, "false")
    apply_scaled_shuffle(spark, 600_000)        # sf0.1-scale: stays off
    assert spark.conf.get(BLOOM_KEY) == "false"
    apply_scaled_shuffle(spark, BLOOM_MIN_FACT_ROWS)   # tier declaration
    assert spark.conf.get(BLOOM_KEY) == "true"
    apply_scaled_shuffle(spark, 2_000)          # op-local small call must
    assert spark.conf.get(BLOOM_KEY) == "true"  # NOT un-ratchet the tier
    spark.conf.set(BLOOM_KEY, "false")          # restore for other tests
