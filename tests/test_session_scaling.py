"""Volume-gated session tuning: shuffle-partition count and the runtime
bloom-filter ratchet both follow the caller-declared data volume
(session.apply_scaled_shuffle). The bloom gate exists because the
fixed build-side-aggregate overhead only amortizes past
BLOOM_MIN_FACT_ROWS (r9 three-tier measurement, BASELINE.md)."""

import pytest

from agentic_data_pipeline_spark import session as session_mod
from agentic_data_pipeline_spark.session import (
    BLOOM_MIN_FACT_ROWS, SHUFFLE_ROWS_PER_PARTITION, apply_scaled_shuffle,
    default_parallelism, scaled_shuffle_partitions, tune,
)

BLOOM_KEY = "spark.sql.optimizer.runtime.bloomFilter.enabled"


@pytest.fixture(autouse=True)
def _reset_bloom_ratchet():
    """The ratchet is process-lifetime by design; tests must not leak it."""
    yield
    session_mod._BLOOM_RATCHETED = False


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


def test_bloom_ratchet_survives_tune(spark):
    """Regression (r9 advisor): tune() runs inside catalog.load_table() on
    every table read and used to re-apply the RUNTIME_CONFS false pin —
    so the ratchet was dead in practice: the very next op (including every
    timed tier-bench pass) flipped bloom back off."""
    spark.conf.set(BLOOM_KEY, "false")
    apply_scaled_shuffle(spark, BLOOM_MIN_FACT_ROWS)
    assert spark.conf.get(BLOOM_KEY) == "true"
    tune(spark)                                  # any later load_table()
    assert spark.conf.get(BLOOM_KEY) == "true", \
        "tune() un-ratcheted the volume-gated bloom filter"
    spark.conf.set(BLOOM_KEY, "false")


def test_tune_pins_bloom_off_when_never_ratcheted(spark):
    """Below the gate, tune() must keep pinning the Spark-4 default OFF."""
    spark.conf.set(BLOOM_KEY, "true")            # simulate vanilla default
    tune(spark)
    assert spark.conf.get(BLOOM_KEY) == "false"
