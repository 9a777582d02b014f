"""Pin the r12 Arrow front-end of ext_training_prep_pipeline to its
Catalyst twin: the mapInArrow scored→kept pass (_prep_kept_batches) must
produce the EXACT (doc_id, n_tokens, fp) set the pure-Catalyst form
(_prep_kept_jvm) produces — the bit-identity contract the rewrite
shipped under (scripts/probe_prep_arrow.py asserted it on 472,100 sf10
rows; this test keeps it pinned on the driver tiers every run)."""

import os

from tests.conftest import SF_CORRECT, SF_SMOKE

from agentic_data_pipeline_spark.operators.prep import (
    _prep_kept_jvm, ext_training_prep_pipeline,
)
from agentic_data_pipeline_spark.operators.prep import _prep_kept_batches
from agentic_data_pipeline_spark.catalog import load_table


def test_prep_arrow_kept_set_matches_catalyst(spark):
    for sf in (SF_SMOKE, SF_CORRECT):
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            continue
        docs = load_table(spark, sf, "documents")
        arrow = docs.select("doc_id", "text").mapInArrow(
            _prep_kept_batches, "doc_id bigint, n_tokens bigint, fp string")
        a = sorted(map(tuple, arrow.collect()))
        j = sorted(map(tuple, _prep_kept_jvm(docs).collect()))
        assert a, f"{sf}: empty kept set — the filter check is vacuous"
        assert a == j, f"{sf}: Arrow kept set diverges from Catalyst"


def test_prep_pipeline_emits_all_16_shards(spark):
    out = ext_training_prep_pipeline(spark, SF_SMOKE).collect()
    shards = {r["shard"] for r in out}
    assert len(out) == len(shards)  # one row per shard
    assert all(0 <= s < 16 for s in shards)
