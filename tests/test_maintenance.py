"""Unit tests for the lake-maintenance + profiling families beyond the
oracle-parity pre-check: file-count behavior of compaction, the sliding
window algebra of overlap chunking, and entropy on a hand-checked corpus."""

import math

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.sources.compaction import (
    compact_parquet, parquet_data_files, target_file_count)
from tests.conftest import SF_SMOKE


def test_compaction_merges_small_files(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    spark.range(10_000).withColumn("v", F.rand(seed=7)) \
        .repartition(16).write.parquet(frag)
    assert len(parquet_data_files(frag)) == 16
    n = compact_parquet(spark, frag, out)
    files = parquet_data_files(out)
    assert len(files) == n == target_file_count(frag)  # tiny data → 1 file
    assert n == 1
    before = spark.read.parquet(frag)
    after = spark.read.parquet(out)
    assert after.count() == 10_000
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0


def test_compaction_respects_target_bytes(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    spark.range(50_000).withColumn("v", F.rand(seed=7)) \
        .repartition(8).write.parquet(frag)
    total = sum(__import__("os").path.getsize(f)
                for f in parquet_data_files(frag))
    target = total // 3  # force ~3-4 output files
    n = compact_parquet(spark, frag, out, target_bytes=target)
    assert n == math.ceil(total / target)
    assert len(parquet_data_files(out)) == n


def test_chunk_overlap_window_algebra(spark):
    """Every doc yields ceil(n_tokens/stride) chunks; chunk 0 is the same
    16-token window ext_docs_to_chunks emits as ITS chunk 0."""
    from agentic_data_pipeline_spark.operators.prep import (
        CHUNK_SIZE, CHUNK_STRIDE, ext_chunk_overlap, ext_docs_to_chunks)
    from agentic_data_pipeline_spark.operators.text import tokens

    over = ext_chunk_overlap(spark, SF_SMOKE)
    counts = {r["doc_id"]: r["n"] for r in
              over.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    from agentic_data_pipeline_spark.catalog import load_table
    docs = load_table(spark, SF_SMOKE, "documents") \
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n_tokens"))
    for r in docs.collect():
        assert counts[r["doc_id"]] == math.ceil(r["n_tokens"] / CHUNK_STRIDE)

    first_over = {r["doc_id"]: r["chunk_md5"]
                  for r in over.filter("chunk_id = 0").collect()}
    fixed = ext_docs_to_chunks(spark, SF_SMOKE)
    first_fixed = {r["doc_id"]: r["chunk_md5"]
                   for r in fixed.filter("chunk_id = 0").collect()}
    assert first_over == first_fixed
    assert CHUNK_SIZE == 2 * CHUNK_STRIDE  # half-overlap configuration


def test_entropy_hand_checked(spark, tmp_path, monkeypatch):
    """Uniform tokens → log2(k) bits; constant doc → 0 bits."""
    import agentic_data_pipeline_spark.operators.profiling as prof

    sf = str(tmp_path)
    df = spark.createDataFrame(
        [(0, "a b c d"),        # 4 distinct, uniform → 2.0 bits
         (1, "x x x x x"),      # constant → 0.0
         (2, "a a b b")],       # uniform over 2 → 1.0
        "doc_id bigint, text string")
    df.write.parquet(f"{sf}/documents.parquet")
    got = {r["doc_id"]: r["token_entropy"]
           for r in prof.ext_entropy(spark, sf).collect()}
    assert got == {0: 2.0, 1: 0.0, 2: 1.0}


def test_latest_by_key_is_unique_and_latest(spark):
    from agentic_data_pipeline_spark.catalog import load_table
    from agentic_data_pipeline_spark.operators.cdc import ext_latest_by_key

    latest = ext_latest_by_key(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    assert latest.count() == ev.select("user_id").distinct().count()
    from agentic_data_pipeline_spark.catalog import ts_us_long

    maxes = {r["user_id"]: r["m"] for r in
             ev.groupBy("user_id")
               .agg(F.max(ts_us_long(ev)).alias("m")).collect()}
    for r in latest.collect():
        assert r["ts_us"] == maxes[r["user_id"]]


def test_ingest_new_formats_error_contract(spark, tmp_path):
    import pytest

    from agentic_data_pipeline_spark.sources.ingest import IngestError, ingest

    with pytest.raises(IngestError):
        ingest(spark, str(tmp_path / "nope.orc"), "orc")
    with pytest.raises(RuntimeError):
        ingest(spark, str(tmp_path / "x"), "avro-nope")


def test_zorder_buckets_bound_both_dimensions(spark):
    """The z-curve invariant that makes data skipping work: freezing z bits
    >= Z_BUCKET_SHIFT freezes all but the low ceil(shift/2) bits of EACH
    dimension, so every bucket's span is < 2^9 in user_id AND in hour —
    provable, not statistical."""
    from agentic_data_pipeline_spark.operators.cdc import ext_zorder_cluster

    rows = ext_zorder_cluster(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["u_max"] - r["u_min"] < 512, r
        assert r["h_max"] - r["h_min"] < 512, r
    # buckets jointly cover all events
    from agentic_data_pipeline_spark.catalog import load_table
    assert sum(r["n_events"] for r in rows) == \
        load_table(spark, SF_SMOKE, "events").count()
