"""End-to-end medallion lifecycle (SURVEY.md §3 EP1+EP2+EP3 in one flow):
ingest → bronze → staging rule → NL transform → index → serve, through the
Pipeline orchestrator — the full path a reference user walks in the wizard."""

import os

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.agent import TransformationAgent
from agentic_data_pipeline_spark.operators.similarity import (
    vector_index, vector_search,
)
from agentic_data_pipeline_spark.pipeline import Pipeline
from agentic_data_pipeline_spark.serving import serve_json
from agentic_data_pipeline_spark.sources import ingest, read_bronze, write_bronze


def test_full_medallion_flow(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "lake")
    agent = TransformationAgent(llm=None)

    # EP1 — ingestion: documents table → CSV upload → inferred-schema ingest
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    upload = str(tmp_path / "upload.csv")
    docs.limit(200).write.mode("overwrite").option("header", "true").csv(upload)

    pipe = (
        Pipeline()
        .add_stage("ingestion", lambda _: ingest(spark, upload, "csv"))
        .add_stage("storage", lambda df: (
            write_bronze(df, lake, "docs") and read_bronze(spark, lake, "docs")))
        .add_stage("staging", lambda df: df.filter(F.col("n_chars") > 100))
        # EP2 — NL rule through the agent (keyword fallback path)
        .add_stage("transformation", lambda df: agent.apply_business_rule(
            spark, df, "filter the relevant rows"))
    )
    out = pipe.run(docs, count_rows=True)
    assert pipe.current_step == 4
    assert [r.name for r in pipe.runs] == [
        "ingestion", "storage", "staging", "transformation"]
    assert 0 < out.count() <= 10  # fallback head(10)
    assert all(log.startswith("OK") for log in pipe.logs)

    # EP3 — vector index + search over the bronze docs (fallback embedder)
    bronze_docs = read_bronze(spark, lake, "docs")
    idx = vector_index(bronze_docs, text_col="text", id_col="doc_id")
    idx_path = write_bronze(idx, lake, "docs_index")
    assert os.path.isdir(idx_path)
    stored = spark.read.parquet(idx_path)
    qv = list(stored.orderBy("doc_id").head()["embedding"])
    hits = vector_search(stored, qv, k=5, id_col="doc_id").collect()
    assert len(hits) == 5
    assert hits[0]["sim"] == 1.0  # the query doc itself ranks first

    # serving: first-5 JSON records of the final frame
    records = serve_json(bronze_docs, order_by=["doc_id"], n=5)
    assert len(records) == 5 and "text" in records[0]


def test_pipeline_fail_stop(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def boom(df):
        raise ValueError("stage exploded")

    pipe = Pipeline().add_stage("ok", lambda d: d).add_stage("boom", boom)
    try:
        pipe.run(docs)
        raise AssertionError("should have raised")
    except ValueError:
        pass
    assert pipe.current_step == 1                  # stopped at the failure
    assert any(log.startswith("FAILED boom") for log in pipe.logs)