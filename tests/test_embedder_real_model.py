"""Real-model embedding path (similarity.make_embedder_udf).

In this container sentence-transformers is absent, so the deterministic
hash embedder stands in everywhere (VERDICT r1 item 7) — these tests run
the REAL path when the model exists and skip-with-reason when it doesn't,
so the fallback can never silently mask a broken real path."""

import importlib.util

import pytest
from pyspark.sql import functions as F

requires_model = pytest.mark.skipif(
    importlib.util.find_spec("sentence_transformers") is None,
    reason="sentence-transformers not installed in this container "
           "(hash-embedder fallback is exercised by the oracle-checked "
           "vector_index op instead)",
)


@requires_model
def test_real_model_dim_norm_and_topk_stability(spark):
    from agentic_data_pipeline_spark.operators.similarity import (
        make_embedder_udf, vector_search,
    )

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "a cat was sitting on a mat"),
         (2, "spark shuffles partitions across executors"),
         (3, "the dog slept in the sun")],
        "doc_id bigint, text string")
    emb = df.withColumn("embedding", make_embedder_udf()(F.col("text")))
    rows = emb.select("doc_id", "embedding").collect()
    dims = {len(r["embedding"]) for r in rows}
    assert dims == {384}  # all-MiniLM-L6-v2 output dim
    # determinism across invocations (model reload must not drift)
    again = {r["doc_id"]: list(r["embedding"]) for r in
             emb.select("doc_id", "embedding").collect()}
    for r in rows:
        assert list(r["embedding"]) == again[r["doc_id"]]
    # semantic sanity: nearest neighbor of doc 0 is its paraphrase (doc 1)
    qv = list(rows[0]["embedding"])
    nn = vector_search(emb.filter("doc_id <> 0"), qv, k=1,
                       id_col="doc_id").head()
    assert nn["doc_id"] == 1
