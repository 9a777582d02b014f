#!/usr/bin/env python
"""Scale probe: brute-force cosine top-k strategies on a synthetic ~2M x 64
vector corpus (fixture embeddings exploded x1000).

Compares, end-to-end (scan -> score -> top-k) on local[32]:
  A. JVM HOF fold (functions.vector.dot via aggregate/zip_with) + TakeOrdered
  B. Arrow-batched numpy matmul (mapInPandas, per-batch top-k) + TakeOrdered

Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.session import get_spark

SCALED = "/root/repo/.tmp/vec_scale_2m.parquet"
FACTOR = 1000
K = 5


def build_corpus(spark, sf_dir: str) -> None:
    if os.path.exists(SCALED):
        return
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    (emb.crossJoin(spark.range(FACTOR).withColumnRenamed("id", "rep"))
        .select((F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
                "embedding")
        .repartition(32)
        .write.mode("overwrite").parquet(SCALED))


def topk_hof(spark, qv: list[float]) -> list:
    from agentic_data_pipeline_spark.functions.vector import dot, l2_norm
    idx = spark.read.parquet(SCALED)
    q = F.array(*[F.lit(float(x)) for x in qv]).cast("array<float>")
    qn = float(np.linalg.norm(np.asarray(qv, dtype=np.float64)))
    sim = dot(F.col("embedding"), q) / (l2_norm(F.col("embedding")) * F.lit(qn))
    return (idx.select("vec_id", sim.alias("sim"))
            .orderBy(F.col("sim").desc(), "vec_id").limit(K).collect())


def topk_numpy(spark, qv: list[float]) -> list:
    idx = spark.read.parquet(SCALED)
    q = np.asarray(qv, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            top = np.argpartition(-sims, min(K, len(sims) - 1))[:K]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy()[top],
                                "sim": sims[top]})

    scored = idx.mapInPandas(score, schema="vec_id bigint, sim double")
    return scored.orderBy(F.col("sim").desc(), "vec_id").limit(K).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vec-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark, sf_dir)
    n = spark.read.parquet(SCALED).count()
    qv = [float(x) for x in
          load_table(spark, sf_dir, "embeddings")
          .filter(F.col("vec_id") == 0).head()["embedding"]]

    out = {"n_vectors": n, "dim": len(qv), "k": K}
    results = {}
    for name, fn in [("hof_fold", topk_hof), ("numpy_mapinpandas", topk_numpy)]:
        fn(spark, qv)  # warm-up
        t0 = time.perf_counter(); r1 = fn(spark, qv); t1 = time.perf_counter()
        fn(spark, qv)
        t2 = time.perf_counter(); r2 = fn(spark, qv); t3 = time.perf_counter()
        out[name + "_sec"] = round(min(t1 - t0, t3 - t2), 3)
        results[name] = [(row["vec_id"], round(row["sim"], 6)) for row in r1]
        assert results[name] == [(row["vec_id"], round(row["sim"], 6)) for row in r2]
    # same neighbors and 6dp-identical sims across strategies?
    out["results_match_6dp"] = results["hof_fold"] == results["numpy_mapinpandas"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
