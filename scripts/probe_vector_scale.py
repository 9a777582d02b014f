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

SCALED = "/root/repo/.tmp/vec_scale_2m_v2.parquet"
FACTOR = 1000
K = 5


def build_corpus(spark, sf_dir: str) -> None:
    """Fixture embeddings exploded x1000 with deterministic per-copy
    perturbation (rep 0 keeps the originals). Unperturbed explosion gives
    2M vectors but only 2k DISTINCT points — every copy of the argmax base
    vector ties for top-k and any bucketing strategy gets recall 1.0 for
    free. The +-5% hash-noise creates genuine neighbor structure so the
    recall curves mean something."""
    if os.path.exists(SCALED):
        return
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    perturbed = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: x * (1.0 + F.when(F.col("rep") == 0, 0.0).otherwise(
            (F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep"), i),
                    F.lit(1000)).cast("double") / 1000.0 - 0.5) * 0.1)))
    (emb.crossJoin(spark.range(FACTOR).withColumnRenamed("id", "rep"))
        .select((F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
                perturbed.cast("array<float>").alias("embedding"))
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


def ann_probe(spark, queries: dict, out: dict) -> None:
    """IVF + PQ end-to-end at the 2M corpus (VERDICT r3 #6): the number a
    100 TB design review asks for — recall@5 vs exact per nprobe, and the
    search wall vs the brute-force crossover. Models train on a ~100k
    SAMPLE (the 100 TB shape: sample-train, broadcast model, map-assign),
    then assign/encode the full corpus.

    ``queries``: {query_base_id: (qv, exact_top5_ids)}. Recall is the mean
    over queries, at two granularities: exact vec_id overlap, and BASE
    overlap (vec_id % n_base — "did it find copies of the right source
    vector"). On a near-dup-exploded corpus the exact top-5 are 5 noisy
    copies of one base separated by ~1e-3 sim, so id-recall measures
    within-tie ranking resolution while base-recall measures whether the
    strategy found the right neighborhood at all."""
    from agentic_data_pipeline_spark.operators.similarity import (
        ivf_search, pq_encode, pq_search, pq_train,
    )
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    full = spark.read.parquet(SCALED)
    sample = full.sample(0.05, seed=42)
    n_base = 2000

    def recalls(rows, exact_ids) -> tuple[float, float]:
        got = {r["vec_id"] for r in rows}
        base_got = {v % n_base for v in got}
        base_exact = {v % n_base for v in exact_ids}
        return (len(got & exact_ids) / len(exact_ids),
                len(base_got & base_exact) / len(base_exact))

    # IVF: sample-trained 64-cell coarse quantizer, map-pass assignment,
    # and the index table WRITTEN PARTITIONED BY CELL — the layout the
    # ivf_index docstring prescribes for 100 TB. Searches then read only
    # the probed cells' files (partition pruning), so the search wall
    # should scale with nprobe/64, not corpus size.
    idx_path = SCALED.replace(".parquet", "_ivf_idx.parquet")
    t0 = time.perf_counter()
    feats_s = sample.withColumn(
        "__features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=64, seed=42, featuresCol="__features",
                   predictionCol="__cell").fit(feats_s)
    feats_full = full.withColumn(
        "__features", array_to_vector(F.col("embedding").cast("array<double>")))
    (model.transform(feats_full).drop("__features")
          .withColumnRenamed("__cell", "cell")
          .write.mode("overwrite").partitionBy("cell").parquet(idx_path))
    assigned = spark.read.parquet(idx_path)
    out["ivf_train_assign_write_sec"] = round(time.perf_counter() - t0, 3)
    out["ivf_recall_at_nprobe"] = {}
    out["ivf_base_recall_at_nprobe"] = {}
    out["ivf_search_sec_at_nprobe"] = {}
    warm_q = next(iter(queries.values()))[0]
    for nprobe in (1, 2, 4, 8, 16):
        ivf_search(assigned, model, warm_q, k=K, nprobe=nprobe).collect()
        walls, rid, rbase = [], [], []
        for qv, exact_ids in queries.values():
            t0 = time.perf_counter()
            rows = ivf_search(assigned, model, qv, k=K,
                              nprobe=nprobe).collect()
            walls.append(time.perf_counter() - t0)
            a, b = recalls(rows, exact_ids)
            rid.append(a); rbase.append(b)
        out["ivf_search_sec_at_nprobe"][nprobe] = round(min(walls), 3)
        out["ivf_recall_at_nprobe"][nprobe] = round(sum(rid) / len(rid), 3)
        out["ivf_base_recall_at_nprobe"][nprobe] = \
            round(sum(rbase) / len(rbase), 3)

    # PQ: sample-trained codebooks, full-corpus encode, ADC search.
    t0 = time.perf_counter()
    books = pq_train(sample)
    out["pq_train_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    encoded = pq_encode(full, books).persist()
    encoded.count()
    out["pq_encode_sec"] = round(time.perf_counter() - t0, 3)
    pq_search(encoded, books, warm_q, k=K).collect()  # warm
    walls, rid, rbase = [], [], []
    for qv, exact_ids in queries.values():
        t0 = time.perf_counter()
        rows = pq_search(encoded, books, qv, k=K).collect()
        walls.append(time.perf_counter() - t0)
        a, b = recalls(rows, exact_ids)
        rid.append(a); rbase.append(b)
    out["pq_search_sec"] = round(min(walls), 3)
    out["pq_recall_at_5"] = round(sum(rid) / len(rid), 3)
    out["pq_base_recall_at_5"] = round(sum(rbase) / len(rbase), 3)
    encoded.unpersist()


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

    # 8-query panel for the ANN recall curves: fixture vectors 0..7 as
    # queries, exact ground truth from the numpy brute-force path.
    qrows = (load_table(spark, sf_dir, "embeddings")
             .filter(F.col("vec_id") < 8).orderBy("vec_id").collect())
    queries = {}
    for r in qrows:
        q = [float(x) for x in r["embedding"]]
        exact = {row["vec_id"] for row in topk_numpy(spark, q)}
        queries[int(r["vec_id"])] = (q, exact)
    ann_probe(spark, queries, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
