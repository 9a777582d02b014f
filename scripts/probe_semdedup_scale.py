#!/usr/bin/env python
"""Probe: does semdedup's corpus-derived k (semdedup_k_for ≈ N/64) hold
the WITHIN-CLUSTER QUADRATIC WORK flat as the corpus grows? (VERDICT r5
item 10 — the rule that makes the blocked pair space linear at 100 TB.)

Method: synthetic hash-derived vectors (fully distributed generation — no
driver data) at a geometric ladder of corpus sizes, each clustered with
k = semdedup_k_for(N). Centroids are FIT ON A BOUNDED SAMPLE (≤ 50k rows)
and then assignment runs over the full corpus — the same split a 100 TB
deployment uses (the SemDedup paper trains its k-means on a subset too;
Lloyd iterations over every row at k≈10^6 would be the actual
scale-killer, not the pair join). The quantity that must stay flat is

    pairs_per_vector = Σ_c n_c·(n_c−1)/2 / N

i.e. the per-row share of the candidate pair space. If k scales with N,
this is ~target/2 regardless of N; if k were pinned (the r5 defect), it
grows linearly with N. Also reported: max/p99 cluster size (skew of the
blocking) and wall times. Prints ONE JSON line; transcribed into
BASELINE.md.

Scales: 100×/200×/400×/800× the 500-vector sf0.01 fixture. The 100 TB
extrapolation needs no bigger probe: pair work depends ONLY on the
cluster-size distribution, and k-means cluster sizes at fixed N/k don't
widen with N — which is exactly what the ladder demonstrates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.similarity import (
    SEMDEDUP_TARGET_CLUSTER_ROWS, semdedup_k_for,
)
from agentic_data_pipeline_spark.session import get_spark

D = 16          # probe dim: assignment cost is N·k·D — D=16 keeps the
                # 800× rung tractable on local[32]; cluster-size behavior
                # (the thing under test) is dimension-insensitive
FIT_SAMPLE = 50_000
SCALES = [50_000, 100_000, 200_000, 400_000]


def synth_vectors(spark, n: int):
    """Deterministic hash-derived unit-ish vectors, generated distributed."""
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    vec = F.array(*[
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2001)) - 1000)
        .cast("double") / 1000.0
        for j in range(D)
    ])
    return df.select("vec_id", vec.alias("embedding"))


def one_scale(spark, n: int) -> dict:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = synth_vectors(spark, n)
    k = semdedup_k_for(n)
    feats = emb.withColumn("__f", array_to_vector(F.col("embedding")))
    fit_frac = min(1.0, FIT_SAMPLE / n)
    sample = (feats.sample(fraction=fit_frac, seed=7) if fit_frac < 1.0
              else feats)
    t0 = time.perf_counter()
    model = KMeans(k=k, seed=42, maxIter=3, initMode="random",
                   featuresCol="__f", predictionCol="cluster_id").fit(sample)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    sizes = (model.transform(feats).groupBy("cluster_id")
             .agg(F.count(F.lit(1)).alias("n"))
             .agg(F.sum("n").alias("total"),
                  F.max("n").alias("mx"),
                  F.expr("percentile(n, 0.99)").alias("p99"),
                  F.mean("n").alias("mean"),
                  (F.sum(F.col("n") * (F.col("n") - 1) / 2)).alias("pairs"))
             .first())
    t_assign = time.perf_counter() - t0
    assert sizes["total"] == n
    return {
        "n_vectors": n, "k": k,
        "target_cluster_rows": SEMDEDUP_TARGET_CLUSTER_ROWS,
        "mean_cluster_size": round(sizes["mean"], 1),
        "p99_cluster_size": round(sizes["p99"], 1),
        "max_cluster_size": int(sizes["mx"]),
        "pairs_per_vector": round(sizes["pairs"] / n, 1),
        "fit_sec": round(t_fit, 1), "assign_sec": round(t_assign, 1),
    }


def main() -> None:
    spark = get_spark(app_name="probe-semdedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rungs = [one_scale(spark, n) for n in SCALES]
    ppv = [r["pairs_per_vector"] for r in rungs]
    print(json.dumps({
        "metric": "semdedup_k_scaling_probe",
        "rungs": rungs,
        # flatness: widest/narrowest per-vector pair share across an
        # 8x corpus growth — ~1.0 means the rule holds
        "pairs_per_vector_spread": round(max(ppv) / min(ppv), 2),
        "pinned_k_would_give": {
            "note": "with k fixed at the smallest rung's value, "
                    "pairs_per_vector grows ~linearly with N",
            "extrapolated_at_largest": round(
                ppv[0] * SCALES[-1] / SCALES[0], 1),
        },
    }))


if __name__ == "__main__":
    main()
