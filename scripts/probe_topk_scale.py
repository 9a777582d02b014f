#!/usr/bin/env python
"""Probe: batch top-k ranking topology at corpus scale.

Compares three plans for "top-5 neighbors for each of Q=3 queries" over a
synthetic 2M x 64d corpus (the scale where sf-fixture timings say nothing):

  window    — r1's Window.partitionBy(query_id): ALL 6M scored rows land in
              3 tasks (the VERDICT's scale-killer).
  salted    — r2's batch_topk: rank inside (query, salt) buckets, then rank
              the <= Q*64*5 candidates (operators/similarity.batch_topk).
  blas      — similarity_topk_batch: one numpy matmul per Arrow batch with
              per-(batch, query) top-k reduction (mapInPandas).

Run:  python scripts/probe_topk_scale.py   (results recorded in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from agentic_data_pipeline_spark.functions.vector import dot, l2_norm
from agentic_data_pipeline_spark.operators.similarity import (
    batch_topk, similarity_topk_batch,
)
from agentic_data_pipeline_spark.session import get_spark

N, DIM, K = 2_000_000, 64, 5
C = F.col


def main() -> None:
    spark = get_spark(app_name="probe-topk")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    qvecs = {i: rng.standard_normal(DIM).tolist() for i in (0, 1, 2)}

    corpus = (
        spark.range(N).select(
            C("id").alias("vec_id"),
            F.array(*[
                F.sin((C("id") + 1) * F.lit(0.001 * (j + 1)))
                for j in range(DIM)
            ]).cast("array<float>").alias("embedding"),
        )
    ).repartition(32).persist()
    corpus.count()

    queries = spark.createDataFrame(
        [(i, v) for i, v in qvecs.items()],
        "query_id bigint, qv array<float>",
    ).withColumn("qn", l2_norm(C("qv")))

    sim = dot(C("embedding"), C("qv")) / (l2_norm(C("embedding")) * C("qn"))
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(C("vec_id") != C("query_id"))
        .select("query_id", C("vec_id").alias("neighbor_id"),
                F.round(sim, 6).alias("sim"))
    )

    def timed(tag, df):
        for _ in range(1):
            df.write.mode("overwrite").format("noop").save()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        print(f"{tag:8s} best {min(ts):6.2f} s  runs {[round(t, 2) for t in ts]}")
        return df

    w = Window.partitionBy("query_id").orderBy(C("sim").desc(), C("neighbor_id"))
    window_plan = (scored.withColumn("rn", F.row_number().over(w))
                   .filter(C("rn") <= K).drop("rn"))
    salted_plan = batch_topk(scored, k=K)
    blas_plan = similarity_topk_batch(corpus, qvecs, k=K)

    timed("window", window_plan)
    timed("salted", salted_plan)
    timed("blas", blas_plan)

    a = sorted(map(tuple, window_plan.collect()))
    b = sorted(map(tuple, salted_plan.collect()))
    print("salted == window results:", a == b)


if __name__ == "__main__":
    main()
