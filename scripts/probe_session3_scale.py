#!/usr/bin/env python
"""Scale probe for the round-6 session-3 families: int8 quantization,
int8 ANN top-k, perceptual hashing + signature grouping, and the
PSI/k-anonymity aggregate shape.

The parquet fixtures hold 500 docs/embeddings at EVERY SF (only the
TPC-H facts scale), so scaling evidence for these ops needs synthetic
growth: seeded-random 64-d vectors and synthetic QI/price tables at
N and 10N. Expectation: all four shapes are one map pass + at most one
bounded shuffle, so wall time grows ~linearly in N (ratio ≈ growth
factor, not growth²) — the top-k exchange stays bounded at k rows per
query regardless of N.

Run: python scripts/probe_session3_scale.py [N_small] [growth]
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_emb(spark, n: int):
    from pyspark.sql import functions as F

    return (spark.range(n).withColumnRenamed("id", "vec_id")
            .withColumn(
                "embedding",
                F.expr("transform(sequence(1, 64), "
                       "i -> cast(sin(vec_id * 7919 + i * 104729) "
                       "as float))"))
            .localCheckpoint())


def synth_rows(spark, n: int):
    from pyspark.sql import functions as F

    return (spark.range(n).withColumnRenamed("id", "rid")
            .withColumn("qi_a", (F.col("rid") % 500).cast("int"))
            .withColumn("qi_b", (F.col("rid") % 7).cast("int"))
            .withColumn("price",
                        (F.pmod(F.col("rid") * 104729, F.lit(500000))
                         ).cast("double"))
            .localCheckpoint())


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    growth = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from agentic_data_pipeline_spark.operators.similarity import (
        _trunc6, batch_topk,
    )
    from agentic_data_pipeline_spark.operators.vector_store import (
        quantize_int8,
    )
    from agentic_data_pipeline_spark.functions.vector import dot, l2_norm
    from agentic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-session3-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n in (n_small, n_small * growth):
        emb = synth_emb(spark, n)
        rows = synth_rows(spark, n)

        t_quant = min(timed(lambda: noop(quantize_int8(emb)))
                      for _ in range(3))

        def ann() -> None:
            codes = quantize_int8(emb).select("vec_id", "q")
            queries = codes.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"),
                F.col("q").alias("qq"),
                l2_norm(F.col("q")).alias("qn"))
            sim = (dot(F.col("q"), F.col("qq"))
                   / (l2_norm(F.col("q")) * F.col("qn")))
            scored = (codes.crossJoin(F.broadcast(queries))
                      .filter(F.col("vec_id") != F.col("query_id"))
                      .select("query_id",
                              F.col("vec_id").alias("neighbor_id"),
                              _trunc6(sim).alias("sim")))
            noop(batch_topk(scored, k=5))

        t_ann = min(timed(ann) for _ in range(3))

        def sig_group() -> None:
            # signature-grouping shape of the perceptual dedup trio:
            # map-only signature + one shuffle on it
            sig = emb.select(
                "vec_id",
                F.md5(F.col("embedding").cast("string")).alias("h"))
            g = sig.groupBy("h").agg(
                F.count(F.lit(1)).alias("n_same"),
                F.min("vec_id").alias("canon"))
            noop(sig.join(g, "h"))

        t_sig = min(timed(sig_group) for _ in range(3))

        def gates() -> None:
            # k-anonymity + PSI aggregate shape on the synthetic table
            noop(rows.groupBy("qi_a", "qi_b")
                 .agg(F.count(F.lit(1)).alias("n"))
                 .filter(F.col("n") < 10))
            noop(rows.groupBy(
                F.least(F.floor(F.col("price") / 50_000.0),
                        F.lit(9)).alias("bin"),
                (F.col("rid") % 2 == 0).alias("is_ref"))
                .agg(F.count(F.lit(1)).alias("n")))

        t_gate = min(timed(gates) for _ in range(3))

        print(f"N={n:>9,}  quantize={t_quant:6.2f}s  ann_topk={t_ann:6.2f}s"
              f"  sig_group={t_sig:6.2f}s  gates={t_gate:6.2f}s")


if __name__ == "__main__":
    main()
