#!/usr/bin/env python
"""Growth probe (r6 verdict item 4): derived-blocking kNN — per-block
pair work must stay FLAT as the corpus grows, because k_cells ∝ N holds
expected cell size at SEMDEDUP_TARGET_CLUSTER_ROWS. Runs the real
knn_graph_derived at sf0.01 (500 vecs), sf0.1 (2k), and synthetic 10×/
40× replications of sf0.1 (20k/80k vecs, ids shifted per replica —
replica vectors are exact duplicates, the realistic near-dup regime),
and reports mean/max per-cell sizes, per-cell pair counts, and wall
time. The fixed-label blocking's law (per-block pairs ∝ N² at constant
block count) is printed alongside for contrast.

Run: python scripts/probe_knn_derived.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.similarity import (
    knn_graph_derived, semdedup_k_for,
)
from agentic_data_pipeline_spark.session import get_spark

C = F.col


def tier(spark, emb, name):
    n = emb.count()
    t0 = time.perf_counter()
    assigned, edges = knn_graph_derived(emb, k=3)
    n_edges = edges.count()
    wall = time.perf_counter() - t0
    sz = (assigned.groupBy("__cell").agg(F.count(F.lit(1)).alias("s"))
          .agg(F.avg("s").alias("mean"), F.max("s").alias("mx"),
               F.avg(C("s") * (C("s") - 1)).alias("mean_pairs"),
               F.max(C("s") * (C("s") - 1)).alias("max_pairs")).first())
    print(f"{name:10s} n={n:7d} k_cells={semdedup_k_for(n):5d} "
          f"mean_cell={sz['mean']:7.1f} max_cell={sz['mx']:6d} "
          f"mean_pairs={sz['mean_pairs']:9.0f} max_pairs={sz['max_pairs']:9.0f} "
          f"edges={n_edges:7d} wall={wall:6.2f}s", flush=True)
    return sz["mean_pairs"], sz["max_pairs"]


def main():
    spark = get_spark(app_name="probe-knn-derived")
    spark.sparkContext.setLogLevel("ERROR")
    base01 = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    tier(spark, base01, "sf0.01")
    m0, _ = tier(spark, base, "sf0.1")
    for reps in (10, 40):
        rep = None
        for r in range(reps):
            part = base.select((C("vec_id") + r * 100_000_000).alias("vec_id"),
                               "label", "embedding")
            rep = part if rep is None else rep.unionByName(part)
        m1, _ = tier(spark, rep.localCheckpoint(), f"sf0.1x{reps}")
    print(f"flatness: mean per-cell pairs sf0.1 -> x40 ratio "
          f"{m1 / m0:.2f} (fixed-label law would be {40**2}x)")


if __name__ == "__main__":
    main()
