#!/usr/bin/env python
"""Growth probe for the round-7 ops with non-trivial scale behavior:

- triangle_count: degree-ordered wedge enumeration over the derived-cell
  kNN graph. The claim: wedge work tracks EDGES (bounded per-vertex
  degree from kNN k=3), never vertex-degree², so wall grows ~linearly
  in corpus. A planted hub (one vertex connected to every 100th vertex)
  checks the degree-ordering guard specifically: the hub must produce 0
  wedges as an apex (its rank is maximal), so its degree never enters
  the join quadratically.
- kcenter_centers + the ext_diversity_sample assignment: the fit is
  capped (≤2048 sample rows collected) so its cost is CONSTANT in
  corpus; the distributed assignment is one map pass over N rows with
  K=16 literal centers. Wall should grow sub-linearly (scan-bound).

Synthetic vectors identical to probe_100x_tier (xxhash64, 10%
unique-base). Run: python scripts/probe_r7_ops_scale.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.graph import triangle_count
from agentic_data_pipeline_spark.operators.similarity import (
    derive_cells, kcenter_centers, knn_graph_batch,
)
from agentic_data_pipeline_spark.session import get_spark

C = F.col
TIERS = [100_000, 400_000, 1_600_000]


def synth_vectors(spark, n):
    base = (C("id") - F.pmod(C("id"), F.lit(10))).alias("b")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.xxhash64(base, i), 100_000) / 100_000.0 - 0.5)
        .cast("float"))
    return spark.range(n).select(C("id").alias("vec_id"),
                                 vec.alias("embedding"))


def main():
    spark = get_spark(app_name="probe-r7-ops")
    spark.sparkContext.setLogLevel("ERROR")
    for n in TIERS:
        emb = synth_vectors(spark, n).localCheckpoint()
        cells = derive_cells(emb)
        assigned = (emb.join(cells.hint("shuffle_hash"), "vec_id")
                    .select("vec_id", "__cell", "embedding"))
        edges = (knn_graph_batch(assigned, k=3, block_col="__cell")
                 .select(C("vec_id").alias("src"),
                         C("neighbor_id").alias("dst")))
        # plant a hub: vertex 0 adjacent to every 100th vertex
        hub = (spark.range(n // 100)
               .select(F.lit(0).cast("bigint").alias("src"),
                       (C("id") * 100 + 1).alias("dst")))
        edges = edges.unionByName(hub).localCheckpoint()
        n_edges = edges.count()

        t0 = time.perf_counter()
        tri = triangle_count(edges)
        agg = tri.agg(F.sum("triangles").alias("t3"),
                      F.max("degree").alias("max_deg"),
                      F.count(F.lit(1)).alias("verts")).first()
        t_tri = time.perf_counter() - t0

        t0 = time.perf_counter()
        ids, centers, r_hist, smax = kcenter_centers(emb)
        from agentic_data_pipeline_spark.functions.vector import dot
        e = C("embedding")
        dists = []
        for center in centers:
            cs = [float(v) for v in center]
            cn2 = sum(v * v for v in cs)
            dists.append(dot(e, e) - 2 * dot(e, F.array(
                *[F.lit(v) for v in cs])) + F.lit(cn2))
        cov = emb.agg(F.max(F.least(*dists)).alias("cov2")).first()["cov2"]
        t_kc = time.perf_counter() - t0

        print(f"n={n:8d} edges={n_edges:8d} verts={agg['verts']:8d} "
              f"max_deg={agg['max_deg']:5d} triangles3x={agg['t3']:9d} "
              f"wall_tri={t_tri:6.1f}s | kcenter k={len(ids)} "
              f"full_cov2={cov:7.3f} wall_kc={t_kc:6.1f}s", flush=True)
        emb.unpersist()
        edges.unpersist()


if __name__ == "__main__":
    main()
