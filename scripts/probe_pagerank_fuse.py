#!/usr/bin/env python
"""A/B probe: can ext_pagerank's per-iteration stage count drop without
breaking exact-replay parity?

Variants (same update arithmetic as _PAGERANK_ORACLE in all cases):
  base   — the shipped loop (separate dang agg; eager checkpoint per iter)
  fused  — dang folded into the contribution shuffle: ranks LEFT JOIN
           w_edges, so dangling vertices survive as dst-NULL rows and the
           per-dst aggregate's NULL group IS the dangling mass (one reused
           exchange instead of a separate scan+agg subtree per round)
  ck2    — base loop, but lineage cut every 2nd iteration
  fusedck2 — both.

Checks: wall time (best of 3 after 1 warmup) + exact row-set equality of
the floor(1e9)-rounded ranks vs base. Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.session import get_spark
from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.registry import OPS
from agentic_data_pipeline_spark.operators.graph import pagerank

C = F.col


def pagerank_fused(vertices, edges, damping=0.85, iters=10, ck_every=1):
    n = vertices.count()
    w_edges = (edges.join(edges.groupBy("src")
                          .agg(F.count(F.lit(1)).alias("outdeg")), "src")
               .select("src", "dst", (1.0 / C("outdeg")).alias("w"))
               .localCheckpoint())
    has_out = w_edges.select("src").distinct()
    ranks = (vertices
             .join(has_out.select(C("src").alias("id"),
                                  F.lit(True).alias("__has")), "id", "left")
             .select("id", F.lit(1.0 / n).alias("rank"),
                     F.coalesce(C("__has"), F.lit(False)).alias("has_out"))
             .localCheckpoint())
    for i in range(iters):
        # One outer join feeds BOTH aggregates: matched rows carry
        # (dst, rank*w) for the contribution sum; dangling vertices
        # (has_out = false, no match possible) survive exactly once with
        # dst NULL, so SUM(rank) over the NULL-dst group is the oracle's
        # dangling mass (same addends, same single-occurrence property).
        joined = ranks.join(w_edges, C("id") == C("src"), "left")
        grouped = (joined.groupBy("dst")
                   .agg(F.sum(C("rank") * C("w")).alias("contrib"),
                        F.sum("rank").alias("__rsum")))
        dang = (grouped.filter(C("dst").isNull())
                .agg(F.coalesce(F.sum("__rsum"), F.lit(0.0)).alias("__dang")))
        contribs = grouped.filter(C("dst").isNotNull()).select("dst", "contrib")
        base = (F.lit((1.0 - damping) / n)
                + F.lit(damping) * C("__dang") / F.lit(float(n)))
        ranks = (ranks.select("id", "has_out")
                 .join(contribs, C("id") == C("dst"), "left")
                 .crossJoin(F.broadcast(dang))
                 .select("id",
                         (base
                          + F.lit(damping) * F.coalesce(C("contrib"),
                                                        F.lit(0.0)))
                         .alias("rank"),
                         "has_out"))
        if (i + 1) % ck_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("id", "rank")


def pagerank_ck(vertices, edges, damping=0.85, iters=10, ck_every=2):
    n = vertices.count()
    w_edges = (edges.join(edges.groupBy("src")
                          .agg(F.count(F.lit(1)).alias("outdeg")), "src")
               .select("src", "dst", (1.0 / C("outdeg")).alias("w"))
               .localCheckpoint())
    has_out = w_edges.select("src").distinct()
    ranks = (vertices
             .join(has_out.select(C("src").alias("id"),
                                  F.lit(True).alias("__has")), "id", "left")
             .select("id", F.lit(1.0 / n).alias("rank"),
                     F.coalesce(C("__has"), F.lit(False)).alias("has_out"))
             .localCheckpoint())
    for i in range(iters):
        dang = (ranks.filter(~C("has_out"))
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")))
        contribs = (w_edges.join(ranks.select("id", "rank"),
                                 C("src") == C("id"))
                    .groupBy("dst")
                    .agg(F.sum(C("rank") * C("w")).alias("contrib")))
        base = (F.lit((1.0 - damping) / n)
                + F.lit(damping) * C("__dang") / F.lit(float(n)))
        ranks = (ranks.select("id", "has_out")
                 .join(contribs, C("id") == C("dst"), "left")
                 .crossJoin(F.broadcast(dang))
                 .select("id",
                         (base
                          + F.lit(damping) * F.coalesce(C("contrib"),
                                                        F.lit(0.0)))
                         .alias("rank"),
                         "has_out"))
        if (i + 1) % ck_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("id", "rank")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-pagerank-fuse")
    spark.sparkContext.setLogLevel("ERROR")

    edges = (OPS["ext_knn_graph_batch"].fn(spark, sf_dir)
             .select(C("vec_id").alias("src"), C("neighbor_id").alias("dst"))
             .localCheckpoint())
    verts = (load_table(spark, sf_dir, "embeddings")
             .select(C("vec_id").alias("id"))
             .localCheckpoint())

    def rounded(df):
        return df.select("id", (F.floor(C("rank") * 1e9 + 1e-3) / 1e9)
                         .alias("rank"))

    variants = {
        "base": lambda: pagerank(verts, edges),
        "fused": lambda: pagerank_fused(verts, edges, ck_every=1),
        "ck2": lambda: pagerank_ck(verts, edges, ck_every=2),
        "ck3": lambda: pagerank_ck(verts, edges, ck_every=3),
        "fusedck2": lambda: pagerank_fused(verts, edges, ck_every=2),
    }
    out = {}
    base_rows = None
    for name, fn in variants.items():
        times = []
        for r in range(4):
            t0 = time.perf_counter()
            df = fn()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if r:  # first is warmup
                times.append(dt)
        rows = {tuple(r) for r in rounded(fn()).collect()}
        if name == "base":
            base_rows = rows
        out[name] = {"best_sec": round(min(times), 3),
                     "runs": [round(t, 3) for t in times],
                     "parity_vs_base": rows == base_rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
