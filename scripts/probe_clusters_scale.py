#!/usr/bin/env python
"""Probe: ext_dedup_minhash_clusters growth (VERDICT r3 #4) — the composed
end-to-end dedup deliverable: LSH candidates → exact-Jaccard verify →
connected components → cluster/survivor table.

What the 100 TB design point needs to see, measured:
- wall grows ~linearly with corpus (the banding front-end is already
  probe-proven sub-quadratic; this confirms the CC + aggregate stages
  don't add a super-linear term);
- CC label-propagation ROUNDS stay flat (near-dup clusters are tiny and
  dense — diameter-bound, not corpus-bound);
- the output stays a total partition (sum(n_members) == corpus size).

Same synthetic corpus as probe_dedup_scale (40-word docs, known 1%
near-dup rate), 1x/2x/4x/8x of 25k docs.

Run:  python scripts/probe_clusters_scale.py   (results in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from probe_dedup_scale import N0, corpus
from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.dedup import (
    connected_components, minhash_candidates,
)
from agentic_data_pipeline_spark.session import get_spark

C = F.col


def main() -> None:
    spark = get_spark(app_name="probe-clusters")
    spark.sparkContext.setLogLevel("ERROR")
    prev = None
    for mult in (1, 2, 4, 8):
        n = N0 * mult
        docs = corpus(spark, n).persist()
        docs.count()
        t0 = time.perf_counter()
        pairs = minhash_candidates(docs, "doc_id", "text", 0.5)
        edges = pairs.select(C("a_id").alias("s"), C("b_id").alias("t"))
        vertices = docs.select(C("doc_id").alias("id"))
        stats: dict = {}
        comp = connected_components(vertices, edges, stats=stats)
        clusters = (comp.groupBy("component_id")
                    .agg(F.count(F.lit(1)).alias("n_members"))
                    .select(C("component_id").alias("survivor_id"),
                            "n_members",
                            (C("n_members") > 1).alias("is_dup_cluster")))
        agg = clusters.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("n_members").alias("total_members"),
            F.sum(F.when(C("is_dup_cluster"), 1).otherwise(0))
            .alias("n_dup_clusters")).collect()[0]
        dt = time.perf_counter() - t0
        growth = f"  x{dt / prev:.2f} vs prev" if prev else ""
        assert agg["total_members"] == n, (
            f"not a total partition: {agg['total_members']} != {n}")
        print(f"x{mult} (n={n:7,d})  wall={dt:6.2f}s{growth}  "
              f"cc_rounds={stats['rounds']}  "
              f"clusters={agg['n_clusters']:,} "
              f"dup_clusters={agg['n_dup_clusters']:,} "
              f"(total_members==n ok)", flush=True)
        prev = dt
        docs.unpersist()


if __name__ == "__main__":
    main()
