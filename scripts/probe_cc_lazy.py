#!/usr/bin/env python
"""A/B: lazy vs eager per-round lineage cuts in the connected-components
loops (min-label AND large/small-star) — the pagerank lazy-cut lever
(scripts/probe_pagerank_lazy.py, shipped r11a) applied to the other two
iterative graph loops.

Both loops already pay ONE driver-synced collect() per round for their
convergence fixpoint (label sum / edge-multiset signature), and that
collect's job materializes a lazy cut's blocks anyway — so the eager
cut's separate count() job per round is pure dispatch overhead. Labels
must be bit-identical (the cut changes job scheduling, never arithmetic
or the plan barrier).

Workloads (fresh rebuild per timed run — constructing the DataFrame IS
the computation for these, exactly like bench.py's REBUILD set):
  clusters — ext_dedup_clusters_bounded's composition (all-pairs Jaccard
             front-end -> min-label CC -> survivor aggregate), the bench
             heavy this ships for;
  star     — ext_dedup_components_star's composition (cosine edges ->
             large/small-star CC).

Usage: python scripts/probe_cc_lazy.py [sf_dir] [reps]
Prints ONE JSON line; transcribed into BASELINE.md / OPTIMIZATION_r11.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.functions.vector import dot, l2_norm
from agentic_data_pipeline_spark.operators.dedup import (
    connected_components, connected_components_star, jaccard, word_shingles)
from agentic_data_pipeline_spark.session import get_spark

C = F.col


def clusters_df(spark, sf, eager_cuts: bool):
    """ext_dedup_clusters_bounded, with the CC cut mode parameterized."""
    docs = load_table(spark, sf, "documents").filter(C("doc_id") < 200)
    grams = docs.select(C("doc_id"), word_shingles(C("text"), 3).alias("g"))
    a = grams.select(C("doc_id").alias("a_id"), C("g").alias("a_g"))
    b = grams.select(C("doc_id").alias("b_id"), C("g").alias("b_g"))
    pairs = (a.join(F.broadcast(b), C("b_id") > C("a_id"))
             .filter(jaccard(C("a_g"), C("b_g")) >= 0.5)
             .select("a_id", "b_id"))
    edges = pairs.select(C("a_id").alias("s"), C("b_id").alias("t"))
    vertices = docs.select(C("doc_id").alias("id"))
    comp = connected_components(vertices, edges, eager_cuts=eager_cuts)
    return (comp.groupBy("component_id")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .select(C("component_id").alias("survivor_id"),
                    "n_members", (C("n_members") > 1).alias("is_dup_cluster")))


def star_df(spark, sf, eager_cuts: bool):
    """ext_dedup_components_star, with the CC cut mode parameterized."""
    emb = load_table(spark, sf, "embeddings")
    a = emb.select(C("vec_id").alias("a_id"), C("label").alias("a_label"),
                   C("embedding").alias("a_vec"),
                   l2_norm(C("embedding")).alias("a_n"))
    b = emb.select(C("vec_id").alias("b_id"), C("label").alias("b_label"),
                   C("embedding").alias("b_vec"),
                   l2_norm(C("embedding")).alias("b_n"))
    sim = dot(C("a_vec"), C("b_vec")) / (C("a_n") * C("b_n"))
    edges = (a.join(b, (C("a_label") == C("b_label")) & (C("a_id") < C("b_id")))
             .filter(sim > 0.35)
             .select(C("a_id").alias("s"), C("b_id").alias("t")))
    vertices = emb.select(C("vec_id").alias("id"))
    return (connected_components_star(vertices, edges,
                                      eager_cuts=eager_cuts)
            .select(C("id").alias("vec_id"), "component_id"))


WORKLOADS = {"clusters": clusters_df, "star": star_df}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="probe-cc-lazy")
    spark.sparkContext.setLogLevel("ERROR")

    # Rows must be BIT-identical between cut modes (integer labels).
    for wname, build in WORKLOADS.items():
        rows = {m: sorted(map(tuple, build(spark, sf, m == "eager").collect()))
                for m in ("eager", "lazy")}
        assert rows["eager"] == rows["lazy"], wname

    times: dict[str, list[float]] = {
        f"{w}_{m}": [] for w in WORKLOADS for m in ("eager", "lazy")}
    for _ in range(reps):
        for wname, build in WORKLOADS.items():
            for mode in ("eager", "lazy"):
                t0 = time.perf_counter()
                build(spark, sf, mode == "eager") \
                    .write.mode("overwrite").format("noop").save()
                times[f"{wname}_{mode}"].append(
                    round(time.perf_counter() - t0, 2))
    print(json.dumps({
        "metric": "cc_lazy_cut_ab", "sf_dir": sf, "reps": reps,
        "runs": times, "min": {n: min(v) for n, v in times.items()},
        "rows_identical": True,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
