#!/usr/bin/env python
"""CC fixpoint driver-sync cadence A/B (r11 verdict item 2, guide §5):
both CC loops pay one convergence collect() per round. With lazy cuts
that collect is the round's ONLY job, so checking every 2nd round merges
two rounds of lineage into one job — half the driver syncs — at the
price of up to one extra (no-op, but still shuffled) round when
convergence lands between checks. Labels are bit-identical by
construction (monotone labels ⟹ equal sums N rounds apart still detect
the fixpoint exactly); asserted here anyway before timing.

Subjects: ext_dedup_clusters_bounded's composition (exact-Jaccard graph
→ min-label CC, the #2 sf0.1 bench row) and the star loop's op twin.

Usage: SPARK_GRAFT_TIER=sf0.1 python scripts/probe_cc_check_every.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.dedup import (
    connected_components, connected_components_star, jaccard, word_shingles,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf0.1")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "4"))


def clusters_bounded(spark: SparkSession, sf_dir: str,
                     check_every: int) -> DataFrame:
    """ext_dedup_clusters_bounded's exact body, cadence parameterized."""
    docs = load_table(spark, sf_dir, "documents").filter(C("doc_id") < 200)
    grams = docs.select(C("doc_id"), word_shingles(C("text"), 3).alias("g"))
    a = grams.select(C("doc_id").alias("a_id"), C("g").alias("a_g"))
    b = grams.select(C("doc_id").alias("b_id"), C("g").alias("b_g"))
    pairs = (
        a.join(F.broadcast(b), C("b_id") > C("a_id"))
        .filter(jaccard(C("a_g"), C("b_g")) >= 0.5)
        .select("a_id", "b_id")
    )
    edges = pairs.select(C("a_id").alias("s"), C("b_id").alias("t"))
    vertices = docs.select(C("doc_id").alias("id"))
    comp = connected_components(vertices, edges, check_every=check_every)
    return (comp.groupBy("component_id")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .select(C("component_id").alias("survivor_id"),
                    "n_members",
                    (C("n_members") > 1).alias("is_dup_cluster")))


def star_components(spark: SparkSession, sf_dir: str,
                    check_every: int) -> DataFrame:
    """ext_dedup_components_star's body, cadence parameterized."""
    from agentic_data_pipeline_spark.functions.vector import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(C("vec_id").alias("a_id"), C("label").alias("a_label"),
                   C("embedding").alias("a_vec"),
                   l2_norm(C("embedding")).alias("a_n"))
    b = emb.select(C("vec_id").alias("b_id"), C("label").alias("b_label"),
                   C("embedding").alias("b_vec"),
                   l2_norm(C("embedding")).alias("b_n"))
    sim = dot(C("a_vec"), C("b_vec")) / (C("a_n") * C("b_n"))
    edges = (
        a.join(b, (C("a_label") == C("b_label")) & (C("a_id") < C("b_id")))
        .filter(sim > 0.35)
        .select(C("a_id").alias("s"), C("b_id").alias("t"))
    )
    vertices = emb.select(C("vec_id").alias("id"))
    return (connected_components_star(vertices, edges,
                                      check_every=check_every)
            .select("id", C("component_id")))


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    out: dict = {"tier": TIER, "passes": PASSES}
    for name, builder in (("clusters_bounded", clusters_bounded),
                          ("star", star_components)):
        a = sorted(map(tuple, builder(spark, SF_DIR, 1).collect()))
        b = sorted(map(tuple, builder(spark, SF_DIR, 2).collect()))
        assert a == b, f"{name}: labels differ between cadences"
        times: dict = {"every1": [], "every2": []}
        for p in range(PASSES):
            for label, n in (("every1", 1), ("every2", 2)):
                spark.sparkContext.setJobDescription(
                    f"probe cc_check {name} {label} pass {p}")
                # REBUILD timing (bench.py semantics): the fixpoint loop
                # collects during CONSTRUCTION, so time build + write.
                t0 = time.monotonic()
                builder(spark, SF_DIR, n).write.format("noop") \
                    .mode("overwrite").save()
                times[label].append(round(time.monotonic() - t0, 3))
        out[name] = {k: {"times": v, "min": min(v)} for k, v in times.items()}
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
