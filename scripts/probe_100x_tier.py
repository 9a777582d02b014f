#!/usr/bin/env python
"""The 100x-tier probe (r6 verdict item 5): blocked semdedup-cells + kNN
+ minhash at >=20M vectors / >=10M docs, three tiers each, confirming
(a) k ∝ N holds per-cell pair counts flat THROUGH the hierarchical
(IVF-swap) fit regime that full-corpus Lloyd cannot reach, and (b) the
LSH band join stays sparse (candidates ~ true-dup count, never ~N²).

Synthetic data is generated IN Spark (hash-derived, deterministic):
- vectors: 64-d, uniform from xxhash64; 10% unique-base so every vector
  has 9 exact duplicates (the near-dup regime blocking must co-locate);
- docs: 40 tokens from a 50k vocab; 2% of docs duplicate their
  predecessor (dup pairs are the band join's true signal).

Shuffle partitioning scales with the tier (n/100k, floored at the core
count): the bench default of 32 is right at sf0.1 but at 10M docs the
per-task aggregate state (shingle sets / signature buffers) grows into
~0.5 GB single allocations and the fixed-heap local JVM dies in GC —
exactly the "partition count is a function of data volume, not cluster
size" rule a 100 TB deployment lives by.

Run: python scripts/probe_100x_tier.py [small|vectors|docs]
     (small = 1/10 tiers; vectors/docs = that half only)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.dedup import minhash_candidates
from agentic_data_pipeline_spark.operators.similarity import (
    derive_cells, knn_graph_batch, semdedup_k_for,
)
from agentic_data_pipeline_spark.session import get_spark

C = F.col
MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
SMALL = MODE == "small"
VEC_TIERS = [2_000_000, 8_000_000, 20_000_000]
DOC_TIERS = [1_000_000, 4_000_000, 10_000_000]
if SMALL:
    VEC_TIERS = [v // 10 for v in VEC_TIERS]
    DOC_TIERS = [d // 10 for d in DOC_TIERS]


def synth_vectors(spark, n):
    base = (C("id") - F.pmod(C("id"), F.lit(10))).alias("b")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.xxhash64(base, i), 100_000) / 100_000.0 - 0.5)
        .cast("float"))
    return spark.range(n).select(C("id").alias("vec_id"),
                                 vec.alias("embedding"))


def synth_docs(spark, n):
    base = F.when(F.pmod(C("id"), F.lit(50)) == 1, C("id") - 1) \
        .otherwise(C("id"))
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda j: F.concat(F.lit("w"),
                           F.pmod(F.xxhash64(base, j), 50_000))))
    return spark.range(n).select(C("id").alias("doc_id"),
                                 text.alias("text"))


def scale_shuffle(spark, n):
    """Partition count follows data volume — the ENGINE rule (r8: promoted
    from this probe into session.apply_scaled_shuffle)."""
    from agentic_data_pipeline_spark.session import apply_scaled_shuffle
    apply_scaled_shuffle(spark, n)


def vec_tier(spark, n):
    scale_shuffle(spark, n)
    emb = synth_vectors(spark, n).localCheckpoint()
    t0 = time.perf_counter()
    cells = derive_cells(emb)
    sz = (cells.groupBy("__cell").agg(F.count(F.lit(1)).alias("s"))
          .agg(F.count(F.lit(1)).alias("n_cells"),
               F.avg("s").alias("mean"), F.max("s").alias("mx"),
               F.avg(C("s") * (C("s") - 1)).alias("mean_pairs"),
               F.max(C("s") * (C("s") - 1)).alias("max_pairs")).first())
    t_cells = time.perf_counter() - t0
    t0 = time.perf_counter()
    assigned = (emb.join(cells.hint("shuffle_hash"), "vec_id")
                .select("vec_id", "__cell", "embedding"))
    n_edges = knn_graph_batch(assigned, k=3, block_col="__cell").count()
    t_knn = time.perf_counter() - t0
    print(f"vectors n={n:9d} k_target={semdedup_k_for(n):7d} "
          f"cells={sz['n_cells']:7d} mean={sz['mean']:6.1f} "
          f"max={sz['mx']:6d} mean_pairs={sz['mean_pairs']:8.0f} "
          f"max_pairs={sz['max_pairs']:9.0f} edges={n_edges:9d} "
          f"wall_cells={t_cells:7.1f}s wall_knn={t_knn:7.1f}s", flush=True)
    emb.unpersist()
    return sz["mean_pairs"]


def doc_tier(spark, n):
    scale_shuffle(spark, n)
    docs = synth_docs(spark, n).localCheckpoint()
    t0 = time.perf_counter()
    pairs = minhash_candidates(docs, "doc_id", "text", 0.5)
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0
    true_dups = n // 50
    print(f"docs    n={n:9d} verified_pairs={n_pairs:9d} "
          f"true_dups~{true_dups:8d} pairs_per_doc={n_pairs / n:7.4f} "
          f"wall={wall:7.1f}s", flush=True)
    docs.unpersist()


def main():
    spark = get_spark(app_name="probe-100x")
    spark.sparkContext.setLogLevel("ERROR")
    if MODE != "docs":
        means = [vec_tier(spark, n) for n in VEC_TIERS]
        print(f"flatness: mean per-cell pairs tier1 -> tier3 ratio "
              f"{means[-1] / means[0]:.2f} over a "
              f"{VEC_TIERS[-1] // VEC_TIERS[0]}x corpus", flush=True)
    if MODE != "vectors":
        for n in DOC_TIERS:
            doc_tier(spark, n)


if __name__ == "__main__":
    main()
