#!/usr/bin/env python
"""Probe: the FUSED hierarchical semdedup path at the 100× tier
(r8 verdict item 9). The r8 fusion (similarity.py _semdedup_hier_fused:
coarse starved MLlib fit + per-cell sub-Lloyd + BLAS within-cell dedup in
ONE applyInPandas) was only measured to sf3 (60k vectors); the r7
derive_cells socket stall was found at the 8M rung, so the fused path
must demonstrate the same input-heavy/output-light shape holds at 20M
vectors: no Python-runner stall, wall ∝ N.

Method: deterministic hash-derived vectors (distributed generation, no
driver data) at a geometric ladder ending at 20M, D=64 to match the
fixture's embedding shape (the Python boundary carries N·D·8 bytes IN —
at 20M that is ~10 GB, the exact load that stalled the old re-emitting
mapInPandas — and 3 narrow columns OUT). k = semdedup_k_for(N) ≈ N/64,
always the hierarchical regime. Each rung measures a fresh noop write
(BENCH methodology — no shuffle reuse) and reports wall, wall-per-1M
rows, and the kept-fraction sanity band. Prints ONE JSON line;
transcribed into BASELINE.md.

NOTE: this probe also exercises the r9 pmod fix at the only scale where
it matters — n > 262,144 makes the coarse-fit sample path take the
filtered branch, and with the old signed-% filter the "256k sample" was
actually ~n/2 (≈10M rows at the top rung) scanned per MLlib iteration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.similarity import (
    semdedup, semdedup_k_for,
)
from agentic_data_pipeline_spark.session import get_spark

D = 64
SCALES = [2_000_000, 8_000_000, 20_000_000]


def synth_vectors(spark, n: int):
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    vec = F.array(*[
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2001)) - 1000)
        .cast("double") / 1000.0
        for j in range(D)
    ])
    return df.select("vec_id", vec.alias("embedding").cast("array<float>"))


def main() -> None:
    spark = get_spark(app_name="probe-semdedup-fused")
    spark.sparkContext.setLogLevel("ERROR")
    rungs = []
    for n in SCALES:
        emb = synth_vectors(spark, n)
        k = semdedup_k_for(n)
        t0 = time.perf_counter()
        out = semdedup(emb, k_clusters=k, threshold=0.8)
        kept = out.agg(F.count(F.lit(1)).alias("n"),
                       F.sum(F.col("kept").cast("long")).alias("k")).collect()[0]
        wall = time.perf_counter() - t0
        rungs.append({
            "n_vectors": n, "k_clusters": k, "wall_sec": round(wall, 1),
            "sec_per_1m": round(wall / (n / 1e6), 2),
            "rows_out": kept["n"], "kept": int(kept["k"]),
            "kept_frac": round(kept["k"] / kept["n"], 4),
        })
        print(f"# rung n={n:,} wall={wall:.1f}s "
              f"sec/1M={rungs[-1]['sec_per_1m']}", file=sys.stderr)
    print(json.dumps({
        "metric": "semdedup_fused_scale_probe", "dim": D,
        "rungs": rungs,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
