#!/usr/bin/env python
"""Probe: MinHash-LSH dedup growth curve.

The question the 100 TB design point asks of minhash_candidates: does
wall-time grow ~linearly with corpus size (banding keeps the candidate
join sparse), or quadratically (all-pairs leakage)? Synthetic corpus of
W-word shuffled docs with a controlled 1% near-dup rate, measured at
1x / 2x / 4x / 8x of N0 = 25k docs.

Run:  python scripts/probe_dedup_scale.py   (results in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.dedup import minhash_candidates
from agentic_data_pipeline_spark.session import get_spark

N0, WORDS = 25_000, 40
C = F.col


def corpus(spark, n: int):
    """Deterministic synthetic docs: 40 pseudo-words drawn from a 1000-word
    vocab by hash; every 100th doc is a near-copy of its predecessor
    (3 words changed) so the true near-dup rate is a known 1%."""
    base = spark.range(n).select(
        C("id").alias("doc_id"),
        F.array_join(F.transform(
            F.sequence(F.lit(0), F.lit(WORDS - 1)),
            lambda i: F.concat(F.lit("w"), F.pmod(
                F.xxhash64((C("id") - F.when(F.pmod(C("id"), 100) == 0, 1)
                            .otherwise(0)) * WORDS + i
                           + F.when((F.pmod(C("id"), 100) == 0) & (i < 3),
                                    F.lit(10_000_000)).otherwise(0)),
                F.lit(1000)))), " ").alias("text"),
    )
    return base


def main() -> None:
    spark = get_spark(app_name="probe-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    prev = None
    for mult in (1, 2, 4, 8):
        n = N0 * mult
        docs = corpus(spark, n).persist()
        docs.count()
        cand = minhash_candidates(docs, "doc_id", "text", 0.5)
        t0 = time.perf_counter()
        n_pairs = cand.count()
        dt = time.perf_counter() - t0
        growth = f"  x{dt / prev:.2f} vs prev" if prev else ""
        print(f"N={n:7d}  pairs={n_pairs:6d}  {dt:6.2f} s{growth}")
        prev = dt
        docs.unpersist()


if __name__ == "__main__":
    main()
