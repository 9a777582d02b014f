#!/usr/bin/env python
"""Apex-salting probe for triangle_count (r7 verdict item 6).

The degree-ordered orientation BOUNDS any apex's out-degree at O(√m), but
a dense near-dup community (clique-like: template spam, mirrored boiler-
plate) still concentrates its whole (√m)² wedge volume on the ONE join
key of its (deg,id)-minimum apex — one task does all the work. The
salting knob (triangle_count(salt_threshold=..., salt_buckets=S)) splits
a heavy apex's wedge generation over S join keys.

Graph per tier: n-vertex ring background (3 edges/vertex) + a planted
K-clique (the dense community) + a planted star hub of degree n/10 —
16× the r7 probe's first tier with a 10× bigger hub, per the verdict.

Measured per tier:
- totals: exact equality of the FULL per-vertex result between salted
  and unsalted runs (exceptAll both directions == 0), not just sums;
- max-key wedge candidates: max over join keys of |leg1|x|leg2| — the
  per-task volume bound the salt exists to cut (computed analytically
  from the oriented edge set, same expressions as the operator);
- wall clock for both runs.

Results are transcribed into BASELINE.md (round 8).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.operators.graph import triangle_count
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col

CLIQUE_K = 512
SALT_S = 16
SALT_THRESHOLD = 64


def synth_graph(spark, n: int):
    """Ring background + K-clique on every (n//K)-th vertex + star hub:
    vertex 0 adjacent to every 10th vertex (degree n/10)."""
    ring = spark.range(n).select(
        C("id").alias("src"), ((C("id") + 1) % n).alias("dst"))
    step = max(1, n // CLIQUE_K)
    members = spark.range(CLIQUE_K).select((C("id") * step + 7).alias("m"))
    a = members.select(C("m").alias("src"))
    b = members.select(C("m").alias("dst"))
    clique = a.crossJoin(b).filter(C("src") < C("dst"))
    hub = spark.range(n // 10).select(
        F.lit(0).cast("bigint").alias("src"), (C("id") * 10 + 3).alias("dst"))
    return ring.unionByName(clique).unionByName(hub)


def max_key_candidates(edges, salted: bool):
    """Max per-join-key wedge-candidate volume, from the SAME oriented
    construction the operator builds (analytic, no execution of the
    join)."""
    und = (edges.filter(C("src") != C("dst"))
           .select(F.least("src", "dst").alias("u"),
                   F.greatest("src", "dst").alias("v")).distinct())
    deg = (und.select(C("u").alias("x"))
           .unionAll(und.select(C("v").alias("x")))
           .groupBy("x").agg(F.count(F.lit(1)).alias("degree")))
    wd = (und.join(deg.select(C("x").alias("u"),
                              C("degree").alias("du")), "u")
          .join(deg.select(C("x").alias("v"),
                           C("degree").alias("dv")), "v"))
    u_first = (C("du") < C("dv")) | ((C("du") == C("dv")) & (C("u") < C("v")))
    oriented = wd.select(
        F.when(u_first, C("u")).otherwise(C("v")).alias("a"),
        F.when(u_first, C("v")).otherwise(C("u")).alias("b"))
    od = oriented.groupBy("a").agg(F.count(F.lit(1)).alias("od"))
    if not salted:
        return od.agg(F.max(C("od") * C("od"))).first()[0]
    heavy = C("od") > SALT_THRESHOLD
    bucket = (oriented.join(od, "a")
              .select(C("a"),
                      F.when(heavy, F.pmod(F.xxhash64(C("b")),
                                           F.lit(SALT_S)))
                      .otherwise(F.lit(0)).alias("s"), C("od"))
              .groupBy("a", "s").agg(F.count(F.lit(1)).alias("bn"),
                                     F.first("od").alias("od")))
    return bucket.agg(F.max(C("od") * C("bn"))).first()[0]


def main() -> None:
    spark = get_spark(app_name="probe-tri-salt")
    spark.sparkContext.setLogLevel("ERROR")
    for n in (1_600_000,):
        apply_scaled_shuffle(spark, n)
        edges = synth_graph(spark, n).localCheckpoint()
        m = edges.count()

        t0 = time.perf_counter()
        plain = triangle_count(edges).localCheckpoint()
        s_plain = plain.agg(F.sum("triangles").alias("t"),
                            F.count(F.lit(1)).alias("v")).first()
        t_plain = time.perf_counter() - t0

        t0 = time.perf_counter()
        salted = triangle_count(edges, salt_threshold=SALT_THRESHOLD,
                                salt_buckets=SALT_S).localCheckpoint()
        s_salt = salted.agg(F.sum("triangles").alias("t"),
                            F.count(F.lit(1)).alias("v")).first()
        t_salt = time.perf_counter() - t0

        d1 = plain.exceptAll(salted).count()
        d2 = salted.exceptAll(plain).count()
        mk_plain = max_key_candidates(edges, salted=False)
        mk_salt = max_key_candidates(edges, salted=True)
        print(f"n={n} edges={m} clique_k={CLIQUE_K} hub_deg={n // 10} | "
              f"plain: wall={t_plain:.1f}s 3t={s_plain['t']} "
              f"maxkey={mk_plain} | "
              f"salted(S={SALT_S},thr={SALT_THRESHOLD}): wall={t_salt:.1f}s "
              f"3t={s_salt['t']} maxkey={mk_salt} | "
              f"identical={d1 == 0 and d2 == 0} (exceptAll {d1}/{d2})",
              flush=True)


if __name__ == "__main__":
    main()
