#!/usr/bin/env python
"""A/B: per-round job-dispatch overhead in pagerank at dispatch-bound SF.

ext_pagerank is the largest single contributor to the sf0.1 floor gap
(3.2 s vs the twin's 0.49 s; 2000-vertex graph — the time is dispatch,
not compute). Two independent levers, 2x2 interleaved:

  eager vs lazy  — localCheckpoint(eager=False) keeps the identical
                   LogicalRDD plan barrier but skips the per-round
                   materializing count() job (~1 driver-synced job/round
                   saved; blocks materialize when the next round's stage
                   first reads them).
  aqe vs noaqe   — the loop's plans are tiny and fully hinted (explicit
                   broadcasts); AQE's per-stage driver replanning sync is
                   pure overhead on a 2000-row iteration. Conf is toggled
                   around the WHOLE build+execute window and restored.

Ranks must be bit-identical across all four (the cut and the planner
mode change where lineage is truncated / when stages are scheduled,
never the arithmetic).

Usage: python scripts/probe_pagerank_lazy.py [sf_dir] [reps]
Prints ONE JSON line; transcribed into BASELINE.md.
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
from agentic_data_pipeline_spark.operators.graph import pagerank
from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from agentic_data_pipeline_spark.session import get_spark

C = F.col
AQE = "spark.sql.adaptive.enabled"
VARIANTS = {
    "eager_aqe": {"eager_cuts": True, "aqe": True},    # shipped default
    "lazy_aqe": {"eager_cuts": False, "aqe": True},
    "eager_noaqe": {"eager_cuts": True, "aqe": False},
    "lazy_noaqe": {"eager_cuts": False, "aqe": False},
}


def run(spark, verts, edges, eager_cuts: bool, aqe: bool,
        action: str = "noop") -> dict | None:
    prev = spark.conf.get(AQE)
    spark.conf.set(AQE, "true" if aqe else "false")
    try:
        df = pagerank(verts, edges, eager_cuts=eager_cuts)
        if action == "collect":
            return {r["id"]: r["rank"] for r in df.collect()}
        df.write.mode("overwrite").format("noop").save()
        return None
    finally:
        spark.conf.set(AQE, prev)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    _ensure_loaded()
    spark = get_spark(app_name="probe-pagerank-lazy")
    spark.sparkContext.setLogLevel("ERROR")

    edges = (OPS["ext_knn_graph_batch"].fn(spark, sf)
             .select(C("vec_id").alias("src"), C("neighbor_id").alias("dst"))
             .localCheckpoint())
    verts = (load_table(spark, sf, "embeddings")
             .select(C("vec_id").alias("id")).localCheckpoint())

    # Same planner mode → bit-identical; across AQE modes the shuffle
    # partition coalescing changes summation ORDER, so ranks agree only
    # to the last ulp (~1e-16 rel after 10 damped rounds) — well inside
    # the op's floor(x*1e9) display rounding. Assert both levels.
    ranks: dict[str, dict] = {}
    for name, kw in VARIANTS.items():
        ranks[name] = run(spark, verts, edges, kw["eager_cuts"], kw["aqe"],
                          action="collect")
    assert ranks["lazy_aqe"] == ranks["eager_aqe"]
    assert ranks["lazy_noaqe"] == ranks["eager_noaqe"]
    ref = ranks["eager_aqe"]
    for name, got in ranks.items():
        worst = max(abs(got[k] - ref[k]) / max(abs(ref[k]), 1e-300)
                    for k in ref)
        assert got.keys() == ref.keys() and worst < 1e-12, (name, worst)

    times: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for _ in range(reps):
        for name, kw in VARIANTS.items():
            t0 = time.perf_counter()
            run(spark, verts, edges, kw["eager_cuts"], kw["aqe"])
            times[name].append(round(time.perf_counter() - t0, 2))
    print(json.dumps({
        "metric": "pagerank_lazy_aqe_ab", "sf_dir": sf, "reps": reps,
        "runs": times,
        "min": {n: min(v) for n, v in times.items()},
        "ranks_identical": "bit-identical per planner mode; <1e-12 rel "
                           "across AQE modes (summation order)",
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
