#!/usr/bin/env python
"""A/B: is pagerank's per-round localCheckpoint the bench-variance source?
(r8 verdict item 5 — ext_pagerank spans 3.0-6.7 s across same-code sf0.1
invocations, the noisiest line in the set; the hypothesis is that 10
in-memory checkpoint block sets create GC/memory pressure.)

Variants, interleaved round-robin so machine drift hits all equally:
  local_e1   — localCheckpoint every round (the shipped default)
  local_e2   — localCheckpoint every 2nd round (half the block sets;
               uncut rounds' plans double once)
  disk_e1    — reliable df.checkpoint() to .tmp/ckpt every round (no
               executor-memory blocks, GC-quiet, pays parquet-less HDFS-
               style write+read per round)

Edges/vertices are pre-materialized ONCE (localCheckpoint) so the A/B
times ONLY the 10-round iteration, not the kNN graph construction.
Ranks must be bit-identical across variants (exact double compare — the
cut changes WHERE lineage is truncated, never the arithmetic).

Usage: python scripts/probe_pagerank_checkpoint.py [sf_dir] [reps]
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
# r12 (verdict item 3): the r8 A/B ran under EAGER cuts; the r11 lazy-cut
# default changes the economics (two rounds of lineage per barrier vs
# one, and no per-round count() job either way), so the cadence question
# is re-asked under eager_cuts=False — the shipped configuration. The
# eager rows stay as the cross-session anchor.
VARIANTS = {
    "local_e1": {"checkpoint_every": 1},
    "local_e2": {"checkpoint_every": 2},
    "lazy_e1": {"checkpoint_every": 1, "eager_cuts": False},
    "lazy_e2": {"checkpoint_every": 2, "eager_cuts": False},
    "disk_e1": {"checkpoint_every": 1,
                "reliable_dir": os.path.join(REPO, ".tmp", "ckpt")},
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    _ensure_loaded()
    spark = get_spark(app_name="probe-pagerank-ckpt")
    spark.sparkContext.setLogLevel("ERROR")

    edges = (OPS["ext_knn_graph_batch"].fn(spark, sf)
             .select(C("vec_id").alias("src"), C("neighbor_id").alias("dst"))
             .localCheckpoint())
    verts = (load_table(spark, sf, "embeddings")
             .select(C("vec_id").alias("id")).localCheckpoint())

    # bit-identical check first (cheap, once per variant)
    ref = None
    for name, kw in VARIANTS.items():
        got = {r["id"]: r["rank"]
               for r in pagerank(verts, edges, **kw).collect()}
        if ref is None:
            ref = got
        assert got == ref, f"{name} ranks diverge from local_e1"

    times: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for _ in range(reps):
        for name, kw in VARIANTS.items():
            t0 = time.perf_counter()
            (pagerank(verts, edges, **kw)
             .write.mode("overwrite").format("noop").save())
            times[name].append(round(time.perf_counter() - t0, 2))
    print(json.dumps({
        "metric": "pagerank_checkpoint_ab", "sf_dir": sf, "reps": reps,
        "runs": times,
        "min": {n: min(v) for n, v in times.items()},
        "ranks_bit_identical": True,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))

    # Caller-owns-lifecycle for reliable_dir (pagerank docstring contract):
    # every disk_e1 result above has been fully consumed (noop-written /
    # collected), so the checkpoint files are dead — delete them.
    import shutil
    shutil.rmtree(VARIANTS["disk_e1"]["reliable_dir"], ignore_errors=True)


if __name__ == "__main__":
    main()
