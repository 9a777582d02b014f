#!/usr/bin/env python
"""Scan-parallelism decomposition for the corpus tables (guide §2.5 input
skew / §6.1 split sizing): at the sf10 tier `documents.parquet` is ONE
6 MB file (the 31-word fixture vocabulary dictionary-compresses ~36×)
holding 500k rows in 5 row groups, and `embeddings.parquet` is 50 MB /
200k rows in 2 row groups. Spark sizes splits by FILE BYTES
(maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
bytes/defaultParallelism)) — 4 MB openCost floors it), then assigns each
ROW GROUP to the split holding its midpoint — so the whole text family's
per-row compute (md5 folds, normalize regexes, shingle explodes) runs in
2 scan tasks while 30 cores idle, and the embeddings family in 2. The
r11 "compute-bound both engines pay" exonerations measured per-core
constants without noticing the idle cores.

Axes probed here, interleaved in one session:
- stock conf (shipped r11 behavior);
- scan floor: spark.sql.files.openCostInBytes lowered so bytes/cores can
  actually produce per-core splits for heavily-compressed small files
  (row-group count still caps effective tasks — that half of the fix is
  the lake layout, probed by rebuilding the tier lake with a bounded
  ROW_GROUP_SIZE; see OPTIMIZATION_r12.md).

Rows are asserted identical between conf settings before timing (conf
cannot change results, but the assert keeps the probe self-checking).

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_scan_parallelism.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from agentic_data_pipeline_spark.catalog import load_table, table_path
from agentic_data_pipeline_spark.session import (
    apply_scaled_shuffle, default_parallelism, get_spark,
)

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))

SUBJECTS = [
    "ext_training_prep_pipeline", "ext_curation_pipeline",
    "ext_docs_to_chunks", "ext_dedup_exact", "ext_text_stats",
    "ext_similarity_topk", "ext_dedup_clusters_bounded",
]

STOCK = {"spark.sql.files.openCostInBytes": str(4 * 1024 * 1024)}
FLOOR = {"spark.sql.files.openCostInBytes": str(64 * 1024)}


def set_conf(spark, conf: dict) -> None:
    for k, v in conf.items():
        spark.conf.set(k, v)


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded

    _ensure_loaded()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    out: dict = {"tier": TIER, "passes": PASSES,
                 "cores": default_parallelism(), "scan_tasks": {}}
    # Evidence: scan split counts per conf for the two corpus tables.
    for label, conf in (("stock", STOCK), ("floor", FLOOR)):
        set_conf(spark, conf)
        for t in ("documents", "embeddings", "lineitem"):
            df = spark.read.parquet(table_path(SF_DIR, t))
            out["scan_tasks"][f"{t}/{label}"] = df.rdd.getNumPartitions()
    print(json.dumps(out["scan_tasks"]))

    for name in SUBJECTS:
        fn = OPS[name].fn
        set_conf(spark, STOCK)
        a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        set_conf(spark, FLOOR)
        b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        assert a == b, f"{name}: rows differ across scan confs"
        times: dict = {"stock": [], "floor": []}
        for p in range(PASSES):
            for label, conf in (("stock", STOCK), ("floor", FLOOR)):
                set_conf(spark, conf)
                spark.sparkContext.setJobDescription(
                    f"probe scanpar {name} {label} pass {p}")
                times[label].append(round(noop(fn(spark, SF_DIR)), 3))
        out[name] = {k: {"times": v, "min": min(v)} for k, v in times.items()}
        print(name, json.dumps(out[name]))
    set_conf(spark, STOCK)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
