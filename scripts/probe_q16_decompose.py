#!/usr/bin/env python
"""q16 per-stage decomposition at a big tier (r10 verdict item 4 — close
q16 the way q9 was closed: either a <2.8x variant exists or the residual
ratio is formally attributed with a measured breakdown).

Stages (cumulative prefixes of the shipped plan, each noop-written from a
FRESH build per run — bench.py methodology, no shuffle reuse):

  scan_li        lineitem (l_partkey, l_suppkey) scan only
  join_part      + broadcast join partkey->spec_id (spec-filtered dim)
  join_anti      + broadcast anti join the negative-balance blocklist
  distinct_pairs + dropDuplicates(spec_id, l_suppkey)  [isolates level 1
                   of the countDistinct two-level aggregate: the partial
                   map-side dedup + the sized exchange]
  full           the shipped q16 (countDistinct + strings join-back)

Variants (interleaved with the stages, value-hash-checked):

  two_step       explicit groupBy(spec_id, suppkey) -> groupBy count
                 (what the countDistinct expand should already be)
  noop_floor     a 1-row dispatch-cost measurement (q22-style floor)

Usage: python scripts/probe_q16_decompose.py [sf_dir] [passes]
       default sf_dir .tmp/sf10 (build it first via bench_sf1.py
       SPARK_GRAFT_REPLICAS=100), passes 3.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from agentic_data_pipeline_spark.catalog import load_table  # noqa: E402
from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded  # noqa: E402
from agentic_data_pipeline_spark.session import (  # noqa: E402
    apply_scaled_shuffle, get_spark)

C = F.col
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".tmp",
                                                            "sf10")
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _parts(spark, sf_dir):
    """The q16 dim subtrees, rebuilt fresh (spec map NOT pinned here —
    each stage build pays it identically, so stage deltas are clean)."""
    part = (load_table(spark, sf_dir, "part")
            .filter((C("p_brand") != "Brand#1")
                    & (C("p_type") != "PROMO")
                    & C("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25, 28))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    specs = (part.select("p_brand", "p_type", "p_size").distinct()
             .withColumn("spec_id", F.row_number().over(
                 Window.orderBy("p_brand", "p_type", "p_size")))
             .localCheckpoint())
    part_id = (part.join(F.broadcast(specs),
                         ["p_brand", "p_type", "p_size"])
               .select("p_partkey", "spec_id"))
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(C("s_acctbal") < 0).select("s_suppkey"))
    return specs, part_id, bad


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="probe-q16-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    import pyarrow.parquet as pq
    n_fact = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    apply_scaled_shuffle(spark, n_fact)

    def scan_li():
        return load_table(spark, SF_DIR, "lineitem").select(
            "l_partkey", "l_suppkey")

    def join_part():
        _, part_id, _ = _parts(spark, SF_DIR)
        return scan_li().join(F.broadcast(part_id),
                              C("p_partkey") == C("l_partkey"))

    def join_anti():
        _, part_id, bad = _parts(spark, SF_DIR)
        return (scan_li()
                .join(F.broadcast(part_id), C("p_partkey") == C("l_partkey"))
                .join(F.broadcast(bad), C("l_suppkey") == C("s_suppkey"),
                      "left_anti"))

    def distinct_pairs():
        return join_anti().dropDuplicates(["spec_id", "l_suppkey"])

    def full():
        return OPS["q16_part_supplier_counts"].fn(spark, SF_DIR)

    def two_step():
        specs, part_id, bad = _parts(spark, SF_DIR)
        pairs = (scan_li()
                 .join(F.broadcast(part_id), C("p_partkey") == C("l_partkey"))
                 .join(F.broadcast(bad), C("l_suppkey") == C("s_suppkey"),
                       "left_anti")
                 .groupBy("spec_id", "l_suppkey").agg(F.lit(1)))
        return (pairs.groupBy("spec_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("supplier_cnt"))
                .join(F.broadcast(specs), "spec_id")
                .select("p_brand", "p_type", "p_size", "supplier_cnt"))

    def noop_floor():
        return spark.range(1)

    builders = {
        "scan_li": scan_li, "join_part": join_part, "join_anti": join_anti,
        "distinct_pairs": distinct_pairs, "full": full,
        "two_step": two_step, "noop_floor": noop_floor,
    }

    # cardinalities once (documents the pruning story)
    out: dict = {"sf_dir": SF_DIR, "passes": PASSES, "n_lineitem": n_fact}
    out["n_after_part_join"] = join_part().count()
    out["n_after_anti"] = join_anti().count()
    out["n_distinct_pairs"] = distinct_pairs().count()
    out["n_specs"] = full().count()

    # value parity: shipped vs two_step, sorted-row hash
    a = sorted(map(tuple, full().collect()))
    b = sorted(map(tuple, two_step().collect()))
    out["variants_identical"] = a == b

    for name, build in builders.items():     # warm-up
        timed(build())
    runs: dict[str, list[float]] = {n: [] for n in builders}
    for _ in range(PASSES):
        for name, build in builders.items():
            runs[name].append(timed(build()))
    for name in builders:
        out[name] = round(min(runs[name]), 3)
        out[name + "_all"] = [round(x, 3) for x in runs[name]]
    out["load_avg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
