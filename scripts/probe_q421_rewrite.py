#!/usr/bin/env python
"""q4/q21 exchange-diet probe (r11).

q4 (4.2x at the sf10 floor): the EXISTS semi join shuffles the full
60M-row (l_orderkey, l_shipdate) projection. But the correlated
predicate only needs the per-order MAX shipdate — EXISTS(shipdate >
o_orderdate + 60) == max(shipdate) > o_orderdate + 60 — so pre-agg
lineitem to the order grain first: the map-side partial combine
collapses ~4 lines/order before the exchange, and the orderkey
exchange it pays is the same one the semi join needed anyway.

q21 (2.3x): the shipped plan assumes the 'F'-filtered orders side
BROADCASTS, keeping the join output on the scan partitioning, and pays
an explicit repartition(l_orderkey) to make the two aggregates
exchange-free. At sf10 the orders side is ~7M rows — it does NOT
broadcast, so the join itself shuffles AND the explicit repartition
re-shuffles the fact-sized join output. Variant: shuffle-hash join on
the orderkey and drop the repartition — the join's own hash(orderkey)
output partitioning already satisfies both aggregates' clustering.

Interleaved fresh-noop A/B, results hash-checked identical first.
Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_q421_rewrite.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.analytics import q4_late_shipments
from agentic_data_pipeline_spark.operators.tpch_full import q21_waiting_suppliers
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def q4_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))))
    li_max = (load_table(spark, sf_dir, "lineitem")
              .select("l_orderkey", "l_shipdate")
              .groupBy("l_orderkey")
              .agg(F.max("l_shipdate").alias("max_ship")))
    return (orders.join(li_max.hint("shuffle_hash"),
                        C("l_orderkey") == C("o_orderkey"))
            .filter(C("max_ship") > C("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


def q21_joinpart(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (load_table(spark, sf_dir, "orders")
              .filter(C("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = (C("l_shipdate") > C("o_orderdate")
            + F.expr("INTERVAL 60 DAYS")).cast("int")
    per_os = (li.join(orders.hint("shuffle_hash"),
                      C("o_orderkey") == C("l_orderkey"))
              .groupBy("l_orderkey", "l_suppkey")
              .agg(F.max(late).alias("s_late")))
    per_order = (per_os.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sum("s_late").alias("n_late_supp"),
                      F.max(F.when(C("s_late") == 1, C("l_suppkey")))
                       .alias("late_supp")))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((C("n_supp") > 1) & (C("n_late_supp") == 1))
        .join(F.broadcast(supp), C("s_suppkey") == C("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def canon(df: DataFrame) -> list:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    import pyarrow.parquet as pq
    spark = get_spark(app_name="probe-q421")
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    apply_scaled_shuffle(spark, n_fact)

    variants = {
        "q4_current": lambda: q4_late_shipments(spark, SF_DIR),
        "q4_preagg": lambda: q4_preagg(spark, SF_DIR),
        "q21_current": lambda: q21_waiting_suppliers(spark, SF_DIR),
        "q21_joinpart": lambda: q21_joinpart(spark, SF_DIR),
    }
    assert canon(variants["q4_current"]()) == canon(variants["q4_preagg"]())
    assert canon(variants["q21_current"]()) == canon(variants["q21_joinpart"]())

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(PASSES):
        for name, build in variants.items():
            times[name].append(round(timed(build()), 2))
    print(json.dumps({
        "metric": "q421_rewrite_ab", "tier": TIER, "n_fact": n_fact,
        "passes": PASSES, "runs": times,
        "min": {n: min(v) for n, v in times.items()},
        "results_identical": True,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
