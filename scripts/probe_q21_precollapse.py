#!/usr/bin/env python
"""q21 line-grain exchange pre-collapse probe (r11 verdict item 4): the
proposal was to partial-aggregate lineitem to (l_orderkey, l_suppkey,
max(late)) BEFORE the orderkey exchange — the q4 lever — "~4× fewer
rows". Two facts decide it, both measured here:

1. CARDINALITY: distinct (l_orderkey, l_suppkey) pairs ≈ lines on this
   lake (599k pairs / 600k lines at sf0.1, 59.88M / 60M at sf10 —
   l_suppkey is effectively random per line, so a multi-line order
   almost never repeats a supplier). The partial aggregate has ~nothing
   to combine: the q4 lever collapsed 4 lines/ORDER because q4 groups on
   the order alone; q21's first grouping key is the (order, supplier)
   pair, which is line-grain here.

2. PLAN SHAPE: groupBy(okey, skey) requires hash(okey, skey)
   clustering, which hash(okey) satisfies but a bare aggregate plans as
   its own exchange on BOTH keys — and the orderkey join then needs
   hash(okey) again, so the pre-collapse pays TWO ~line-grain exchanges
   where the shipped shape pays one (the join's own output partitioning
   already feeds both downstream aggregates, subset-of-clustering rule).

Rows asserted identical before timing; expected outcome is an
exoneration with numbers — committed either way per guide §1.1.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_q21_precollapse.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.tpch_full import (
    q21_waiting_suppliers,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def q21_precollapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verdict-item-4 variant: lineitem partial-aggregates to
    (l_orderkey, l_suppkey, max(l_shipdate)) BEFORE joining orders;
    `any line late` ≡ max(l_shipdate) > o_orderdate + 60 (o_orderdate is
    constant per order), so downstream aggregates are unchanged."""
    orders = (load_table(spark, sf_dir, "orders")
              .filter(C("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    li = (load_table(spark, sf_dir, "lineitem")
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max("l_shipdate").alias("max_ship")))
    late = (C("max_ship") > C("o_orderdate")
            + F.expr("INTERVAL 60 DAYS")).cast("int")
    per_os = (li.join(orders.hint("shuffle_hash"),
                      C("o_orderkey") == C("l_orderkey"))
              .select("l_orderkey", "l_suppkey", late.alias("s_late")))
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


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF_DIR, "lineitem")
    n_fact = li.count()
    apply_scaled_shuffle(spark, n_fact)
    n_pairs = li.select("l_orderkey", "l_suppkey").distinct().count()
    print(json.dumps({"lines": n_fact, "pairs": n_pairs,
                      "combine_ratio": round(n_fact / n_pairs, 4)}))

    a = sorted(map(tuple, q21_waiting_suppliers(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q21_precollapse(spark, SF_DIR).collect()))
    assert a == b, "q21 variants differ"

    times: dict = {"shipped": [], "precollapse": []}
    for p in range(PASSES):
        for label, fn in (("shipped", q21_waiting_suppliers),
                          ("precollapse", q21_precollapse)):
            spark.sparkContext.setJobDescription(f"probe q21 {label} p{p}")
            times[label].append(round(noop(fn(spark, SF_DIR)), 3))
    out = {"tier": TIER,
           **{k: {"times": v, "min": min(v)} for k, v in times.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
