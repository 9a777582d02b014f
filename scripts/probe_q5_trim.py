#!/usr/bin/env python
"""q5 post-agg name-attach trim (r11 verdict item 5): the shipped r11
shape re-joined the nation⋈region ASIA subtree AFTER the aggregate just
to attach n_name — but every c_nationkey reaching the aggregate already
passed through the ASIA-customer cut, so the region re-filter is a
provably-redundant BroadcastExchange + BHJ build per run at the
dispatch-bound tier (q5 is the #2 sf0.1 regression row from r11's
deliberate scale trade). The trim joins plain `nation` (n_nationkey is
unique → the inner join can neither drop nor duplicate). Rows asserted
identical before timing.

Usage: SPARK_GRAFT_TIER=sf0.1 python scripts/probe_q5_trim.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.analytics import (
    _rev_c, _rev_sum, q5_local_supplier_volume,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf0.1")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "4"))


def q5_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r11 shape: asia_nations (nation⋈region) re-broadcast post-agg."""
    region = (load_table(spark, sf_dir, "region")
              .filter(C("r_name") == "ASIA").select("r_regionkey"))
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), C("n_regionkey") == C("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(F.broadcast(asia_nations.select("n_nationkey")),
                  C("c_nationkey") == C("n_nationkey"))
            .select("c_custkey", "c_nationkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey")
              .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
              .select("o_orderkey", "c_nationkey"))
    supplier = (load_table(spark, sf_dir, "supplier")
                .select("s_suppkey", "s_nationkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", _rev_c().alias("rev_c")))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .join(F.broadcast(supplier),
              (C("l_suppkey") == C("s_suppkey"))
              & (C("c_nationkey") == C("s_nationkey")))
        .groupBy("c_nationkey")
        .agg(_rev_sum().alias("revenue"))
        .join(F.broadcast(asia_nations), C("c_nationkey") == C("n_nationkey"))
        .select("n_name", "revenue")
    )


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    a = sorted(map(tuple, q5_before(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q5_local_supplier_volume(spark, SF_DIR).collect()))
    assert a == b, "q5 variants differ"

    times: dict = {"before": [], "after": []}
    for p in range(PASSES):
        for label, fn in (("before", q5_before),
                          ("after", q5_local_supplier_volume)):
            spark.sparkContext.setJobDescription(f"probe q5trim {label} p{p}")
            times[label].append(round(noop(fn(spark, SF_DIR)), 3))
    out = {"tier": TIER,
           **{k: {"times": v, "min": min(v)} for k, v in times.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
