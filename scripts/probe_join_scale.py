#!/usr/bin/env python
"""Scale probe: do the multi-join analytic plans (Q3/Q5/Q10 shapes,
operators/analytics.py) hold up when the fact side grows 20×?

Facts (orders, lineitem) are exploded ×20 with distinct synthetic keys
(key' = key*20 + i, so join fan-out and group cardinality scale with the
data instead of multiplying into a cross product); dims stay fixed — the
realistic 100 TB shape (facts grow, dims don't). Checks, per query:

  - wall time at 1× vs 20× (sublinear ⇒ fixed overhead amortizes; the
    broadcast side must NOT become the bottleneck);
  - the physical plan keeps every dim join a BroadcastHashJoin at 20×.

Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.analytics import _revenue
from agentic_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
SCALED_DIR = "/root/repo/.tmp/join_scale_20x"
FACTOR = 20

C = F.col


def build_scaled(spark) -> None:
    if os.path.exists(os.path.join(SCALED_DIR, "_done")):
        return
    os.makedirs(SCALED_DIR, exist_ok=True)
    mult = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("i")
    orders = load_table(spark, SF_DIR, "orders").select("*", mult)
    (orders
     .withColumn("o_orderkey", C("o_orderkey") * FACTOR + C("i"))
     .drop("i")
     .write.mode("overwrite").parquet(f"{SCALED_DIR}/orders.parquet"))
    li = load_table(spark, SF_DIR, "lineitem").select("*", mult)
    (li
     .withColumn("l_orderkey", C("l_orderkey") * FACTOR + C("i"))
     .drop("i")
     .write.mode("overwrite").parquet(f"{SCALED_DIR}/lineitem.parquet"))
    for dim in ("customer", "supplier", "nation", "region"):
        load_table(spark, SF_DIR, dim).write.mode("overwrite").parquet(
            f"{SCALED_DIR}/{dim}.parquet")
    open(os.path.join(SCALED_DIR, "_done"), "w").close()


def q3(spark, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .filter(C("c_mktsegment") == "BUILDING").select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(C("o_orderdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
              .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(C("l_shipdate") > F.lit("1998-07-01").cast("timestamp_ntz"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (orders.join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
            .join(li, C("l_orderkey") == C("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(_revenue().alias("revenue"))
            .orderBy(C("revenue").desc(), "l_orderkey").limit(10))


def q10(spark, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(C("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, C("l_orderkey") == C("o_orderkey"))
            .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
            .join(F.broadcast(nation), C("c_nationkey") == C("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(_revenue().alias("revenue"))
            .orderBy(C("revenue").desc(), "c_custkey").limit(20))


def bhj_count(df: DataFrame) -> tuple[int, bool]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    tree = p.split("\n\n")[0]
    return tree.count("BroadcastHashJoin"), ("SortMergeJoin" in tree
                                            or "ShuffledHashJoin" in tree)


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="probe-join-scale")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    out: dict = {"factor": FACTOR, "queries": {}}
    for name, fn in (("q3", q3), ("q10", q10)):
        small, big = fn(spark, SF_DIR), fn(spark, SCALED_DIR)
        timed(small), timed(big)  # warm-up / codegen
        t1 = min(timed(small) for _ in range(2))
        t20 = min(timed(big) for _ in range(2))
        n_bhj, has_smj = bhj_count(big)
        out["queries"][name] = {
            "sec_1x": round(t1, 3), "sec_20x": round(t20, 3),
            "scaleup": round(t20 / t1, 2),
            "bhj_at_20x": n_bhj, "fact_join_shuffles": has_smj,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
