#!/usr/bin/env python
"""Narrow-the-exchange probe (r11, guide §2.3): the orderkey exchange in
q3/q5/q7/q8/q10 ships the revenue inputs as two DECIMAL columns
(l_extendedprice, l_discount) plus — in q7/q8 — a nation-name STRING, and
q9's supplier/nation dims still attach AFTER its exchange. Every decision
downstream needs only the per-row revenue product (exact BIGINT cents²)
and, for q7/q8, a 1-byte role code; folding them map-side shrinks exchange
bytes 25-60% at any scale without touching row counts:

  q3/q5/q10: (ext DECIMAL, disc DECIMAL) -> rev_c BIGINT        (-8B/row)
  q7:        + supp/cust nation STRING -> 1-byte code            (-~16B/row)
  q8:        + nation_c conditional folded pre-exchange          (-~16B/row)
  q9:        supp+nation broadcasts moved BEFORE the exchange,
             profit folded: 6 cols (48B) -> (okey, nkey, profit) (20B)
  q12:       orders side drops the priority STRING for a BOOLEAN

Grouping keys that were 1:1 strings (n_name) become the integer key with
the name re-attached AFTER the aggregate (25-row broadcast / CASE) — the
string never crosses the wire. Sums are exact integer cents so every
variant is bit-identical to the shipped query (asserted here first).

Interleaved fresh-noop-write A/B, PASSES per variant, one session.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_narrow_exchange.py
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
    q3_shipping_priority, q5_local_supplier_volume, q7_volume_shipping,
    q10_returned_items,
)
from agentic_data_pipeline_spark.operators.tpch_full import (
    cents, q8_market_share, q9_product_profit, q12_priority_by_delay,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def _rev_c() -> F.Column:
    return cents("l_extendedprice") * (100 - cents("l_discount"))


def q3_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .filter(C("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(C("o_orderdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
              .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(C("l_shipdate") > F.lit("1998-07-01").cast("timestamp_ntz"))
          .select("l_orderkey", _rev_c().alias("rev_c")))
    return (
        orders.join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
        .join(li.hint("shuffle_hash"), C("l_orderkey") == C("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("rev_c").cast("double") / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(C("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q5_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .agg((F.sum("rev_c").cast("double") / 10000.0).alias("revenue"))
        .join(F.broadcast(asia_nations), C("c_nationkey") == C("n_nationkey"))
        .select("n_name", "revenue")
    )


def q7_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").filter(
        C("n_name").isin("NATION_1", "NATION_2"))
    code = F.when(C("n_name") == "NATION_1", F.lit(1)).otherwise(F.lit(2)) \
        .cast("tinyint")
    n1 = nation.select(C("n_nationkey").alias("s_nkey"), code.alias("s_code"))
    n2 = nation.select(C("n_nationkey").alias("c_nkey"), code.alias("c_code"))
    supp = (load_table(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n1), C("s_nationkey") == C("s_nkey"))
            .select("s_suppkey", "s_code"))
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(F.broadcast(n2), C("c_nationkey") == C("c_nkey"))
            .select("c_custkey", "c_code"))
    orders = (load_table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey")
              .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
              .select("o_orderkey", "c_code"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((C("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                  & (C("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
          .select("l_orderkey", "l_suppkey",
                  F.year("l_shipdate").cast("bigint").alias("l_year"),
                  _rev_c().alias("rev_c"))
          .join(F.broadcast(supp), C("l_suppkey") == C("s_suppkey"))
          .select("l_orderkey", "l_year", "rev_c", "s_code"))
    name = {1: "NATION_1", 2: "NATION_2"}
    to_name = lambda c: F.when(C(c) == 1, name[1]).otherwise(name[2])  # noqa: E731
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .filter(((C("s_code") == 1) & (C("c_code") == 2))
                | ((C("s_code") == 2) & (C("c_code") == 1)))
        .groupBy("s_code", "c_code", "l_year")
        .agg((F.sum("rev_c").cast("double") / 10000.0).alias("revenue"))
        .select(to_name("s_code").alias("supp_nation"),
                to_name("c_code").alias("cust_nation"), "l_year", "revenue")
    )


def q8_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = (load_table(spark, sf_dir, "region")
              .filter(C("r_name") == "ASIA").select("r_regionkey"))
    nation = load_table(spark, sf_dir, "nation")
    mkt_nations = (nation.join(F.broadcast(region),
                               C("n_regionkey") == C("r_regionkey"))
                   .select(C("n_nationkey").alias("mkt_nkey")))
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(F.broadcast(mkt_nations), C("c_nationkey") == C("mkt_nkey"))
            .select("c_custkey"))
    part = (load_table(spark, sf_dir, "part")
            .filter(C("p_type") == "STANDARD").select("p_partkey"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    n1key = (load_table(spark, sf_dir, "nation")
             .filter(C("n_name") == "NATION_1")
             .select(C("n_nationkey").alias("sn_nkey")))
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey", "o_orderdate")
              .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
              .select("o_orderkey",
                      F.year("o_orderdate").cast("bigint").alias("o_year")))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
                  _rev_c().alias("rev_c"))
          .join(F.broadcast(part), C("l_partkey") == C("p_partkey"))
          .join(F.broadcast(supp), C("l_suppkey") == C("s_suppkey"))
          .join(F.broadcast(n1key), C("s_nationkey") == C("sn_nkey"), "left")
          .select("l_orderkey", "rev_c",
                  C("sn_nkey").isNotNull().alias("is_n1")))
    nation_c = F.when(C("is_n1"), C("rev_c")).otherwise(F.lit(0))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .groupBy("o_year")
        .agg((F.sum(nation_c).cast("double")
              / F.sum("rev_c").cast("double")).alias("mkt_share"))
    )


def q9_pre(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (load_table(spark, sf_dir, "part")
            .filter(C("p_name").like("%widget%"))
            .select("p_partkey", "p_retailprice"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", C("n_name").alias("nation"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    profit_c4 = (cents("l_extendedprice") * (100 - cents("l_discount"))
                 - cents("p_retailprice") * cents("l_quantity"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount", "l_quantity")
          .join(F.broadcast(part), C("p_partkey") == C("l_partkey"))
          .join(F.broadcast(supp), C("s_suppkey") == C("l_suppkey"))
          .select("l_orderkey", C("s_nationkey").alias("nkey"),
                  profit_c4.alias("profit_c4")))
    return (
        li.join(orders.hint("shuffle_hash"), C("o_orderkey") == C("l_orderkey"))
        .groupBy("nkey", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((F.sum("profit_c4").cast("double") / 10000.0).alias("profit"))
        .join(F.broadcast(nation), C("nkey") == C("n_nationkey"))
        .select("nation", "o_year", "profit")
    )


def q10_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(C("l_returnflag") == "R")
          .select("l_orderkey", _rev_c().alias("rev_c")))
    return (
        li.join(orders.hint("shuffle_hash"), C("l_orderkey") == C("o_orderkey"))
        .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
        .join(F.broadcast(nation), C("c_nationkey") == C("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum("rev_c").cast("double") / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(C("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q12_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        C("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("high"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((C("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                  & (C("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
          .select("l_orderkey", "l_shipdate"))
    return (
        li.join(orders.hint("shuffle_hash"),
                C("o_orderkey") == C("l_orderkey"))
        .withColumn("ship_speed",
                    F.when(C("l_shipdate")
                           > C("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                           "SLOW").otherwise("FAST"))
        .groupBy("ship_speed")
        .agg(F.sum(F.when(C("high"), 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~C("high"), 1).otherwise(0)).alias("low_line_count"))
    )


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def canon(df: DataFrame) -> list:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    import pyarrow.parquet as pq
    spark = get_spark(app_name="probe-narrow-exchange")
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    apply_scaled_shuffle(spark, n_fact)

    pairs = {
        "q3": (q3_shipping_priority, q3_fold),
        "q5": (q5_local_supplier_volume, q5_fold),
        "q7": (q7_volume_shipping, q7_fold),
        "q8": (q8_market_share, q8_fold),
        "q9": (q9_product_profit, q9_pre),
        "q10": (q10_returned_items, q10_fold),
        "q12": (q12_priority_by_delay, q12_narrow),
    }
    only = [s for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if s]
    if only:
        pairs = {k: v for k, v in pairs.items() if k in only}
    for name, (cur, var) in pairs.items():
        assert canon(cur(spark, SF_DIR)) == canon(var(spark, SF_DIR)), name
    variants = {}
    for name, (cur, var) in pairs.items():
        variants[f"{name}_current"] = (lambda f=cur: f(spark, SF_DIR))
        variants[f"{name}_narrow"] = (lambda f=var: f(spark, SF_DIR))

    times: dict[str, list[float]] = {n: [] for n in variants}
    for name, build in variants.items():   # warm-up pass
        timed(build())
    for _ in range(PASSES):
        for name, build in variants.items():
            times[name].append(round(timed(build()), 2))
    print(json.dumps({
        "metric": "narrow_exchange_ab", "tier": TIER, "n_fact": n_fact,
        "passes": PASSES, "runs": times,
        "min": {n: min(v) for n, v in times.items()},
        "results_identical": True,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
