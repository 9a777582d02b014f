#!/usr/bin/env python
"""q5/q8 join-order probe (r11): at sf10 these are the two worst TPC-H
lines (q5 12.4x, q8 7.2x vs the twin at the min-merged floor). Shared
plan flaw hypothesis: both shuffle the FULL 60M-row lineitem against
only-date-filtered orders, applying every broadcastable dim reduction
AFTER the orderkey exchange —

  q5: the ASIA-customer cut (~5x on orders) rides behind the shuffle;
  q8: the p_type cut (~6x on lineitem) AND the ASIA cut on orders both
      ride behind it.

Reordered variants apply every broadcast dim join/filter on EACH side
BEFORE the orderkey exchange: map-side broadcast joins shrink exchange
bytes at any scale (exactly what a 100 TB plan wants — the exchange is
the scale bottleneck, the broadcasts are free), and the runtime bloom
from the pre-reduced orders side prunes the lineitem scan harder.

Interleaved fresh-noop-write A/B, PASSES per variant, one session (same
conf both variants — join ORDER is the only difference). Results
hash-checked identical against the shipped plan first.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_q58_reorder.py
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
    _revenue, q5_local_supplier_volume, q7_volume_shipping,
)
from agentic_data_pipeline_spark.operators.tpch_full import cents, q8_market_share
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def q5_reordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = (load_table(spark, sf_dir, "region")
              .filter(C("r_name") == "ASIA").select("r_regionkey"))
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), C("n_regionkey") == C("r_regionkey")
    ).select("n_nationkey", "n_name")
    # ASIA customers, n_name attached — broadcast INTO orders pre-shuffle.
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(F.broadcast(asia_nations),
                  C("c_nationkey") == C("n_nationkey"))
            .select("c_custkey", "c_nationkey", "n_name"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey")
              .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
              .select("o_orderkey", "c_nationkey", "n_name"))
    supplier = (load_table(spark, sf_dir, "supplier")
                .select("s_suppkey", "s_nationkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .join(F.broadcast(supplier),
              (C("l_suppkey") == C("s_suppkey"))
              & (C("c_nationkey") == C("s_nationkey")))
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
    )


def q8_reordered(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    supp_nation = nation.select(C("n_nationkey").alias("sn_nkey"),
                                C("n_name").alias("supp_nation"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey", "o_orderdate")
              .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
              .select("o_orderkey", "o_orderdate"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount")
          .join(F.broadcast(part), C("l_partkey") == C("p_partkey"))
          .join(F.broadcast(supp), C("l_suppkey") == C("s_suppkey"))
          .join(F.broadcast(supp_nation), C("s_nationkey") == C("sn_nkey"))
          .select("l_orderkey", "l_extendedprice", "l_discount",
                  "supp_nation"))
    rev_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    nation_c = F.when(C("supp_nation") == "NATION_1", rev_c).otherwise(F.lit(0))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((F.sum(nation_c).cast("double")
              / F.sum(rev_c).cast("double")).alias("mkt_share"))
    )


def q7_reordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both nation roles are 2-of-25 cuts: supp⋈n1 into lineitem and
    cust⋈n2 into orders BEFORE the orderkey exchange shrink both sides
    ~12x; only the disjunctive pair filter stays post-join."""
    nation = load_table(spark, sf_dir, "nation").filter(
        C("n_name").isin("NATION_1", "NATION_2"))
    n1 = nation.select(C("n_nationkey").alias("s_nkey"),
                       C("n_name").alias("supp_nation"))
    n2 = nation.select(C("n_nationkey").alias("c_nkey"),
                       C("n_name").alias("cust_nation"))
    supp = (load_table(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n1), C("s_nationkey") == C("s_nkey"))
            .select("s_suppkey", "supp_nation"))
    cust = (load_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey")
            .join(F.broadcast(n2), C("c_nationkey") == C("c_nkey"))
            .select("c_custkey", "cust_nation"))
    orders = (load_table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_custkey")
              .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
              .select("o_orderkey", "cust_nation"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((C("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                  & (C("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                  "l_shipdate")
          .join(F.broadcast(supp), C("l_suppkey") == C("s_suppkey"))
          .select("l_orderkey", "l_extendedprice", "l_discount",
                  "l_shipdate", "supp_nation"))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .filter(((C("supp_nation") == "NATION_1") & (C("cust_nation") == "NATION_2"))
                | ((C("supp_nation") == "NATION_2") & (C("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(_revenue().alias("revenue"))
    )


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def canon(df: DataFrame) -> list:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    import pyarrow.parquet as pq
    spark = get_spark(app_name="probe-q58")
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    apply_scaled_shuffle(spark, n_fact)

    variants = {
        "q5_current": lambda: q5_local_supplier_volume(spark, SF_DIR),
        "q5_reorder": lambda: q5_reordered(spark, SF_DIR),
        "q8_current": lambda: q8_market_share(spark, SF_DIR),
        "q8_reorder": lambda: q8_reordered(spark, SF_DIR),
        "q7_current": lambda: q7_volume_shipping(spark, SF_DIR),
        "q7_reorder": lambda: q7_reordered(spark, SF_DIR),
    }
    assert canon(variants["q5_current"]()) == canon(variants["q5_reorder"]())
    assert canon(variants["q8_current"]()) == canon(variants["q8_reorder"]())
    assert canon(variants["q7_current"]()) == canon(variants["q7_reorder"]())

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(PASSES):
        for name, build in variants.items():
            times[name].append(round(timed(build()), 2))
    print(json.dumps({
        "metric": "q58_reorder_ab", "tier": TIER, "n_fact": n_fact,
        "passes": PASSES, "runs": times,
        "min": {n: min(v) for n, v in times.items()},
        "results_identical": True,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
