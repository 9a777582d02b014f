#!/usr/bin/env python
"""q9 profile probe (r9 verdict item 2): q9_product_profit is the flattest
growth line (4.4x at sf10, barely falling). Hypotheses:

  A. The r9 sf10 numbers were measured with the runtime bloom filter
     silently OFF — the ratchet was dead (tune() re-pinned it false on
     every load_table; fixed this round). With bloom genuinely ON, the
     part->lineitem runtime filter prunes non-widget rows BEFORE the
     orderkey shuffle (the dominant exchange), which is exactly what a
     100 TB plan wants.
  B. Aggregate-before-join on the (l_orderkey, l_suppkey) grain shrinks
     the orderkey exchange + orders probe.

Interleaved fresh-write A/B per variant x bloom setting; one session per
bloom setting (the conf affects plan compilation). Prints one JSON line.

Usage: SPARK_GRAFT_TIER=sf3 python scripts/probe_q9_variants.py
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
    cents, q9_product_profit,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf3")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def q9_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant B: partial-aggregate the part-filtered lineitem to the
    (l_orderkey, l_suppkey) grain BEFORE the orders join. The exchange on
    l_orderkey (a subset of the group key, so the aggregate and the join
    share ONE shuffle of lineitem) carries pre-combined rows; orders'
    probe sees ~1 row per (order, supplier) instead of per lineitem."""
    part = (load_table(spark, sf_dir, "part")
            .filter(C("p_name").like("%widget%"))
            .select("p_partkey", "p_retailprice"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", C("n_name").alias("nation"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    profit_c4 = (cents("l_extendedprice") * (100 - cents("l_discount"))
                 - cents("p_retailprice") * cents("l_quantity"))
    pre = (li.join(F.broadcast(part), C("p_partkey") == C("l_partkey"))
           .repartition(C("l_orderkey"))
           .groupBy("l_orderkey", "l_suppkey")
           .agg(F.sum(profit_c4).alias("profit_c4")))
    return (
        pre.join(orders.hint("shuffle_hash"),
                 C("o_orderkey") == C("l_orderkey"))
        .join(F.broadcast(supp), C("s_suppkey") == C("l_suppkey"))
        .join(F.broadcast(nation), C("s_nationkey") == C("n_nationkey"))
        .groupBy("nation",
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((F.sum("profit_c4").cast("double") / 10000.0).alias("profit"))
    )


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def session(bloom: bool) -> SparkSession:
    from agentic_data_pipeline_spark import session as sm
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        sm._BLOOM_RATCHETED = False
    spark = sm.get_spark(app_name=f"q9probe-{bloom}")
    spark.sparkContext.setLogLevel("ERROR")
    import pyarrow.parquet as pq
    n_fact = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    # Same declared row count in BOTH branches so shuffle-partition count
    # is identical and only the bloom conf differs (r10 ADVICE: the old
    # min(n_fact, 9_999_999) off-branch also lowered partitions, e.g.
    # ~99 vs ~180 at sf3, confounding the A/B). apply_scaled_shuffle may
    # ratchet bloom ON at >=10M; the explicit set below overrides it and
    # the ratchet makes later tune() calls leave the conf alone.
    apply_scaled_shuffle(spark, max(n_fact, 10_000_000))
    if not bloom:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    return spark


def main() -> None:
    out: dict = {"tier": TIER, "passes": PASSES}
    hashes = {}
    for bloom in (False, True):
        spark = session(bloom)
        variants = {"current": lambda: q9_product_profit(spark, SF_DIR),
                    "preagg": lambda: q9_preagg(spark, SF_DIR)}
        # warm-up once each, then interleave PASSES fresh-plan runs
        for name, build in variants.items():
            timed(build())
        runs: dict[str, list[float]] = {n: [] for n in variants}
        for _ in range(PASSES):
            for name, build in variants.items():
                runs[name].append(timed(build()))
        for name, build in variants.items():
            key = f"{name}_bloom{'on' if bloom else 'off'}"
            out[key] = round(min(runs[name]), 3)
            out[key + "_all"] = [round(x, 3) for x in runs[name]]
        # value parity between variants (once, on the bloom-on session)
        if bloom:
            for name, build in variants.items():
                rows = sorted(map(tuple, build().collect()))
                hashes[name] = hash(tuple(
                    (n, y, round(p, 6)) for n, y, p in rows))
    out["variants_identical"] = len(set(hashes.values())) == 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()
