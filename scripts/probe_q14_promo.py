#!/usr/bin/env python
"""q14 promo-flag broadcast probe (r11, guide §3.1): the part join in
q14 exists only to derive the is-PROMO boolean, yet the build side
shipped every (p_partkey, p_type) pair — 2 M entries at sf10, and the
broadcast build dominated the query (decomposition: scan+agg 0.60 s,
+full-part join 1.66 s). l_partkey is a foreign key into part (TPC-H
referential integrity; the scaled lakes shift l_partkey and p_partkey
by the same per-replica offset, so it holds at every tier), so the
inner join can never drop or duplicate a lineitem row — flagging by
LEFT-join match against only the PROMO partkeys (~1/6 of part, no
string column) is row-identical and shrinks the broadcast 6× at any
scale. Equality asserted here before timing; oracle stays the inner
join.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_q14_promo.py
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
    _revenue, q14_promo_revenue,
)
from agentic_data_pipeline_spark.operators.tpch_full import cents
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def q14_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r11 shape: full part dim broadcast, inner join."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((C("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                  & (C("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
          .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate"))
    rev_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    promo_c = F.when(C("p_type") == "PROMO", rev_c).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), C("l_partkey") == C("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg((F.sum(promo_c).cast("double") * 100.0
              / F.sum(rev_c).cast("double")).alias("promo_pct"),
             _revenue().alias("revenue")))


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    # FK preflight (r11 verdict item 10): the rewrite's row-identity rests
    # on l_partkey→part referential integrity. Fail loudly HERE, at
    # load-probe time, if the lake ever violates it (the query path stays
    # assumption-free; tests/test_lake_robustness.py pins the driver tiers).
    orphans = (load_table(spark, SF_DIR, "lineitem").select("l_partkey")
               .join(load_table(spark, SF_DIR, "part").select("p_partkey"),
                     C("l_partkey") == C("p_partkey"), "left_anti").count())
    assert orphans == 0, (
        f"{orphans} lineitem rows violate the l_partkey→part FK — "
        "q14's left-join-match flag is not equivalent here; revert it")

    a = sorted(map(tuple, q14_before(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q14_promo_revenue(spark, SF_DIR).collect()))
    assert a == b, "q14 variants differ"

    times: dict = {"before": [], "after": []}
    for p in range(PASSES):
        for label, fn in (("before", q14_before), ("after", q14_promo_revenue)):
            spark.sparkContext.setJobDescription(f"probe q14 {label} pass {p}")
            times[label].append(round(noop(fn(spark, SF_DIR)), 3))
    out = {"tier": TIER,
           **{k: {"times": v, "min": min(v)} for k, v in times.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
