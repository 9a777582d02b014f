#!/usr/bin/env python
"""Corpus-norm-below-the-join probe (r11, guide §1.2 step 2 / §2.3): in
ext_similarity_topk and ext_ann_int8 the corpus-side l2_norm ran inside
the crossJoin projection, i.e. once per (vector, query) PAIR — with Q=3
broadcast queries each embedding was folded 3 extra times for the same
double. The fix projects the norm once per corpus row BELOW the join
(ext_dedup_embedding and the kNN family already do this). Same
expression subtree over the same input → bit-identical sim; asserted
row-for-row here before any timing.

Interleaved fresh-noop-write A/B, PASSES per variant, one session.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_simtopk_norm.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.similarity import (
    _trunc6, batch_topk, ext_similarity_topk,
)
from agentic_data_pipeline_spark.operators.vector_store import (
    ext_ann_int8, quantize_int8,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def simtopk_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_data_pipeline_spark.functions.vector import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(C("vec_id").isin(0, 1, 2)).select(
        C("vec_id").alias("query_id"), C("embedding").alias("qv"),
        l2_norm(C("embedding")).alias("qn"))
    sim = dot(C("embedding"), C("qv")) / (l2_norm(C("embedding")) * C("qn"))
    scored = (emb.crossJoin(F.broadcast(queries))
              .filter(C("vec_id") != C("query_id"))
              .select("query_id", C("vec_id").alias("neighbor_id"),
                      _trunc6(sim).alias("sim")))
    return batch_topk(scored, k=5)


def ann_int8_before(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agentic_data_pipeline_spark.functions.vector import dot, l2_norm

    codes = (quantize_int8(load_table(spark, sf_dir, "embeddings"))
             .select("vec_id", "q"))
    queries = codes.filter(C("vec_id").isin(0, 1, 2)).select(
        C("vec_id").alias("query_id"), C("q").alias("qq"),
        l2_norm(C("q")).alias("qn"))
    sim = dot(C("q"), C("qq")) / (l2_norm(C("q")) * C("qn"))
    scored = (codes.crossJoin(F.broadcast(queries))
              .filter(C("vec_id") != C("query_id"))
              .select("query_id", C("vec_id").alias("neighbor_id"),
                      _trunc6(sim).alias("sim")))
    return batch_topk(scored, k=5)


VARIANTS = [
    ("simtopk", simtopk_before, ext_similarity_topk),
    ("ann_int8", ann_int8_before, ext_ann_int8),
]


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    out: dict = {"tier": TIER, "passes": PASSES}
    for name, before, after in VARIANTS:
        a_rows = sorted(map(tuple, before(spark, SF_DIR).collect()))
        b_rows = sorted(map(tuple, after(spark, SF_DIR).collect()))
        assert a_rows == b_rows, f"{name}: variant rows differ"
        times: dict = {"before": [], "after": []}
        for p in range(PASSES):
            for label, fn in (("before", before), ("after", after)):
                spark.sparkContext.setJobDescription(
                    f"probe {name} {label} pass {p}")
                times[label].append(round(noop(fn(spark, SF_DIR)), 3))
        out[name] = {k: {"times": v, "min": min(v)} for k, v in times.items()}
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
