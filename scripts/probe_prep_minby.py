#!/usr/bin/env python
"""ext_training_prep_pipeline dedup-stage probe (r11): the r4 shape
deduped with row_number() over a fingerprint window, which shuffles every
surviving row WHOLE — document text included — and sorts each group. The
min_by-aggregate shape keeps the same survivor (min doc_id) but map-side
combines and carries only (fp, doc_id, n_tokens) through the exchange.

Interleaved fresh-noop A/B, results hash-checked identical first.
Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_prep_minby.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.prep import ext_training_prep_pipeline
from agentic_data_pipeline_spark.operators.sampling import hash_bucket
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def pipeline_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r11 shape: full-row fingerprint window dedup."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(C("text")), "[^a-z0-9]+", " "))
    words = F.filter(F.split(norm, r"\s+"), lambda t: t != "")
    bucket = lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)  # noqa: E731
                        .cast("bigint") % 1001)
    n = F.size(words).cast("bigint")
    score = (F.aggregate(F.transform(words, bucket),
                         F.lit(0).cast("bigint"), lambda a, x: a + x)
             .cast("double") / F.nullif(n, F.lit(0)) - F.lit(500.0)) \
        / F.lit(500.0)
    scored = docs.select("doc_id", "text", n.alias("n_tokens"),
                         score.alias("score"))
    kept = scored.filter((C("score") >= -0.04) & (C("n_tokens") >= 10))
    fp = F.md5(F.encode(F.lower(F.regexp_replace(C("text"), r"\s+", " ")),
                        "utf-8"))
    w = Window.partitionBy(fp).orderBy("doc_id")
    dedup = (kept.withColumn("__rn", F.row_number().over(w))
             .filter(C("__rn") == 1))
    return (dedup.groupBy(hash_bucket(C("doc_id"), 16).alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.min("doc_id").alias("min_doc")))


def timed(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def canon(df: DataFrame) -> list:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    import pyarrow.parquet as pq
    spark = get_spark(app_name="probe-prep-minby")
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = pq.ParquetFile(
        os.path.join(SF_DIR, "lineitem.parquet")).metadata.num_rows
    apply_scaled_shuffle(spark, n_fact)

    variants = {
        "window": lambda: pipeline_window(spark, SF_DIR),
        "min_by": lambda: ext_training_prep_pipeline(spark, SF_DIR),
    }
    assert canon(variants["window"]()) == canon(variants["min_by"]())

    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(PASSES):
        for name, build in variants.items():
            times[name].append(round(timed(build()), 2))
    print(json.dumps({
        "metric": "prep_minby_ab", "tier": TIER, "passes": PASSES,
        "runs": times, "min": {n: min(v) for n, v in times.items()},
        "results_identical": True,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
