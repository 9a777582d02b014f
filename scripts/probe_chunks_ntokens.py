#!/usr/bin/env python
"""ext_docs_to_chunks n_tokens-arithmetic probe (r11) — a MEASURED DEAD
END, committed so the negative result is checkable. Hypothesis: the
per-chunk `size(split(chunk, ' '))` re-split is redundant (every chunk
but the last holds CHUNK_SIZE tokens; the DuckDB twin already counts
via list_slice length), so carrying `size(toks)` through the explode
and computing `least(CHUNK_SIZE, nt - chunk_id*CHUNK_SIZE)` should be
cheaper. Measured at sf10 (min-of-3 interleaved, rows+schema asserted
identical): before 18.6 s, "optimized" 29.6 s — **60% SLOWER**.
Carrying the extra pre-explode column through Generate defeats the
fused project-explode-project pipeline (the split feeding the chunk
array is no longer collapsed with the size() consumer). The shipped
form keeps the re-split; guide §1.1's "the ideal plan is usually
slower at first because of some gotcha" in the flesh.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_chunks_ntokens.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.prep import (
    CHUNK_SIZE, chunk_tokens, ext_docs_to_chunks,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def chunks_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rejected variant: n_tokens computed arithmetically."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(C("text")), r"\s+")
    chunks = chunk_tokens(toks, CHUNK_SIZE)
    exploded = docs.select(
        "doc_id", F.size(toks).alias("__nt"),
        F.posexplode(chunks).alias("chunk_id", "chunk"))
    return exploded.select(
        "doc_id",
        C("chunk_id").cast("int").alias("chunk_id"),
        F.least(F.lit(CHUNK_SIZE),
                C("__nt") - C("chunk_id") * CHUNK_SIZE).alias("n_tokens"),
        F.md5(F.encode(C("chunk"), "utf-8")).alias("chunk_md5"),
    )


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    apply_scaled_shuffle(spark, load_table(spark, SF_DIR, "lineitem").count())

    a = ext_docs_to_chunks(spark, SF_DIR)
    b = chunks_arithmetic(spark, SF_DIR)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0

    times: dict = {"shipped": [], "arithmetic": []}
    for p in range(PASSES):
        for label, fn in (("shipped", ext_docs_to_chunks),
                          ("arithmetic", chunks_arithmetic)):
            spark.sparkContext.setJobDescription(f"probe d2c {label} {p}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[label].append(round(time.monotonic() - t0, 3))
    print(times, {k: min(v) for k, v in times.items()})


if __name__ == "__main__":
    main()
