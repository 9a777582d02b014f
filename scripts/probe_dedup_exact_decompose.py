#!/usr/bin/env python
"""ext_dedup_exact per-stage decomposition (r11, guide §1.1): attribute
the sf10 cost before touching anything. Result (min-of-3 noop, sf10,
600k docs): scan 0.17 s → +normalize regex (lower + '\\s+'→' ') 2.58 s
→ +md5 3.29 s → full groupBy 3.49 s. The fp exchange + aggregate add
only ~0.2 s — **74% of the query is the normalization regex**, per-row
compute both engines pay by construction (DuckDB's 1.47 s is the same
scan through RE2 instead of java.util.regex). No plan defect; nothing
to rewrite without changing what the query computes (the fingerprint
IS md5(lower(regexp_replace(text,'\\s+',' ')))). Exonerated alongside
q9/q16/q22.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_dedup_exact_decompose.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    apply_scaled_shuffle(spark, load_table(spark, SF_DIR, "lineitem").count())
    docs = load_table(spark, SF_DIR, "documents")

    def t(df, label):
        best = 9e9
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"dedup_exact stage {label}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        print(label, round(best, 3))

    norm = F.lower(F.regexp_replace(C("text"), r"\s+", " "))
    fp = F.md5(F.encode(norm, "utf-8"))
    t(docs.select("doc_id", "text"), "scan_only")
    t(docs.select("doc_id", norm.alias("n")), "plus_normalize_regex")
    t(docs.select("doc_id", fp.alias("fp")), "plus_md5")
    t(docs.groupBy(fp.alias("fp")).agg(F.min("doc_id").alias("keep_doc_id"),
                                       F.count(F.lit(1)).alias("n_copies")),
      "full_groupby")


if __name__ == "__main__":
    main()
