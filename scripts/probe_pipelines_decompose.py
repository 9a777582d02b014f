#!/usr/bin/env python
"""Per-stage decomposition of the two biggest sf10 ops (r11, guide
§1.1) — the evidence behind their exoneration. Measured at sf10
(min-of-2 noop, quiet box):

ext_training_prep_pipeline (full 36.7 s):
  scan 0.31 → +norm regex+split+count 7.0 → +per-word md5 score fold
  26.1; the fp regex+md5 branch alone is 3.5; dedup/shard exchanges
  ~0.2. **~70% of the op is the per-word md5 fold**, which the oracle
  computes identically (list_transform(words, md5...)) — definition-
  locked; the residual 1.6-1.8× vs DuckDB is the JVM-MessageDigest/
  regex constant, not plan shape.

ext_curation_pipeline (full 24.4 s):
  scan 0.15 → quality-regex filter branch 9.2 → corpus 8-gram shingle
  explode 19.2 → +broadcast semi-probe 22.0 (branches overlap on the
  cores; full < sum). The shingle STRINGS are the oracle's comparison
  domain (join on s), so hashing them instead is not provably
  identical. At HEAD the op is ~1.0-1.1× vs its twin — at parity.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_pipelines_decompose.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.dedup import shingles_exploded
from agentic_data_pipeline_spark.operators.prep import (
    ext_curation_pipeline, ext_training_prep_pipeline,
)
from agentic_data_pipeline_spark.operators.text import quality_expr
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
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"decompose {label}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        print(label, round(best, 3))

    # --- training prep ---
    norm = F.trim(F.regexp_replace(F.lower(C("text")), "[^a-z0-9]+", " "))
    words = F.filter(F.split(norm, r"\s+"), lambda x: x != "")
    n = F.size(words).cast("bigint")
    bucket = lambda x: (F.conv(F.substring(F.md5(x), 1, 8), 16, 10)  # noqa: E731
                        .cast("bigint") % 1001)
    score = (F.aggregate(F.transform(words, bucket),
                         F.lit(0).cast("bigint"), lambda a, x: a + x)
             .cast("double") / F.nullif(n, F.lit(0))
             - F.lit(500.0)) / F.lit(500.0)
    fp = F.md5(F.encode(F.lower(F.regexp_replace(C("text"), r"\s+", " ")),
                        "utf-8"))
    t(docs.select("doc_id", "text"), "prep_1_scan")
    t(docs.select("doc_id", n.alias("nt")), "prep_2_norm_split_count")
    t(docs.select("doc_id", score.alias("s")), "prep_3_plus_md5_score_fold")
    t(docs.select("doc_id", fp.alias("fp")), "prep_4_fp_regex_md5_alone")
    t(ext_training_prep_pipeline(spark, SF_DIR), "prep_5_full")

    # --- curation ---
    t(docs.select("doc_id"), "cur_1_scan")
    t(docs.filter((C("doc_id") % 50 != 0) & (quality_expr(C("text")) >= 0.5))
      .select("doc_id", "lang", "source"), "cur_2_quality_filter")
    corpus_sh = shingles_exploded(
        docs.filter(C("doc_id") % 50 != 0), "doc_id", "text", 8)
    ev_sh = shingles_exploded(
        docs.filter(C("doc_id") % 50 == 0), "doc_id", "text", 8)
    t(corpus_sh.select("id"), "cur_3_corpus_shingles_explode")
    t(corpus_sh.join(F.broadcast(ev_sh.select("s")), "s").select(C("id")),
      "cur_4_plus_bcast_semiprobe")
    t(ext_curation_pipeline(spark, SF_DIR), "cur_5_full")


if __name__ == "__main__":
    main()
