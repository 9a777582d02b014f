#!/usr/bin/env python
"""Arrow quality-branch A/B for ext_curation_pipeline (r12 session 2,
guide §4.2 — the prep-Arrow mechanism applied to the last Catalyst
regex branch in the curation pipeline).

The post-vectorization sf10 decomposition put the quality branch at
1.36 s of the op's 5.5 s (quality filter 0.95 + fp md5/n_tokens ~0.4):
java.util.regex \\s+ count + translate + the \\s+→' ' collapse + JVM
md5. The Arrow form computes the identical survivor set in one
mapInArrow pass (explicit java-\\s character classes in RE2, the same
left-to-right IEEE double tree, md5 via hashlib for survivors only) —
see prep._curation_q_batches for the step-by-step equivalence and
tests/test_curation_q_arrow.py for the pinned corners (incl. Spark
least()'s null-skipping making null-text docs 0.7-score survivors).

Equality first (full survivor set, bit-for-bit, at THIS tier), then
interleaved fresh noop-write timing, min-of-PASSES.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_curation_q_arrow.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators import prep as P
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))

_SCHEMA = ("doc_id bigint, lang string, source string, "
           "fp string, n_tokens bigint")


def q_arrow(docs):
    return (docs.filter(C("doc_id") % 50 != 0)
            .select("doc_id", "lang", "source", "text")
            .mapInArrow(P._curation_q_batches, _SCHEMA))


def build_full(spark, jvm: bool):
    """ext_curation_pipeline with the chosen quality branch. The op body
    is small enough to re-compose here from its own public pieces for
    the before-variant (matches the shipped pre-change plan exactly)."""
    from agentic_data_pipeline_spark.operators.dedup import shingles_exploded
    from agentic_data_pipeline_spark.registry import OPS

    if not jvm:
        return OPS["ext_curation_pipeline"].fn(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    q = P._curation_q_jvm(docs)
    ev_sh = shingles_exploded(
        docs.filter(C("doc_id") % 50 == 0), "doc_id", "text", 8)
    corpus_sh = shingles_exploded(
        docs.filter(C("doc_id") % 50 != 0), "doc_id", "text", 8)
    contam = (corpus_sh.join(F.broadcast(ev_sh.select("s")), "s")
              .select(C("id").alias("doc_id")))
    clean = q.join(contam, "doc_id", "left_anti")
    surv = (clean.groupBy("fp")
            .agg(F.min_by(F.struct("lang", "source", "n_tokens"),
                          C("doc_id")).alias("s")))
    return (surv.groupBy(C("s.lang").alias("lang"),
                         C("s.source").alias("source"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_tokens").alias("total_tokens")))


def main() -> None:
    from agentic_data_pipeline_spark.registry import _ensure_loaded

    _ensure_loaded()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    apply_scaled_shuffle(spark, load_table(spark, SF_DIR, "lineitem").count())
    docs = load_table(spark, SF_DIR, "documents")

    out: dict = {"tier": TIER, "passes": PASSES}

    # ---- equality: full survivor set, bit-for-bit, this tier
    h = F.xxhash64(F.concat_ws("|", C("doc_id").cast("string"), C("lang"),
                               C("source"), C("fp"),
                               C("n_tokens").cast("string")))
    def checksum(df):
        row = (df.select(h.alias("h"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.bit_xor("h").alias("x")).collect()[0])
        return (row["n"], row["x"])

    a = checksum(q_arrow(docs))
    j = checksum(P._curation_q_jvm(docs))
    assert a == j, (a, j)
    out["survivors"] = a[0]
    print(f"quality branch: {a[0]} survivors, checksums match", flush=True)

    fa = sorted(map(tuple, build_full(spark, jvm=False).collect()))
    fj = sorted(map(tuple, build_full(spark, jvm=True).collect()))
    assert fa == fj
    print(f"ext_curation_pipeline: {len(fa)} rows identical", flush=True)

    # ---- interleaved timing
    def t(builders, label):
        res = {k: 9e9 for k in builders}
        for _ in range(PASSES):
            for k, b in builders.items():
                spark.sparkContext.setJobDescription(f"{label} {k}")
                t0 = time.monotonic()
                b().write.format("noop").mode("overwrite").save()
                res[k] = min(res[k], time.monotonic() - t0)
        out[label] = {k: round(v, 3) for k, v in res.items()}
        print(label, out[label], flush=True)

    t({"jvm": lambda: P._curation_q_jvm(docs),
       "arrow": lambda: q_arrow(docs)}, "quality_branch")
    t({"jvm": lambda: build_full(spark, jvm=True),
       "arrow": lambda: build_full(spark, jvm=False)},
      "ext_curation_pipeline")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
