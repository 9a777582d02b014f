#!/usr/bin/env python
"""Probe: growth curves for the round-4-new op families.

Questions a 100 TB design review asks of these shapes:

- ext_quality_classifier: claimed MAP-ONLY (zero exchanges) — wall must be
  linear in corpus rows with no shuffle-bound term.
- ext_shard_assign: one exchange (the writer's repartition-by-shard) +
  within-shard sort — wall should track the shuffle volume linearly.
- ext_bpe_encode: corpus touched once (word-frequency build); encode work
  is vocabulary-bound — wall vs corpus growth should be sub-linear once
  the vocab saturates (content-identical replication regime).
- ext_knn_graph / ext_semdedup: BLOCKED pair joins are quadratic WITHIN a
  block. With a fixed number of blocks (10 labels / k=8 clusters) and a
  growing corpus, per-block size grows linearly → pair work grows
  quadratically. That is the honest scaling law; the mitigation at scale
  is raising the block count with the corpus (more k-means cells, finer
  blocks) to keep block size bounded — probed directly: semdedup at x32
  with k=8 vs k=64.

Docs corpora reuse probe_lm_text's replicated sf0.1 documents (x10/x40 =
50k/200k docs). Embedding corpora replicate the 500-vector fixture with
+-5% hash-noise (labels preserved) at x8/x32 = 4k/16k vectors.

Run:  python scripts/probe_r4_ops.py   (results recorded in BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.similarity import semdedup
from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from agentic_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
DOC_SCRATCH = os.path.join(REPO, ".tmp", "probe_lm_text")   # shared corpora
EMB_SCRATCH = os.path.join(REPO, ".tmp", "probe_r4_emb")
C = F.col


def exploded_docs_dir(spark, mult: int) -> str:
    """Same replication (and scratch) as probe_lm_text_scale: content-
    identical docs with re-keyed ids — diversity fixed on purpose."""
    out = os.path.join(DOC_SCRATCH, f"x{mult}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    docs = load_table(spark, BASE, "documents")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = spark.range(mult).select(C("id").alias("rep"))
    (docs.crossJoin(F.broadcast(rep))
         .select((C("doc_id") + C("rep") * n).alias("doc_id"),
                 "text", "lang", "source", "n_chars")
         .repartition(32)
         .write.mode("overwrite")
         .parquet(os.path.join(out, "documents.parquet")))
    open(done, "w").close()
    return out


def exploded_emb_dir(spark, mult: int) -> str:
    """Fixture embeddings replicated with +-5% per-copy hash perturbation,
    LABELS PRESERVED (the block key must survive so blocked joins block)."""
    out = os.path.join(EMB_SCRATCH, f"x{mult}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    emb = load_table(spark, BASE, "embeddings")
    n = emb.count()
    perturbed = F.transform(
        C("embedding").cast("array<double>"),
        lambda x, i: x * (1.0 + F.when(C("rep") == 0, 0.0).otherwise(
            (F.pmod(F.xxhash64(C("vec_id"), C("rep"), i), F.lit(1000))
             .cast("double") / 1000.0 - 0.5) * 0.1)))
    (emb.crossJoin(F.broadcast(spark.range(mult).withColumnRenamed("id", "rep")))
        .select((C("vec_id") + C("rep") * n).alias("vec_id"),
                perturbed.cast("array<float>").alias("embedding"), "label")
        .repartition(32)
        .write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet")))
    open(done, "w").close()
    return out


def timed(fn, runs: int = 2):
    best, n = None, None
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="probe-r4")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- docs-shaped ops ---------------------------------------------
    for op_id in ("ext_quality_classifier", "ext_shard_assign",
                  "ext_bpe_encode"):
        rows = {}
        for mult in (10, 40):
            d = exploded_docs_dir(spark, mult)
            wall, n = timed(lambda: OPS[op_id].fn(spark, d).count())
            rows[f"x{mult}"] = {"wall_s": wall, "out_rows": n}
        rows["growth_x4_data"] = round(
            rows["x40"]["wall_s"] / max(rows["x10"]["wall_s"], 1e-9), 2)
        out[op_id] = rows

    # --- embedding-blocked pair ops ----------------------------------
    for op_id in ("ext_knn_graph",):
        rows = {}
        for mult in (8, 32):
            d = exploded_emb_dir(spark, mult)
            wall, n = timed(lambda: OPS[op_id].fn(spark, d).count())
            rows[f"x{mult}"] = {"wall_s": wall, "out_rows": n}
        rows["growth_x4_data"] = round(
            rows["x32"]["wall_s"] / max(rows["x8"]["wall_s"], 1e-9), 2)
        out[op_id] = rows

    sem = {}
    for mult, k in ((8, 8), (32, 8), (32, 64)):
        d = exploded_emb_dir(spark, mult)
        emb = load_table(spark, d, "embeddings")
        # Time the DROPPED count: a bare .count() on the output lets
        # Catalyst eliminate the left join entirely (distinct unique join
        # key → row count preserved), silently skipping the pair join —
        # the filtered count forces the real work. Includes the k-means
        # fit; runs=1 (fit dominates, stable).
        wall, n_drop = timed(
            lambda: semdedup(emb, k_clusters=k, threshold=0.35)
            .filter(~C("kept")).count(), runs=1)
        sem[f"x{mult}_k{k}"] = {"wall_s": wall, "n_dropped": n_drop}
    sem["note"] = ("fixed k=8: x4 data -> quadratic within-cluster pair "
                   "work; k=64 at x32 restores bounded cluster size")
    out["ext_semdedup"] = sem

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
