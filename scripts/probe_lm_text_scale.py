#!/usr/bin/env python
"""Probe: growth curves for the r3-new text/LM op families (VERDICT r3 #4).

Three questions a 100 TB design review asks of these shapes:

- ext_lm_perplexity / ext_lm_score_holdout: as the CORPUS grows with fixed
  content diversity, do the corpus LM stats tables (bc/uc — distinct
  bigrams / distinct prefixes) stay fixed-size so their joins stay
  broadcast-or-bucketed, with wall growing ~linearly in corpus rows?
- ext_gopher_filters: is the rule battery really a map-only pass (linear
  wall, no shuffle-bound term)?
- ext_bpe_merges: is the corpus touched ONCE (the word-frequency build),
  with per-merge iteration cost bound by VOCABULARY size, not corpus size?
  Probed both ways: corpus growth at fixed vocab (iterations should be
  flat) and vocab growth at fixed corpus (iterations may grow).

Corpus = the sf0.1 documents table replicated with re-keyed doc_ids
(content-identical replication holds diversity fixed on purpose — that is
the 100 TB regime where stats tables saturate while rows keep growing).
Mults 10/40/200 → 50k / 200k / 1M docs (1:4:20 ratio like the other
probes). BPE vocab probe uses synthetic letter-words at controlled vocab.

Run:  python scripts/probe_lm_text_scale.py   (results in BASELINE.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.text import bpe_merges
from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded
from agentic_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".tmp", "probe_lm_text")
MULTS = (10, 40, 200)
C = F.col


def exploded_docs_dir(spark, mult: int) -> str:
    out = os.path.join(SCRATCH, f"x{mult}")
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


def time_op(spark, op_id: str, sf_dir: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    df = OPS[op_id].fn(spark, sf_dir)
    n = df.count()
    return time.perf_counter() - t0, n


def synthetic_letter_corpus(spark, n_docs: int, vocab: int, words: int = 40):
    """Docs of `words` pseudo-words drawn from a `vocab`-size space, with
    digits transliterated to letters so BPE's [^a-z]+ normalization keeps
    them distinct (hash-words like 'w123' would all collapse to 'w')."""
    word = lambda i: F.translate(  # noqa: E731
        F.concat(F.lit("w"), F.pmod(F.xxhash64(C("id") * words + i),
                                    F.lit(vocab)).cast("string")),
        "0123456789-", "abcdefghijx")
    return spark.range(n_docs).select(
        C("id").alias("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), F.lit(words - 1)),
                                 word), " ").alias("text"))


def main() -> None:
    spark = get_spark(app_name="probe-lm-text")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()

    print("== corpus-growth: ext_lm_perplexity / ext_lm_score_holdout / "
          "ext_gopher_filters (sf0.1 docs replicated; content diversity "
          "fixed, so bc/uc stats tables are constant-size by construction)")
    # Stats-table sizes at x1 content == at any mult (replication adds no
    # new bigrams): report once so the broadcast-or-bucketed claim is
    # checkable against spark.sql.autoBroadcastJoinThreshold.
    docs = load_table(spark, BASE, "documents")
    w = F.split(F.trim(F.regexp_replace(F.lower(C("text")),
                                        r"[^a-z0-9]+", " ")), r"\s+")
    toks = docs.select(w.alias("w"))
    n_vocab = toks.select(F.explode("w").alias("u")).distinct().count()
    pairs = F.expr("transform(slice(w, 1, size(w) - 1), "
                   "(x, i) -> struct(x as w1, w[i + 1] as w2))")
    n_bigrams = (toks.filter(F.size("w") > 1)
                 .select(F.explode(pairs).alias("p")).distinct().count())
    print(f"   stats tables: vocab={n_vocab:,} distinct bigrams="
          f"{n_bigrams:,} (uc/bc row counts — KBs, broadcastable)")

    prev: dict[str, float] = {}
    for mult in MULTS:
        sf_dir = exploded_docs_dir(spark, mult)
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")).count()
        line = [f"x{mult:<3d} (docs={n_docs:9,d})"]
        for op_id in ("ext_lm_perplexity", "ext_lm_score_holdout",
                      "ext_gopher_filters"):
            dt, n_out = time_op(spark, op_id, sf_dir)
            g = f" (x{dt / prev[op_id]:.2f})" if op_id in prev else ""
            line.append(f"{op_id.removeprefix('ext_')}={dt:6.2f}s{g}")
            prev[op_id] = dt
        print("  ".join(line), flush=True)

    print("== bpe: corpus growth at fixed vocab (iterations should be flat "
          "— loop state is the word-frequency table, not the corpus)")
    prev_t = None
    for mult in MULTS:
        sf_dir = exploded_docs_dir(spark, mult)
        docs_m = load_table(spark, sf_dir, "documents")
        t0 = time.perf_counter()
        rules = bpe_merges(docs_m, "text", n_merges=5)
        dt = time.perf_counter() - t0
        g = f" (x{dt / prev_t:.2f})" if prev_t else ""
        print(f"x{mult:<3d}  bpe_5_merges={dt:6.2f}s{g}  "
              f"top_rule={rules[0][1]!r}", flush=True)
        prev_t = dt

    print("== bpe: vocab growth at fixed corpus (100k docs — iteration "
          "cost tracks the vocabulary)")
    prev_t = None
    for vocab in (1_000, 10_000, 100_000):
        docs_v = synthetic_letter_corpus(spark, 100_000, vocab).persist()
        n_words = (docs_v.select(F.explode(F.split(C("text"), " "))
                                 .alias("w")).distinct().count())
        t0 = time.perf_counter()
        bpe_merges(docs_v, "text", n_merges=5)
        dt = time.perf_counter() - t0
        g = f" (x{dt / prev_t:.2f})" if prev_t else ""
        print(f"vocab~{vocab:>7,d} (distinct words={n_words:7,d})  "
              f"bpe_5_merges={dt:6.2f}s{g}", flush=True)
        prev_t = dt
        docs_v.unpersist()

    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
