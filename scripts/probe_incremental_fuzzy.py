#!/usr/bin/env python
"""Growth probe for incremental fuzzy-dedup admission: hold the incoming
batch FIXED while the existing corpus grows 1x/4x/16x, and measure the
per-batch admission time. The claim under test (ext_dedup_incremental_
fuzzy docstring): per-batch cost is proportional to the batch + the band
join against the persisted corpus index — NOT to re-hashing the corpus.

Here the corpus side is re-hashed each run (the op recomputes bands
because the driver contract is a pure function of the lake); production
persists the corpus bands/sets, so the probe reports BOTH the end-to-end
time and the batch-side-only time (corpus bands/sets checkpointed first,
timed separately) — the latter is the steady-state per-batch cost.

Run: python scripts/probe_incremental_fuzzy.py   (results -> BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

C = F.col


def main() -> None:
    from agentic_data_pipeline_spark.operators.dedup import (
        _md5_bands_and_sets, jaccard,
    )
    from agentic_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="probe-inc-fuzzy")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    batch = docs.filter(C("doc_id") >= 4500).localCheckpoint()  # 500 docs

    for mult in (1, 4, 16):
        corpus = docs.filter(C("doc_id") < 4500)
        if mult > 1:  # replicate with disjoint ids; same text distribution
            corpus = corpus.withColumn(
                "__r", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
            ).select((C("doc_id") + C("__r") * 1_000_000).alias("doc_id"),
                     "text")
        t0 = time.perf_counter()
        eb, es = _md5_bands_and_sets(corpus, "doc_id", "text")
        eb, es = eb.localCheckpoint(), es.localCheckpoint()
        t_index = time.perf_counter() - t0

        t0 = time.perf_counter()
        ib, iset = _md5_bands_and_sets(batch, "doc_id", "text")
        cand = (ib.select(C("id").alias("inc_id"), "band", "bh")
                .join(eb.select(C("id").alias("ex_id"), "band", "bh"),
                      ["band", "bh"])
                .dropDuplicates(["inc_id", "ex_id"]))
        pairs = (cand
                 .join(iset.select(C("id").alias("inc_id"),
                                   C("sh").alias("a_sh")), "inc_id")
                 .join(es.select(C("id").alias("ex_id"),
                                 C("sh").alias("b_sh")), "ex_id"))
        j = jaccard(C("a_sh"), C("b_sh"))
        n_rejected = (pairs.filter(j >= 0.5)
                      .select("inc_id").distinct().count())
        t_batch = time.perf_counter() - t0
        n_corpus = corpus.count()
        print(f"corpus {n_corpus:7d} docs: index(once) {t_index:6.2f} s   "
              f"per-batch {t_batch:5.2f} s   rejected {n_rejected}/500")


if __name__ == "__main__":
    main()
