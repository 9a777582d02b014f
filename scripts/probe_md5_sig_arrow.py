#!/usr/bin/env python
"""Arrow md5-minhash signature A/B (r12 session 2, guide §4.2).

The sf10 decomposition of ext_dedup_minhash_md5 (this round, after the
vectorized shingle generator): checkpointed stream scan 0.6 s,
collect_set 3.8 s, the 32-md5 signature aggregate **36.6 s** — 832M
JVM md5+conv calls (26M shingle rows × 32). The Arrow form
(_md5_sig_batches) hashes each DISTINCT shingle once per task
(dictionary_encode + per-task cache) and emits per-batch per-id
partial minima; the final groupBy.min merges them — bit-identical
(integers, min associative), pinned by tests/test_md5_sig_arrow.py.

Equality first (full signature checksum at this tier), then
interleaved fresh noop-write timing of the signature stage and the
oracle-visible consumers.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_md5_sig_arrow.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators import dedup as D
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))
SUBJECTS = [s for s in os.environ.get(
    "SPARK_GRAFT_SUBJECTS",
    "ext_dedup_minhash_md5,ext_dedup_incremental_fuzzy").split(",") if s]


def arrow_sig(sh):
    return (sh.mapInArrow(D._md5_sig_batches, D._SIG_ARROW_SCHEMA)
            .groupBy("id").agg(*[
                F.min(f"h{i}").alias(f"h{i}")
                for i in range(D.NUM_HASHES)]))


def bands_sets_jvm(df, id_col, text_col):
    """_md5_bands_and_sets with the JVM signature — the exact r12a shape."""
    sh = D._ensure_parallelism(
        D.shingles_exploded(df, id_col, text_col, 3)).localCheckpoint()
    sig = D._md5_sig_jvm(sh)
    bands = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[
                    C(f"h{b * D.ROWS_PER_BAND + r}").cast("string")
                    for r in range(D.ROWS_PER_BAND)
                ])).alias("bh"),
            )
            for b in range(D.BANDS)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    sets = sh.groupBy("id").agg(F.collect_set("s").alias("sh"))
    return bands, sets


def main() -> None:
    from agentic_data_pipeline_spark.registry import OPS, _ensure_loaded

    _ensure_loaded()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    apply_scaled_shuffle(spark, load_table(spark, SF_DIR, "lineitem").count())
    docs = load_table(spark, SF_DIR, "documents")

    out: dict = {"tier": TIER, "passes": PASSES}

    # ---- equality: full signature set, bit-for-bit, this tier
    sh = D.shingles_exploded(docs, "doc_id", "text", 3)
    hx = F.xxhash64(F.concat_ws(
        "|", C("id").cast("string"),
        *[C(f"h{i}").cast("string") for i in range(D.NUM_HASHES)]))

    def checksum(df):
        row = (df.select(hx.alias("h"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.bit_xor("h").alias("x")).collect()[0])
        return (row["n"], row["x"])

    a = checksum(arrow_sig(sh))
    j = checksum(D._md5_sig_jvm(sh))
    assert a == j, (a, j)
    out["signatures"] = a[0]
    print(f"signatures: {a[0]} docs, checksums match", flush=True)

    # ---- interleaved timing
    def t(builders, label):
        res = {k: 9e9 for k in builders}
        for _ in range(PASSES):
            for k, b in builders.items():
                spark.sparkContext.setJobDescription(f"{label} {k}")
                t0 = time.monotonic()
                try:
                    b().write.format("noop").mode("overwrite").save()
                    res[k] = min(res[k], time.monotonic() - t0)
                except Exception as e:  # noqa: BLE001 — record, don't
                    # hide; keep timing the OTHER variant (the sf10 run
                    # of 2026-08-18 hit a transient OOM on the JVM
                    # variant here and the old `break` skipped the
                    # arrow arm — its 211.3 s figure was re-measured
                    # standalone on a fresh session, where the JVM
                    # variant completed at 334.0 s)
                    res[k] = f"ERR {str(e).splitlines()[0][:160]}"
        out[label] = {k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}
        print(label, out[label], flush=True)

    t({"jvm": lambda: D._md5_sig_jvm(
          D._ensure_parallelism(
              D.shingles_exploded(docs, "doc_id", "text", 3))
          .localCheckpoint()),
       "arrow": lambda: arrow_sig(
          D._ensure_parallelism(
              D.shingles_exploded(docs, "doc_id", "text", 3))
          .localCheckpoint())}, "sig_stage")

    import agentic_data_pipeline_spark.operators.dedup as DD

    orig = DD._md5_bands_and_sets
    for name in SUBJECTS:
        def jvm_build(name=name):
            DD._md5_bands_and_sets = bands_sets_jvm
            try:
                return OPS[name].fn(spark, SF_DIR)
            finally:
                DD._md5_bands_and_sets = orig

        # row-identity collect at the oracle tier; at sf10 the changed
        # stage's full checksum above is the equality evidence (the
        # downstream band/verify code is untouched) and the r12a JVM
        # variant is minutes-long there
        if TIER == "sf0.1":
            ja = sorted(map(tuple, jvm_build().collect()))
            ar = sorted(map(tuple, OPS[name].fn(spark, SF_DIR).collect()))
            assert ja == ar, f"{name}: rows diverge"
            print(f"{name}: {len(ar)} rows identical", flush=True)
        t({"jvm": jvm_build, "arrow": lambda name=name:
           OPS[name].fn(spark, SF_DIR)}, name)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
