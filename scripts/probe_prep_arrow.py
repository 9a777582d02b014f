#!/usr/bin/env python
"""Arrow-native probe for the text family's JVM constant (r11 verdict
item 1, guide §4.2/§4.3): ext_training_prep_pipeline's per-stage
decomposition says ~70% of its sf10 wall is the per-word md5 score fold
(conv(substring(md5(w),1,8),16,10) % 1001 summed over words) plus the
normalize regexes. The r11 round asserted — without measuring — that an
Arrow path would lose to the fused Catalyst pipeline at these row sizes.
This probe settles it.

The Arrow variant (mapInArrow over (doc_id, text) ONLY — guide §4.2
column-pruning rule) computes the identical fold:

- normalize: utf8_lower → RE2 replace '[^a-z0-9]+'→' ' → trim → split.
  RE2 semantics == the oracle's own regexp_replace(…,'g') (DuckDB is
  RE2), and the fixture corpus is pure printable ASCII (asserted below),
  so Java/RE2/Python \\s and lower() agree by construction.
- md5 bucket per DISTINCT word per batch (pc.dictionary_encode), not per
  token: md5 is a pure function, so hashing each distinct word once and
  broadcasting through the dictionary indices is value-identical — and
  on any Zipfian corpus the dictionary is tiny relative to the token
  stream (this is per-batch memoization inside one execution, NOT
  cross-run result caching; every invocation recomputes from parquet).
- score = (sum_bigint.as_double / n - 500.0) / 500.0 in the same
  left-to-right IEEE order as the Catalyst expression → bit-identical.
- fp = md5(lower(regexp_replace(text,'\\s+',' '))) for survivors only.

Bit-identity is ASSERTED row-for-row on the full kept set (doc_id,
n_tokens, fp) and on the final 16-row shard output before any timing.

Interleaved fresh-noop-write A/B, PASSES per variant, one session.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_prep_arrow.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators.prep import (
    ext_training_prep_pipeline,
)
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


def _kept_batches(it):
    """mapInArrow body: (doc_id, text) batches → (doc_id, n_tokens, fp)
    batches for rows passing the quality filter. See module docstring for
    the value-identity argument per step."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    bucket_cache: dict[str, int] = {}

    def bucket(w: str) -> int:
        b = bucket_cache.get(w)
        if b is None:
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 1001
            bucket_cache[w] = b
        return b

    out_schema = pa.schema([
        pa.field("doc_id", pa.int64()),
        pa.field("n_tokens", pa.int64()),
        pa.field("fp", pa.string()),
    ])
    for batch in it:
        doc_id = batch.column("doc_id")
        text = batch.column("text")
        if text.null_count:
            # null text: Spark's size(split(null)) is null → row dropped
            # by the filter; treat as empty so n=0 drops it here too.
            text = pc.fill_null(text, "")
        low = pc.utf8_lower(text)
        norm = pc.replace_substring_regex(
            low, pattern="[^a-z0-9]+", replacement=" ")
        trimmed = pc.utf8_trim(norm, " ")
        # After the replace the string is [a-z0-9 ]* with single spaces
        # (the + collapses runs), so a plain single-space split IS the
        # \s+ split of the JVM form.
        words = pc.split_pattern(trimmed, " ")
        lengths = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words)
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dwords = enc.dictionary.to_pylist()
        dbuck = np.fromiter((bucket(w) for w in dwords), dtype=np.int64,
                            count=len(dwords))
        tok = dbuck[idx] if len(idx) else np.zeros(0, dtype=np.int64)
        cs = np.concatenate(([0], np.cumsum(tok)))
        ends = np.cumsum(lengths)
        starts = ends - lengths
        sums = cs[ends] - cs[starts]
        n = lengths.copy()
        # Empty-after-normalize docs: split('') yields [''] (length 1);
        # the JVM filter(w != '') makes n 0 there. Runs of spaces cannot
        # occur (see above), so '' tokens only arise from whole-empty docs.
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        n[empty] = 0
        sums[empty] = 0
        with np.errstate(divide="ignore", invalid="ignore"):
            score = (sums.astype(np.float64) / n - 500.0) / 500.0
        keep = np.nonzero((score >= -0.04) & (n >= 10))[0]
        if not len(keep):
            continue
        take = pa.array(keep)
        ktext = text.take(take)
        collapsed = pc.replace_substring_regex(
            ktext, pattern=r"\s+", replacement=" ")
        lowered = pc.utf8_lower(collapsed)
        fps = [hashlib.md5(s.encode()).hexdigest()
               for s in lowered.to_pylist()]
        yield pa.RecordBatch.from_arrays(
            [doc_id.take(take).cast(pa.int64()),
             pa.array(n[keep], type=pa.int64()),
             pa.array(fps, type=pa.string())],
            schema=out_schema)


def kept_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _kept_batches, "doc_id bigint, n_tokens bigint, fp string")


def kept_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shipped Catalyst scored→kept subtree, projected to the same
    (doc_id, n_tokens, fp) the Arrow variant emits."""
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
    fp = F.md5(F.encode(F.lower(F.regexp_replace(C("text"), r"\s+", " ")),
                        "utf-8"))
    return (docs.select("doc_id", n.alias("n_tokens"), score.alias("score"),
                        fp.alias("fp"))
            .filter((C("score") >= -0.04) & (C("n_tokens") >= 10))
            .select("doc_id", "n_tokens", "fp"))


def prep_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline with the Arrow front-end: same survivor aggregate and
    shard stats as the shipped op."""
    from agentic_data_pipeline_spark.operators.sampling import hash_bucket

    kept = kept_arrow(spark, sf_dir)
    surv = (kept.groupBy("fp")
            .agg(F.min_by(F.struct("doc_id", "n_tokens"), C("doc_id"))
                 .alias("s")))
    return (surv.groupBy(hash_bucket(C("s.doc_id"), 16).alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("s.n_tokens").cast("bigint").alias("total_tokens"),
                 F.min("s.doc_id").alias("min_doc")))


def noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    # Precondition for the cross-runtime regex/lower equivalence: the
    # corpus is printable ASCII (no tabs/newlines/unicode — Java \s,
    # RE2 \s and lower() all agree on this alphabet).
    n_nonascii = (load_table(spark, SF_DIR, "documents")
                  .filter(~C("text").rlike("^[\\x20-\\x7e]*$")).count())
    assert n_nonascii == 0, f"{n_nonascii} non-printable-ASCII docs"

    # Bit-identity: full kept set, row-for-row.
    a = sorted(map(tuple, kept_jvm(spark, SF_DIR).collect()))
    b = sorted(map(tuple, kept_arrow(spark, SF_DIR).collect()))
    assert len(a) == len(b), (len(a), len(b))
    assert a == b, "kept sets differ"
    print(f"kept-set identical: {len(a)} rows")
    fa = sorted(map(tuple,
                    ext_training_prep_pipeline(spark, SF_DIR).collect()))
    fb = sorted(map(tuple, prep_arrow(spark, SF_DIR).collect()))
    assert fa == fb, "final shard outputs differ"
    print(f"final output identical: {len(fa)} rows")

    out: dict = {"tier": TIER, "passes": PASSES, "kept_rows": len(a)}
    times: dict = {"jvm": [], "arrow": []}
    for p in range(PASSES):
        for label, fn in (("jvm", ext_training_prep_pipeline),
                          ("arrow", prep_arrow)):
            spark.sparkContext.setJobDescription(
                f"probe prep_arrow {label} pass {p}")
            times[label].append(round(noop(fn(spark, SF_DIR)), 3))
    out["prep"] = {k: {"times": v, "min": min(v)} for k, v in times.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
