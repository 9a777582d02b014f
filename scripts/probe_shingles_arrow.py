#!/usr/bin/env python
"""Arrow shingle-generator A/B (r12, the prep-Arrow mechanism extended
to the next-biggest text constant): the r11 curation decomposition
charged ~80% of ext_curation_pipeline to the shingle explode, and the
JVM generator ALSO paid two exchanges per-doc work never needed — the
posexplode+window form shuffled the whole token stream (partitionBy(id)
sort) and the global .distinct() shuffled the whole shingle stream.
The mapInArrow form generates per-doc distinct shingles in the scan
task: zero exchanges, RE2 normalize, byte-identical strings (pinned by
tests/test_shingles_arrow.py incl. short/zero-token corners).

Subjects here = the oracle-visible consumers:
ext_curation_pipeline, ext_decontaminate, ext_dedup_minhash_md5.
Before-variants rebuild each on _shingles_exploded_jvm; rows asserted
identical, then interleaved fresh-noop-write timing.

Usage: SPARK_GRAFT_TIER=sf10 python scripts/probe_shingles_arrow.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from agentic_data_pipeline_spark.catalog import load_table
from agentic_data_pipeline_spark.operators import dedup as D
from agentic_data_pipeline_spark.session import apply_scaled_shuffle, get_spark

C = F.col
TIER = os.environ.get("SPARK_GRAFT_TIER", "sf10")
SF_DIR = f"/root/repo/.tmp/{TIER}" if TIER not in ("sf0.1",) \
    else "/root/testdata/sf0.1"
PASSES = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))


class _JvmShingles:
    """Context manager: swap shingles_exploded for the window form AND
    neutralize _ensure_parallelism, so the before-variant is the exact
    r11 plan shape (the helper only exists to replace the window
    exchange's accidental redistribution)."""

    def __enter__(self):
        self._orig = D.shingles_exploded
        self._orig_par = D._ensure_parallelism
        D.shingles_exploded = D._shingles_exploded_jvm
        D._ensure_parallelism = lambda df: df

    def __exit__(self, *exc):
        D.shingles_exploded = self._orig
        D._ensure_parallelism = self._orig_par


def build(spark: SparkSession, name: str, jvm: bool) -> DataFrame:
    from agentic_data_pipeline_spark.registry import OPS

    if jvm:
        with _JvmShingles():
            return OPS[name].fn(spark, SF_DIR)
    return OPS[name].fn(spark, SF_DIR)


SUBJECTS = ["ext_curation_pipeline", "ext_decontaminate",
            "ext_dedup_minhash_md5"]


def main() -> None:
    from agentic_data_pipeline_spark.registry import _ensure_loaded

    _ensure_loaded()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    n_fact = load_table(spark, SF_DIR, "lineitem").count()
    apply_scaled_shuffle(spark, n_fact)

    out: dict = {"tier": TIER, "passes": PASSES}
    for name in SUBJECTS:
        try:
            a = sorted(map(tuple, build(spark, name, jvm=True).collect()))
        except Exception as e:  # noqa: BLE001 — record, don't hide
            # Measured at sf10: the r11 window-form ext_dedup_minhash_md5
            # dies building a broadcast ("Not enough memory to build and
            # broadcast"); the Arrow form completes (296 s, noop) — a
            # robustness datapoint, recorded verbatim.
            out[name] = {"jvm_error": str(e).split("\n")[0][:300]}
            print(name, json.dumps(out[name]))
            continue
        b = sorted(map(tuple, build(spark, name, jvm=False).collect()))
        assert a == b, f"{name}: rows differ between shingle forms"
        times: dict = {"jvm": [], "arrow": []}
        for p in range(PASSES):
            for label, jvm in (("jvm", True), ("arrow", False)):
                spark.sparkContext.setJobDescription(
                    f"probe shingles {name} {label} pass {p}")
                t0 = time.monotonic()
                build(spark, name, jvm).write.format("noop") \
                    .mode("overwrite").save()
                times[label].append(round(time.monotonic() - t0, 3))
        out[name] = {k: {"times": v, "min": min(v)} for k, v in times.items()}
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
