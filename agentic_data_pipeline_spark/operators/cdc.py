"""Change-data & corpus-maintenance operators (beyond-reference, 100 TB
surface): latest-record-per-key compaction, incremental corpus dedup, and
small-file compaction of the bronze lake.

The reference has no incremental story at all — its lake is one parquet
file overwritten per save (reference engine.py:46-50). These ops are the
three maintenance primitives every production lake needs on day 2: collapse
a CDC/event stream to current state, admit only genuinely-new documents
from a fresh crawl batch, and keep file sizes healthy as appends accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, ts_us_long
from ..registry import op

C = F.col


@op("ext_latest_by_key", oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
""")
def ext_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key (the CDC compaction / SCD-1 snapshot op):
    each user's most recent event, ties broken by event_id.

    Shape at scale: `max_by` is a declarative aggregate, so Spark runs a
    map-side partial per input partition and shuffles ONE candidate row
    per (key, partition) — versus the window-function spelling (the
    oracle's QUALIFY), which must shuffle and sort EVERY row. At 100 TB of
    events with ~1e8 users that's the difference between shuffling ~1e8
    rows and shuffling the full fact table. The struct ordering key makes
    the tiebreak total, so output is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", ts_us_long(ev))  # µs: shared with the oracle
    latest = F.max_by(
        F.struct("event_id", "event_type", "value"),
        F.struct("ts_us", "event_id"))
    return (ev.groupBy("user_id")
            .agg(latest.alias("s"), F.max("ts_us").alias("ts_us"))
            .select("user_id", C("s.event_id").alias("event_id"), "ts_us",
                    C("s.event_type").alias("event_type"),
                    C("s.value").alias("value")))


_FP_SQL = r"md5(lower(regexp_replace(text, '\s+', ' ', 'g')))"


def _fp(text):
    return F.md5(F.encode(F.lower(F.regexp_replace(text, r"\s+", " ")),
                          "utf-8"))


@op("ext_dedup_incremental", oracle=rf"""
    WITH fp AS (
        SELECT doc_id, source, {_FP_SQL} AS fp FROM documents
    ), batch AS (
        SELECT doc_id, fp FROM fp WHERE source = 'src0'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT b.doc_id, b.fp
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM fp c
                      WHERE c.source <> 'src0' AND c.fp = b.fp)
""")
def ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup (the production admission shape): a new
    crawl batch (source = 'src0' stands in for it) is first deduped
    against itself (first doc_id per fingerprint survives), then
    anti-joined against the existing corpus's fingerprint index — only
    documents never seen before are admitted.

    Shape at scale: the corpus side is fingerprints only (16-byte md5),
    never full text — at 100 TB that index is a separate bucketed table
    maintained across batches, so the anti join co-locates by bucket and
    only the (much smaller) incoming batch shuffles. Nothing here
    re-reads or re-hashes the historical corpus text per batch.
    """
    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select("doc_id", "source", _fp(C("text")).alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    batch = (fps.filter(C("source") == "src0")
             .withColumn("rn", F.row_number().over(w))
             .filter(C("rn") == 1)
             .select("doc_id", "fp"))
    corpus_index = fps.filter(C("source") != "src0").select("fp")
    return batch.join(corpus_index, "fp", "left_anti") \
                .select("doc_id", "fp")


@op("ext_compact_files", oracle="SELECT * FROM supplier")
def ext_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (bronze lake maintenance): a table fragmented
    into many tiny files — the inevitable residue of streaming/incremental
    appends — is rewritten into few right-sized files. Content is
    bit-identical before and after (the oracle is the original table).

    Shape at scale: `coalesce` (not `repartition`) merges partitions
    WITHOUT a shuffle — each output task concatenates several input
    splits. Target file count = ceil(input_bytes / 128 MiB), computed from
    the source listing, so output files land on the parquet row-group
    sweet spot regardless of how fragmented the input was. At 100 TB this
    runs per-partition-directory (compact only partitions whose mean file
    size is small), never over the whole table at once.
    """
    from .reference_ops import _scratch
    from ..sources.compaction import compact_parquet

    supp = load_table(spark, sf_dir, "supplier")
    frag = _scratch("compact", "supplier_fragmented")
    supp.repartition(32).write.mode("overwrite").parquet(frag)
    out = _scratch("compact", "supplier_compacted")
    compact_parquet(spark, frag, out)
    return spark.read.parquet(out)
