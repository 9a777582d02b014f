"""Snapshot-versioned parquet tables: Iceberg's commit model, minimally.

The reference labels its storage stage "Delta" but writes plain parquet
(app.py:60 vs engine.py:46-50); the repo already emulates the write-side
ACID surface (MERGE in analytics.py, SCD-2/upsert in cdc.py, compaction
in sources/compaction.py). This module adds the READ side real lakehouses
provide: **snapshot isolation + time travel**, implemented exactly the
way Iceberg does at its core — immutable data files + a per-version
MANIFEST listing the files that constitute each snapshot, committed by an
atomic rename. Readers resolve a manifest, never a directory listing, so
a reader of version N is unaffected by concurrent appends/overwrites
(they only add files and then publish a NEW manifest), and any historical
version stays readable until explicitly expired.

Scale notes: the manifest holds file paths + row counts, not data — at
100 TB it is KBs; planning a snapshot read is O(files-in-snapshot) driver
work and the scan itself is an ordinary pruned parquet read. Commit
concurrency control (optimistic CAS on the version counter) is the piece
a real catalog service adds; single-writer is assumed here and documented
rather than faked.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def snapshot_versions(table_dir: str) -> list[int]:
    d = _manifest_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:-5]) for f in os.listdir(d)
                  if f.startswith("v") and f.endswith(".json"))


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_dir),
                           f"v{version}.json")) as f:
        return json.load(f)


def _normalize_entry(entry) -> dict:
    """Manifest file entries are dicts {path, partition}; pre-evolution
    manifests stored plain path strings — normalize both shapes."""
    if isinstance(entry, str):
        return {"path": entry, "partition": {}}
    return entry


class SnapshotConflict(RuntimeError):
    """Another writer published the version this commit raced for.
    The loser's data files are unreferenced orphans (reclaimed by the
    next expire_snapshots); retry by re-resolving the parent — see
    commit_snapshot_with_retry."""


def commit_snapshot(df: DataFrame, table_dir: str,
                    mode: str = "append",
                    partition_by: list[str] | None = None,
                    expected_version: int | None = None) -> int:
    """Write ``df``'s rows as new immutable data files and publish the
    next snapshot manifest. ``mode``: "append" (new snapshot = parent's
    files + new files) or "overwrite" (new snapshot = new files only —
    the parent's files remain on disk, still referenced by the old
    manifest: that is what makes time travel work). Returns the new
    version number. The manifest lands via os.replace LAST, so a crash
    mid-write leaves unreferenced orphan files, never a corrupt table.

    ``partition_by`` (PARTITION EVOLUTION, Iceberg-style): the listed
    columns partition THIS commit's files, and each file's manifest
    entry records its partition values, so `read_snapshot(eq=...)`
    prunes by metadata. The spec is per-COMMIT, not per-table: a later
    commit may use a different (typically finer) spec, and one snapshot
    may reference files written under several specs — readers prune
    each file by whatever columns ITS entry recorded and keep files
    whose spec cannot answer the predicate (correctness never depends
    on pruning). Partition columns stay IN the data files (the write
    path partitions on hidden duplicates), so no read-side value
    re-attachment is needed and old-spec files still answer new-spec
    predicates row-wise."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode {mode!r}")
    versions = snapshot_versions(table_dir)
    latest = versions[-1] if versions else 0
    if expected_version is not None and latest != expected_version:
        raise SnapshotConflict(
            f"expected parent v{expected_version}, table is at v{latest}")
    version = latest + 1
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)

    tmp = os.path.join(table_dir, f"_tmp_write_{uuid.uuid4().hex[:8]}")
    new_files = []
    if partition_by:
        # Partition on hidden duplicates so the real columns survive in
        # the data files (write.partitionBy drops its columns).
        hidden = [f"__p_{c}" for c in partition_by]
        out = df
        for c, h in zip(partition_by, hidden):
            out = out.withColumn(h, out[c].cast("string"))
        out.write.mode("overwrite").partitionBy(*hidden).parquet(tmp)
        for root, _dirs, fs in sorted(os.walk(tmp)):
            rel = os.path.relpath(root, tmp)
            if rel == ".":
                continue
            part = {}
            for seg in rel.split(os.sep):
                k, _, v = seg.partition("=")
                if k.startswith("__p_"):
                    part[k[len("__p_"):]] = v
            for i, f in enumerate(sorted(fs)):
                if not f.endswith(".parquet"):
                    continue
                name = (f"v{version}-{uuid.uuid4().hex[:8]}-{i:04d}"
                        ".parquet")
                os.replace(os.path.join(root, f),
                           os.path.join(data_dir, name))
                new_files.append({"path": os.path.join("data", name),
                                  "partition": part})
    else:
        df.write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if not f.endswith(".parquet"):
                continue
            name = f"v{version}-{i:04d}-{uuid.uuid4().hex[:8]}.parquet"
            os.replace(os.path.join(tmp, f), os.path.join(data_dir, name))
            new_files.append({"path": os.path.join("data", name),
                              "partition": {}})
    shutil.rmtree(tmp)

    files = new_files
    if mode == "append" and versions:
        files = (_read_manifest(table_dir, versions[-1])["files"]
                 + new_files)
    manifest = {"version": version, "mode": mode, "files": files,
                "spec": partition_by or [],
                "parent": versions[-1] if versions else None}
    final = os.path.join(_manifest_dir(table_dir), f"v{version}.json")
    tmp_m = final + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp_m, "w") as f:
        json.dump(manifest, f)
    # Publish via CREATE-IF-ABSENT (os.link fails if final exists) — the
    # optimistic CAS on the version counter a real catalog service
    # provides. A concurrent writer that raced to the same version loses
    # with SnapshotConflict; its data files stay as orphans, invisible to
    # every reader and reclaimed by the next expire_snapshots.
    try:
        os.link(tmp_m, final)
    except FileExistsError:
        raise SnapshotConflict(
            f"lost the race publishing v{version}") from None
    finally:
        os.unlink(tmp_m)
    return version


def commit_snapshot_with_retry(df: DataFrame, table_dir: str,
                               mode: str = "append",
                               partition_by: list[str] | None = None,
                               max_retries: int = 5) -> int:
    """The standard optimistic-concurrency loop: resolve the parent,
    attempt the CAS commit, and on conflict re-resolve and retry —
    sound for append/overwrite because neither mode's file list depends
    on any row-level merge with the concurrent winner (appends compose;
    an overwrite that loses must re-read its parent anyway)."""
    for _ in range(max_retries):
        latest = (snapshot_versions(table_dir) or [0])[-1]
        try:
            return commit_snapshot(df, table_dir, mode, partition_by,
                                   expected_version=latest)
        except SnapshotConflict:
            continue
    raise SnapshotConflict(
        f"gave up after {max_retries} conflicting commits")


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Expire all but the newest ``keep_last`` snapshots and reclaim
    storage — Iceberg's ``expire_snapshots`` over this manifest model.

    Two phases, ordered for crash safety:
    1. DELETE the expired manifests first. After this, no manifest on
       disk references a file the next phase might remove, so a crash at
       any point leaves every remaining snapshot fully readable.
    2. GC data files referenced by NO surviving manifest — which also
       sweeps orphans from crashed commits (files written but never
       published; commit_snapshot writes its manifest LAST). A crash
       mid-phase-2 leaves some unreferenced files on disk: invisible to
       readers (they resolve manifests, never directory listings) and
       reclaimed by the next expire.

    At 100 TB both phases are manifest-sized driver work plus bulk
    deletes; nothing scans data. Returns accounting: versions expired /
    kept, files deleted (incl. orphans), bytes reclaimed.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(table_dir)
    expired = versions[:-keep_last]
    kept = versions[-keep_last:]
    for v in expired:  # phase 1: manifests first
        os.remove(os.path.join(_manifest_dir(table_dir), f"v{v}.json"))
    live = {_normalize_entry(f)["path"] for v in kept
            for f in _read_manifest(table_dir, v)["files"]}
    data_dir = os.path.join(table_dir, "data")
    deleted, reclaimed = 0, 0
    if os.path.isdir(data_dir):
        for f in sorted(os.listdir(data_dir)):  # phase 2: GC + orphans
            rel = os.path.join("data", f)
            if rel not in live:
                p = os.path.join(data_dir, f)
                reclaimed += os.path.getsize(p)
                os.remove(p)
                deleted += 1
    return {"expired_versions": expired, "kept_versions": kept,
            "files_deleted": deleted, "bytes_reclaimed": reclaimed}


def compact_snapshot(spark: SparkSession, table_dir: str,
                     target_files: int = 1) -> int:
    """Rewrite the CURRENT snapshot's many small files into
    ``target_files`` — Iceberg's ``rewrite_data_files``. Reads the live
    snapshot, coalesces, and commits the result as a NEW overwrite
    snapshot: the same rows under fewer files. Readers of any existing
    version are untouched (their manifests still reference the old
    files); the old files become reclaimable once those versions expire.
    Returns the new version number.

    At scale this is the compaction half of lake maintenance (expire is
    the other): small-file pressure comes from streaming/incremental
    appends, and the fix is an ordinary distributed rewrite committed
    atomically — never an in-place mutation.
    """
    df = read_snapshot(spark, table_dir).coalesce(target_files)
    return commit_snapshot(df, table_dir, mode="overwrite")


def snapshot_files(table_dir: str, version: int | None = None,
                   eq: dict[str, str] | None = None) -> list[str]:
    """Resolve one snapshot's file list, PRUNED by equality predicates
    on partition columns. A file is kept unless its manifest entry
    recorded a value for the predicate column AND that value differs —
    so files written under an older/coarser spec (no such column) are
    always kept and answer the predicate row-wise. This is what makes
    pruning correct ACROSS a partition-spec change: metadata pruning is
    an optimization, never a correctness dependency."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    v = versions[-1] if version is None else version
    out = []
    for entry in map(_normalize_entry, _read_manifest(table_dir, v)["files"]):
        part = entry.get("partition", {})
        if eq and any(c in part and part[c] != val
                      for c, val in eq.items()):
            continue
        out.append(os.path.join(table_dir, entry["path"]))
    return out


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None,
                  eq: dict[str, str] | None = None) -> DataFrame:
    """Read one snapshot (default: latest) — time travel is just passing
    an older version. Resolves the manifest's file list; never lists the
    data directory, so orphans and newer snapshots are invisible. ``eq``
    prunes files by partition metadata (see snapshot_files); callers
    still apply the row-level predicate — pruning only narrows the scan.
    """
    files = snapshot_files(table_dir, version, eq)
    if not files:
        return spark.createDataFrame([], schema="__empty string").limit(0)
    return spark.read.parquet(*files)
