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


def commit_snapshot(df: DataFrame, table_dir: str,
                    mode: str = "append") -> int:
    """Write ``df``'s rows as new immutable data files and publish the
    next snapshot manifest. ``mode``: "append" (new snapshot = parent's
    files + new files) or "overwrite" (new snapshot = new files only —
    the parent's files remain on disk, still referenced by the old
    manifest: that is what makes time travel work). Returns the new
    version number. The manifest lands via os.replace LAST, so a crash
    mid-write leaves unreferenced orphan files, never a corrupt table."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode {mode!r}")
    versions = snapshot_versions(table_dir)
    version = (versions[-1] + 1) if versions else 1
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)

    tmp = os.path.join(table_dir, f"_tmp_write_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    new_files = []
    for i, f in enumerate(sorted(os.listdir(tmp))):
        if not f.endswith(".parquet"):
            continue
        name = f"v{version}-{i:04d}-{uuid.uuid4().hex[:8]}.parquet"
        os.replace(os.path.join(tmp, f), os.path.join(data_dir, name))
        new_files.append(os.path.join("data", name))
    shutil.rmtree(tmp)

    files = new_files
    if mode == "append" and versions:
        files = _read_manifest(table_dir, versions[-1])["files"] + new_files
    manifest = {"version": version, "mode": mode, "files": files,
                "parent": versions[-1] if versions else None}
    final = os.path.join(_manifest_dir(table_dir), f"v{version}.json")
    tmp_m = final + ".tmp"
    with open(tmp_m, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_m, final)
    return version


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Read one snapshot (default: latest) — time travel is just passing
    an older version. Resolves the manifest's file list; never lists the
    data directory, so orphans and newer snapshots are invisible."""
    versions = snapshot_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    v = versions[-1] if version is None else version
    m = _read_manifest(table_dir, v)
    if not m["files"]:
        return spark.createDataFrame([], schema="__empty string").limit(0)
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in m["files"]])
