"""sources/snapshots.py: manifest-committed snapshot tables (Iceberg's
commit model over plain parquet) — isolation, time travel, crash safety."""

import json
import os

import pytest

from agentic_data_pipeline_spark.sources.snapshots import (
    commit_snapshot, read_snapshot, snapshot_versions,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame([(i, f"r{i}") for i in rows],
                                 "id bigint, s string")


def test_append_overwrite_and_time_travel(spark, table):
    assert commit_snapshot(_df(spark, [1, 2]), table, "append") == 1
    assert commit_snapshot(_df(spark, [3]), table, "append") == 2
    assert commit_snapshot(_df(spark, [9]), table, "overwrite") == 3
    assert snapshot_versions(table) == [1, 2, 3]
    get = lambda v: sorted(  # noqa: E731
        r["id"] for r in read_snapshot(spark, table, v).collect())
    assert get(1) == [1, 2]
    assert get(2) == [1, 2, 3]    # append = parent files + new files
    assert get(3) == [9]          # overwrite = new files only
    assert get(None) == [9]       # default = latest
    # v1/v2 stayed readable AFTER the overwrite: that's the point


def test_readers_resolve_manifests_not_directory_listings(spark, table):
    commit_snapshot(_df(spark, [1]), table, "append")
    # an orphan data file (crashed writer) must be invisible to readers
    data_dir = os.path.join(table, "data")
    legit = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    _df(spark, [777]).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(table, "_orphan"))
    part = [f for f in os.listdir(os.path.join(table, "_orphan"))
            if f.endswith(".parquet")][0]
    os.replace(os.path.join(table, "_orphan", part),
               os.path.join(data_dir, "v9-orphan.parquet"))
    assert [r["id"] for r in read_snapshot(spark, table).collect()] == [1]
    assert set(legit) <= set(os.listdir(data_dir))  # orphan coexists on disk


def test_manifest_commits_last_and_atomically(spark, table):
    commit_snapshot(_df(spark, [1]), table, "append")
    # simulate a crash AFTER data files landed but BEFORE manifest publish:
    # hand-write data files without a manifest — table still serves v1
    data_dir = os.path.join(table, "data")
    with open(os.path.join(data_dir, "v2-0000-deadbeef.parquet"), "wb") as f:
        f.write(b"not even parquet")
    assert snapshot_versions(table) == [1]
    assert [r["id"] for r in read_snapshot(spark, table).collect()] == [1]


def test_manifest_contents_are_minimal_metadata(spark, table):
    commit_snapshot(_df(spark, list(range(5))), table, "append")
    with open(os.path.join(table, "_manifests", "v1.json")) as f:
        m = json.load(f)
    assert m["version"] == 1 and m["parent"] is None
    # entries are {path, partition} dicts since partition evolution (r7)
    assert all(e["path"].startswith("data/")
               and e["path"].endswith(".parquet")
               and isinstance(e["partition"], dict) for e in m["files"])


def test_bad_mode_rejected(spark, table):
    with pytest.raises(ValueError):
        commit_snapshot(_df(spark, [1]), table, "merge")


# ------------------------------------------------------- maintenance (r6)

def _files(table):
    return set(os.listdir(os.path.join(table, "data")))


def test_expire_snapshots_reclaims_dead_files_and_orphans(spark, table):
    from agentic_data_pipeline_spark.sources.snapshots import (
        expire_snapshots,
    )

    commit_snapshot(_df(spark, [1, 2]), table, "append")
    commit_snapshot(_df(spark, [3]), table, "append")
    commit_snapshot(_df(spark, [9]), table, "overwrite")
    # crashed-commit orphan: on disk, in no manifest
    orphan = os.path.join(table, "data", "v9-crashed-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"\x00" * 16)
    before = _files(table)
    stats = expire_snapshots(table, keep_last=1)
    assert stats["expired_versions"] == [1, 2]
    assert stats["kept_versions"] == [3]
    assert stats["files_deleted"] == len(before) - len(_files(table))
    assert "v9-crashed-orphan.parquet" not in _files(table)
    assert stats["bytes_reclaimed"] > 0
    # survivor fully readable; history gone
    assert snapshot_versions(table) == [3]
    assert [r["id"] for r in read_snapshot(spark, table).collect()] == [9]
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, table, 1)
    # idempotent: a second expire is a no-op
    again = expire_snapshots(table, keep_last=1)
    assert again["files_deleted"] == 0 and again["expired_versions"] == []


def test_expire_keeps_every_surviving_version_readable(spark, table):
    from agentic_data_pipeline_spark.sources.snapshots import (
        expire_snapshots,
    )

    commit_snapshot(_df(spark, [1]), table, "append")
    commit_snapshot(_df(spark, [2]), table, "append")
    commit_snapshot(_df(spark, [9]), table, "overwrite")
    expire_snapshots(table, keep_last=2)
    assert snapshot_versions(table) == [2, 3]
    # v2 is an APPEND snapshot referencing v1's files: keeping it must
    # keep those shared files alive even though v1's manifest is gone
    assert sorted(r["id"] for r in
                  read_snapshot(spark, table, 2).collect()) == [1, 2]
    assert [r["id"] for r in read_snapshot(spark, table, 3).collect()] == [9]


def test_expire_crash_between_phases_leaves_table_consistent(spark, table):
    """Crash ordering: manifests are deleted BEFORE any data file — a
    crash after phase 1 leaves unreferenced (invisible) files, never a
    manifest pointing at a deleted file. Simulated by doing exactly what
    phase 1 does, then 'crashing' (no GC), then recovering via expire."""
    from agentic_data_pipeline_spark.sources.snapshots import (
        expire_snapshots,
    )

    commit_snapshot(_df(spark, [1]), table, "append")
    commit_snapshot(_df(spark, [9]), table, "overwrite")
    os.remove(os.path.join(table, "_manifests", "v1.json"))  # phase-1 crash
    assert snapshot_versions(table) == [2]
    assert [r["id"] for r in read_snapshot(spark, table).collect()] == [9]
    # recovery: the next expire sweeps what phase 2 never reclaimed
    stats = expire_snapshots(table, keep_last=1)
    assert stats["files_deleted"] > 0  # v1's now-unreferenced files
    assert [r["id"] for r in read_snapshot(spark, table).collect()] == [9]


def test_compact_snapshot_same_rows_fewer_files(spark, table):
    from agentic_data_pipeline_spark.sources.snapshots import (
        compact_snapshot, expire_snapshots,
    )

    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")
    commit_snapshot(df.repartition(8), table, "append")
    v = compact_snapshot(spark, table, target_files=1)
    assert v == 2
    import json as _json
    with open(os.path.join(table, "_manifests", "v2.json")) as f:
        m = _json.load(f)
    assert len(m["files"]) == 1
    assert sorted(r["id"] for r in
                  read_snapshot(spark, table).collect()) == list(range(100))
    # old version untouched until expired
    assert read_snapshot(spark, table, 1).count() == 100
    expire_snapshots(table, keep_last=1)
    assert _files(table) == {os.path.basename(m["files"][0]["path"])}


def test_expire_keep_last_validated(spark, table):
    from agentic_data_pipeline_spark.sources.snapshots import (
        expire_snapshots,
    )

    commit_snapshot(_df(spark, [1]), table, "append")
    with pytest.raises(ValueError):
        expire_snapshots(table, keep_last=0)


# ------------------------------------------- partition evolution (r7)

def test_partition_evolution_prunes_across_spec_boundary(spark, table):
    """One snapshot, two specs: v1 files partitioned by `g`, v2 appends
    partitioned by (g, h). Predicates must prune exactly the files whose
    spec can answer them and NEVER change results."""
    from agentic_data_pipeline_spark.sources.snapshots import (
        read_snapshot, snapshot_files,
    )

    df1 = spark.range(40).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS g", "CAST(id % 2 AS STRING) AS h")
    df2 = spark.range(40, 80).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS g", "CAST(id % 2 AS STRING) AS h")
    commit_snapshot(df1, table, "append", partition_by=["g"])
    commit_snapshot(df2, table, "append", partition_by=["g", "h"])

    all_files = snapshot_files(table)
    g_files = snapshot_files(table, eq={"g": "1"})
    h_files = snapshot_files(table, eq={"h": "1"})
    # g prunes BOTH file families; h prunes only v2's files (v1's spec
    # has no h key -> kept, row-filtered by the caller)
    assert len(g_files) < len(all_files)
    assert len(h_files) < len(all_files)
    v1_files = {f for f in all_files if "/v1-" in f or "v1-" in
                os.path.basename(f)}
    assert v1_files <= set(h_files), \
        "old-spec files must never be pruned by a new-spec column"

    got = sorted(r["id"] for r in
                 read_snapshot(spark, table, eq={"g": "1"})
                 .filter("g = '1'").collect())
    assert got == [i for i in range(80) if i % 4 == 1]
    got_h = sorted(r["id"] for r in
                   read_snapshot(spark, table, eq={"h": "1"})
                   .filter("h = '1'").collect())
    assert got_h == [i for i in range(80) if i % 2 == 1]


def test_partition_columns_survive_in_data_files(spark, table):
    """The write path partitions on hidden duplicates: the real columns
    must still be present in the parquet data (old-spec files answer
    new-spec predicates row-wise only because of this)."""
    df = spark.range(10).selectExpr("id", "CAST(id % 2 AS STRING) AS g")
    commit_snapshot(df, table, "append", partition_by=["g"])
    back = read_snapshot(spark, table)
    assert set(back.columns) == {"id", "g"}
    assert back.filter("g = '1'").count() == 5


# ------------------------------------------- optimistic concurrency (r7)

def test_commit_cas_detects_stale_parent_and_lost_race(spark, table):
    from agentic_data_pipeline_spark.sources.snapshots import (
        SnapshotConflict, commit_snapshot_with_retry, read_snapshot,
    )

    v1 = commit_snapshot(_df(spark, [1, 2]), table, "append")
    assert v1 == 1
    # stale expected parent -> conflict BEFORE any manifest is published
    with pytest.raises(SnapshotConflict):
        commit_snapshot(_df(spark, [3]), table, "append",
                        expected_version=0)
    # correct expected parent -> commits
    v2 = commit_snapshot(_df(spark, [3]), table, "append",
                         expected_version=1)
    assert v2 == 2
    # retry loop survives a writer that lands between resolve and commit
    assert commit_snapshot_with_retry(_df(spark, [4]), table) == 3
    assert sorted(r["id"] for r in read_snapshot(spark, table).collect()) \
        == [1, 2, 3, 4]


def test_lost_race_leaves_only_orphans(spark, table, monkeypatch):
    """Simulate the true race: a second writer publishes v2 AFTER this
    writer resolved its parent but BEFORE it links its manifest. The
    loser must raise, leave NO manifest, and its data files must be
    invisible orphans that expire_snapshots reclaims."""
    import agentic_data_pipeline_spark.sources.snapshots as S

    commit_snapshot(_df(spark, [1]), table, "append")
    real_versions = S.snapshot_versions

    def racing_versions(td):
        out = real_versions(td)
        # the rival lands v2 the instant we look (only once)
        if out == [1]:
            monkeypatch.setattr(S, "snapshot_versions", real_versions)
            commit_snapshot(_df(spark, [99]), td, "append")
            return out  # stale view: we still think latest is v1
        return out

    monkeypatch.setattr(S, "snapshot_versions", racing_versions)
    with pytest.raises(S.SnapshotConflict):
        S.commit_snapshot(_df(spark, [2]), table, "append")
    # rival's v2 intact; loser published nothing
    assert real_versions(table) == [1, 2]
    got = sorted(r["id"] for r in
                 S.read_snapshot(spark, table).collect())
    assert got == [1, 99]
    # loser's data files are orphans; expire reclaims them
    res = S.expire_snapshots(table, keep_last=2)
    assert res["files_deleted"] >= 1
