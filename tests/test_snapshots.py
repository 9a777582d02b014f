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
    assert all(p.startswith("data/") and p.endswith(".parquet")
               for p in m["files"])


def test_bad_mode_rejected(spark, table):
    with pytest.raises(ValueError):
        commit_snapshot(_df(spark, [1]), table, "merge")
