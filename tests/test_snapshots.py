"""Snapshot-versioned parquet tables (Iceberg semantics on the fallback):
append/overwrite commits, time travel, rollback, compaction, expiration."""

from __future__ import annotations

import os

import pytest

from streaming_data_pipeline_with_iceberg_and_spark_spark.sources.snapshots import (
    SnapshotError,
    SnapshotTable,
)


@pytest.fixture
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "events_snap"))


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_commits_are_time_travelable(spark, table):
    v1 = table.append(spark.range(0, 3))
    v2 = table.append(spark.range(3, 5))
    v3 = table.append(spark.range(5, 6))
    assert (v1, v2, v3) == (1, 2, 3)
    assert _ids(table.read()) == [0, 1, 2, 3, 4, 5]
    assert _ids(table.read(version=v1)) == [0, 1, 2]
    assert _ids(table.read(version=v2)) == [0, 1, 2, 3, 4]


def test_overwrite_preserves_old_versions(spark, table):
    v1 = table.append(spark.range(0, 4))
    v2 = table.overwrite(spark.range(100, 102))
    assert _ids(table.read()) == [100, 101]
    assert _ids(table.read(version=v1)) == [0, 1, 2, 3]
    hist = {r["version"]: r["op"] for r in table.history().collect()}
    assert hist == {v1: "append", v2: "overwrite"}


def test_rollback_commits_new_snapshot(spark, table):
    v1 = table.append(spark.range(0, 3))
    table.overwrite(spark.range(50, 51))  # the "bad" write
    v3 = table.rollback(v1)
    assert v3 == 3
    assert _ids(table.read()) == [0, 1, 2]
    # history is append-only: the bad version stays inspectable
    assert _ids(table.read(version=2)) == [50]


def test_compaction_rewrites_layout_not_data(spark, table):
    # streaming-shaped ingest: many tiny files per commit
    table.append(spark.range(0, 500).repartition(32))
    table.append(spark.range(500, 1000).repartition(32))
    pre = table.read()
    n_files_pre = len([f for f in pre.inputFiles()])
    v = table.compact(target_file_bytes=64 * 1024 * 1024)
    post = table.read()
    n_files_post = len([f for f in post.inputFiles()])
    assert _ids(post) == list(range(1000))  # byte-equivalent data
    assert n_files_post < n_files_pre  # layout actually compacted
    assert n_files_post <= 4
    assert table.current_version() == v
    # pre-compaction version still readable (compaction is roll-back-able)
    assert _ids(table.read(version=2)) == list(range(1000))


def test_expire_snapshots_reclaims_unreferenced_files(spark, table):
    table.append(spark.range(0, 3))
    table.overwrite(spark.range(10, 13))
    table.overwrite(spark.range(20, 23))
    expired = table.expire_snapshots(keep_last=2)
    assert expired == [1]
    # v1's dir is referenced by no live snapshot -> deleted from disk
    assert not os.path.isdir(os.path.join(table.root, "data", "s1"))
    with pytest.raises(SnapshotError, match="expired"):
        table.read(version=1)
    assert _ids(table.read()) == [20, 21, 22]
    assert _ids(table.read(version=2)) == [10, 11, 12]


def test_expire_keeps_dirs_shared_with_live_appends(spark, table):
    """Append lineage: v1's data dir is also part of v2/v3's view — expiring
    v1 must NOT delete the shared dir."""
    table.append(spark.range(0, 3))
    table.append(spark.range(3, 6))
    table.append(spark.range(6, 9))
    expired = table.expire_snapshots(keep_last=2)
    assert expired == [1]
    assert os.path.isdir(os.path.join(table.root, "data", "s1"))
    assert _ids(table.read()) == list(range(9))


def test_read_as_of_timestamp(spark, table):
    table.append(spark.range(0, 2))
    log = table._log()
    t_after_v1 = log[-1]["ts"]
    table.append(spark.range(2, 4))
    assert _ids(table.read_as_of(t_after_v1)) == [0, 1]
    with pytest.raises(SnapshotError):
        table.read_as_of(t_after_v1 - 1000)


def test_missing_table_and_version_errors(spark, table):
    with pytest.raises(SnapshotError, match="no snapshots"):
        table.read()
    table.append(spark.range(0, 1))
    with pytest.raises(SnapshotError, match="no snapshot 99"):
        table.read(version=99)
