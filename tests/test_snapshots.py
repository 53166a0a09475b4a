"""Snapshot log: time travel, rollback, CDF, vacuum (the native slice of
the Delta transaction-log surface; sources/snapshots.py)."""

from __future__ import annotations

import os

import pytest

from creatorops_lakehouse_spark.sources.snapshots import (
    current_version,
    rollback,
    snapshot_diff,
    snapshot_read,
    snapshot_write,
    vacuum_snapshots,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec


def _rows(df):
    return {tuple(r) for r in df.select("id", "v").collect()}


def test_append_overwrite_time_travel(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    v0 = snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    v1 = snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)
    v2 = snapshot_write(
        spark.createDataFrame([(9, "z")], ["id", "v"]), spec, mode="overwrite"
    )
    assert (v0, v1, v2) == (0, 1, 2)
    assert _rows(snapshot_read(spark, spec)) == {(9, "z")}
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b"), (3, "c")}
    assert _rows(snapshot_read(spark, spec, version=0)) == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_read(spark, spec, version=7)


def test_rollback_is_a_new_version(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)
    v = rollback(spec, 0)
    assert v == 2 and current_version(spec) == 2
    assert _rows(snapshot_read(spark, spec)) == {(1, "a")}
    # history intact: v1 still readable after the restore
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b")}


def test_cdf_between_versions(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    snapshot_write(
        spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"]),
        spec,
        mode="overwrite",
    )
    got = {
        (r.id, r.v, r._change_type)
        for r in snapshot_diff(spark, spec, 0, 1, keys=["id"]).collect()
    }
    # key 2 changed value but key-level CDF reports membership changes only
    assert got == {(3, "c", "insert"), (1, "a", "delete")}


def test_partitioned_snapshots(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("p",))
    snapshot_write(spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], ["id", "v", "p"]), spec)
    snapshot_write(spark.createDataFrame([(3, "c", "x")], ["id", "v", "p"]), spec)
    df = snapshot_read(spark, spec)
    assert {tuple(r) for r in df.select("id", "v", "p").collect()} == {
        (1, "a", "x"), (2, "b", "y"), (3, "c", "x"),
    }


def test_vacuum_drops_unreferenced_dirs(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(9, "z")], ["id", "v"]), spec, mode="overwrite")
    snapshot_write(spark.createDataFrame([(8, "y")], ["id", "v"]), spec)
    deleted = vacuum_snapshots(spec, keep_last=2)
    # v0's data dir is referenced by no surviving manifest -> gone
    assert deleted == ["data/b0"]
    assert not os.path.isdir(os.path.join(spec.path, "data", "b0"))
    assert current_version(spec) == 2
    assert _rows(snapshot_read(spark, spec)) == {(9, "z"), (8, "y")}
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_read(spark, spec, version=0)
