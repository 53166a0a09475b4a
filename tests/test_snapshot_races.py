"""Deterministic reproductions of cross-process races on the snapshot
log, found by inspection while building tests/test_chaos_multiprocess.py
(VERDICT r9 item 1). Each test pins the interleaving by construction —
the probabilistic chaos run exercises the same windows with real OS
processes, these make the specific hazards regression-proof.
"""

from __future__ import annotations

import json
import os

import pytest

from creatorops_lakehouse_spark.sources import snapshots as sn
from creatorops_lakehouse_spark.sources.snapshots import (
    checkpoint_manifest,
    current_version,
    snapshot_read,
    snapshot_write,
    vacuum_snapshots,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec


def _mk(spark, path, n):
    spec = TableSpec("t.races", path)
    for i in range(n):
        snapshot_write(spark.createDataFrame([(i,)], ["id"]), spec)
    return spec


def test_vacuum_stale_plan_never_drops_unseen_commits(spark, tmp_path):
    """THE lost-commit race: vacuum computes keep/drop at T0; between the
    plan and the reclaim, new commits land AND a checkpoint fold folds
    them (deleting their loose manifests — the fold's contract). Vacuum's
    final checkpoint rewrite must preserve the versions it never saw: a
    rewrite filtered by its stale keep-set would remove the ONLY copy of
    the just-folded commits from the log."""
    spec = _mk(spark, str(tmp_path / "t"), 5)  # v0..v4

    def mid_race():
        for i in (100, 101, 102):
            snapshot_write(spark.createDataFrame([(i,)], ["id"]), spec)
        checkpoint_manifest(spec)  # folds v0..v7, deletes every loose file

    vacuum_snapshots(spec, keep_last=2, _post_plan=mid_race)

    # the commits that landed mid-vacuum must still be fully readable
    assert current_version(spec) == 7
    got = sorted(r.id for r in snapshot_read(spark, spec).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]
    # and each unseen version's manifest individually survives
    for v in (5, 6, 7):
        assert sn._read_manifest(spec, v)["version"] == v
    # vacuum's own drop set (v0..v2, outside keep_last=2 at plan time)
    # is allowed to be gone or present — but nothing NEWER may be lost


def test_read_manifest_survives_fold_deleting_loose_mid_read(spark, tmp_path, monkeypatch):
    """TOCTOU in _read_manifest: a checkpoint fold deletes the loose
    v<N>.json between the reader's existence probe and its open. The fold
    writes the checkpoint BEFORE deleting loose files, so the reader must
    fall through to the checkpoint body instead of crashing."""
    spec = _mk(spark, str(tmp_path / "t"), 3)
    checkpoint_manifest(spec)  # loose v0..v2 now live only in c2.json

    # simulate the lying existence probe: the loose path "exists" at
    # probe time (the fold's delete lands just after), so a
    # check-then-open reader crashes on the open
    real_exists = os.path.exists

    def lying_exists(path):
        p = os.fspath(path)
        if p.endswith("v1.json"):
            return True  # raced: existed at probe time, deleted before open
        return real_exists(path)

    monkeypatch.setattr(sn.os.path, "exists", lying_exists)
    m = sn._read_manifest(spec, 1)
    monkeypatch.undo()
    assert m["version"] == 1


def test_checkpoint_fold_skips_versions_vacuumed_mid_fold(spark, tmp_path, monkeypatch):
    """A fold lists versions, then a concurrent vacuum drops some before
    the fold reads their manifests. The fold must skip the vanished
    versions (vacuum's intent) and still publish the rest — not crash,
    and NEVER delete a loose manifest it failed to fold."""
    spec = _mk(spark, str(tmp_path / "t"), 6)  # v0..v5

    real_read = sn._read_manifest
    tripped = {"done": False}

    def racing_read(spec_, version):
        if version == 2 and not tripped["done"]:
            tripped["done"] = True
            # concurrent vacuum drops v2's manifest mid-fold
            os.remove(os.path.join(sn._manifest_dir(spec_), "v2.json"))
        return real_read(spec_, version)

    monkeypatch.setattr(sn, "_read_manifest", racing_read)
    n = checkpoint_manifest(spec)
    monkeypatch.undo()

    assert n == 5
    cp = sn._latest_checkpoint(spec)
    assert cp is not None and cp[0] == 5
    assert set(cp[1]) == {0, 1, 3, 4, 5}  # v2 skipped, rest folded
    assert current_version(spec) == 5
    got = sorted(r.id for r in snapshot_read(spark, spec).collect())
    assert got == [0, 1, 2, 3, 4, 5]  # head lineage carries v2's data dir


def test_concurrent_folds_tolerate_missing_old_checkpoint(spark, tmp_path, monkeypatch):
    """Two folds race: the slower one goes to remove the 'superseded'
    checkpoint it read at start, but the faster fold already removed it.
    The remove must tolerate the missing file, and stale older
    checkpoints must not accumulate (a newer fold sweeps ALL older
    c*.json, not just the one it happened to read)."""
    spec = _mk(spark, str(tmp_path / "t"), 3)
    checkpoint_manifest(spec)  # c2
    snapshot_write(spark.createDataFrame([(9,)], ["id"]), spec)  # v3

    d = sn._manifest_dir(spec)
    # plant a stale older checkpoint file, as a lost fold race would
    with open(os.path.join(d, "c2.json")) as f:
        body = json.load(f)
    body["checkpoint_version"] = 1
    body["manifests"] = {k: v for k, v in body["manifests"].items() if int(k) <= 1}
    with open(os.path.join(d, "c1.json"), "w") as f:
        json.dump(body, f)

    real_remove = os.remove
    removed_once = {"done": False}

    def racing_remove(path):
        p = os.fspath(path)
        if p.endswith("c2.json") and not removed_once["done"]:
            removed_once["done"] = True
            real_remove(p)  # the faster fold got here first
        return real_remove(p)  # then the slower fold's remove runs

    monkeypatch.setattr(sn.os, "remove", racing_remove)
    n = checkpoint_manifest(spec)
    monkeypatch.undo()

    assert n == 3
    left = sorted(f for f in os.listdir(d) if f.startswith("c"))
    assert left == ["c3.json"]  # every older checkpoint swept
    assert current_version(spec) == 3


def test_vacuum_rmtree_tolerates_concurrent_vacuum(spark, tmp_path, monkeypatch):
    """Two vacuums race on the same doomed data dir: the slower one's
    isdir probe passes but the faster one's rmtree wins. The slower
    vacuum must tolerate the vanished dir, not crash mid-reclaim."""
    import shutil

    # overwrites: each version's dirs are referenced ONLY by it, so
    # dropping old versions dooms real data dirs for the rmtree walk
    spec = TableSpec("t.races", str(tmp_path / "t"))
    for i in range(4):
        snapshot_write(
            spark.createDataFrame([(i,)], ["id"]), spec, mode="overwrite"
        )

    real_rmtree = shutil.rmtree
    tripped = {"done": False}

    def racing_rmtree(path, *a, **kw):
        if not tripped["done"]:
            tripped["done"] = True
            real_rmtree(path)  # the other vacuum wins the first dir
        return real_rmtree(path, *a, **kw)  # ours then races the loss

    monkeypatch.setattr(shutil, "rmtree", racing_rmtree)
    deleted = vacuum_snapshots(spec, keep_last=1)
    monkeypatch.undo()
    assert len(deleted) >= 2  # reclaim proceeded past the vanished dir
    assert current_version(spec) == 3
    got = sorted(r.id for r in snapshot_read(spark, spec).collect())
    assert got == [3]  # overwrite head
