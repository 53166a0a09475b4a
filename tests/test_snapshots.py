"""Snapshot log: time travel, rollback, CDF, vacuum (the native slice of
the Delta transaction-log surface; sources/snapshots.py)."""

from __future__ import annotations

import os

import pytest

from creatorops_lakehouse_spark.sources.snapshots import (
    current_version,
    rollback,
    snapshot_diff,
    snapshot_dirs,
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
    v0_dirs = snapshot_dirs(spec, 0)
    deleted = vacuum_snapshots(spec, keep_last=2)
    # v0's data dir is referenced by no surviving manifest -> gone
    assert [os.path.join(spec.path, d) for d in deleted] == v0_dirs
    assert not any(os.path.isdir(d) for d in v0_dirs)
    assert current_version(spec) == 2
    assert _rows(snapshot_read(spark, spec)) == {(9, "z"), (8, "y")}
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_read(spark, spec, version=0)


def test_checkpoint_compaction_1000_commits(spark, tmp_path):
    """1,000 commits -> checkpoint folds the log into one file + tail;
    reads (head and pre-checkpoint time travel) still work; vacuum honors
    the checkpoint (VERDICT r6 item 2)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        _commit,
        _loose_versions,
        checkpoint_manifest,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # three real data commits, then synthesize the remaining 997 manifests
    # directly (same _commit path real writes use) so the test stays fast —
    # checkpointing is a pure log operation, data dirs are opaque names.
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)
    v2_dirs = snapshot_dirs(spec, 2)
    rel_v2 = [os.path.relpath(d, spec.path) for d in v2_dirs]
    for v in range(3, 1000):
        _commit(spec, v, {"version": v, "mode": "append", "dirs": rel_v2, "parent": v - 1})
    assert current_version(spec) == 999
    assert len(_loose_versions(spec)) == 1000

    cp = checkpoint_manifest(spec, upto=990)
    assert cp == 990
    # log is now one checkpoint + a 9-manifest tail
    assert _loose_versions(spec) == list(range(991, 1000))
    assert os.path.exists(os.path.join(spec.path, "_manifests", "c990.json"))
    assert current_version(spec) == 999
    # head read plans from checkpointed history + tail
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    # time travel to versions folded INTO the checkpoint still works
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b")}
    assert _rows(snapshot_read(spark, spec, version=0)) == {(1, "a")}

    # a second checkpoint supersedes the first (folds its body + newer tail)
    cp2 = checkpoint_manifest(spec)
    assert cp2 == 999
    assert _loose_versions(spec) == []
    assert not os.path.exists(os.path.join(spec.path, "_manifests", "c990.json"))
    assert _rows(snapshot_read(spark, spec, version=0)) == {(1, "a")}

    # vacuum honors the checkpoint: drops folded versions by rewriting it
    deleted = vacuum_snapshots(spec, keep_last=5)
    assert current_version(spec) == 999
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_read(spark, spec, version=2)
    # keep_last=5 retains 995..999, all of which reference every data dir
    assert deleted == []
    # versions 995+ reference all three commits' dirs -> nothing doomed,
    # but vacuum to the head-only horizon must now drop v0/v1's exclusives
    deleted2 = vacuum_snapshots(spec, keep_last=1)
    assert deleted2 == []  # head (v999) still references rel_v2 = all dirs


def test_concurrent_append_rebases(spark, tmp_path):
    """Two writers race for the same version: the loser's append rebases
    onto the winner's head — one winner per version, no lost update
    (VERDICT r6 item 3)."""
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)

    def competing_commit():
        snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)

    v = snapshot_write(
        spark.createDataFrame([(3, "c")], ["id", "v"]),
        spec,
        _pre_commit=competing_commit,
    )
    # loser targeted v1, competitor won it, loser rebased to v2
    assert v == 2 and current_version(spec) == 2
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    # the competitor's intermediate version holds exactly its own view
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b")}


def test_concurrent_overwrite_aborts(spark, tmp_path):
    """An overwrite that loses a commit race must raise, not clobber the
    concurrent commit it never read (VERDICT r6 item 3)."""
    from creatorops_lakehouse_spark.sources.snapshots import SnapshotConflictError

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)

    def competing_commit():
        snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)

    with pytest.raises(SnapshotConflictError, match="concurrent writer"):
        snapshot_write(
            spark.createDataFrame([(9, "z")], ["id", "v"]),
            spec,
            mode="overwrite",
            _pre_commit=competing_commit,
        )
    # the concurrent append survives untouched
    assert current_version(spec) == 1
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b")}


def test_threaded_appends_no_lost_update(spark, tmp_path):
    """Eight truly concurrent appenders: every row lands exactly once,
    versions are contiguous, each version has exactly one manifest."""
    import concurrent.futures

    from creatorops_lakehouse_spark.sources.snapshots import _loose_versions

    spec = TableSpec("t.snap", str(tmp_path / "t"))

    def write_one(i: int) -> int:
        return snapshot_write(
            spark.createDataFrame([(i, f"w{i}")], ["id", "v"]), spec
        )

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(write_one, range(8)))
    assert sorted(versions) == list(range(8))  # one winner per version
    assert _loose_versions(spec) == list(range(8))
    assert _rows(snapshot_read(spark, spec)) == {(i, f"w{i}") for i in range(8)}


def test_schema_enforcement_rejects_drift(spark, tmp_path):
    """Schema-on-write: an append whose columns drift from the table schema
    raises instead of landing unreadable parquet (Delta's enforcement)."""
    from creatorops_lakehouse_spark.sources.snapshots import SchemaMismatchError

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    with pytest.raises(SchemaMismatchError, match="drifts"):
        snapshot_write(
            spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]), spec
        )
    # type change on an existing column is drift even under merge_schema
    with pytest.raises(SchemaMismatchError, match="column types"):
        snapshot_write(
            spark.createDataFrame([("x", "b")], ["id", "v"]),
            spec,
            merge_schema=True,
        )
    assert current_version(spec) == 0  # nothing committed


def test_schema_evolution_additive(spark, tmp_path):
    """merge_schema=True appends new columns; the evolved head reads old
    files with nulls, time travel keeps the pre-evolution schema, and
    column ORDER/nullability differences are not drift."""
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(
        spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]),
        spec,
        merge_schema=True,
    )
    head = snapshot_read(spark, spec)
    assert head.columns == ["id", "v", "score"]
    got = {(r.id, r.v, r.score) for r in head.collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}
    # pre-evolution time travel: old schema, no phantom column
    assert snapshot_read(spark, spec, version=0).columns == ["id", "v"]
    # reordered columns are not drift (projection is by name)
    snapshot_write(
        spark.createDataFrame([("c", 3, 1.5)], ["v", "id", "score"])
        .select("v", "id", "score"),
        spec,
    )
    assert snapshot_read(spark, spec).columns == ["id", "v", "score"]
    assert snapshot_read(spark, spec).count() == 3
    # overwrite replaces the schema outright (overwriteSchema semantics)
    snapshot_write(
        spark.createDataFrame([(7, True)], ["k", "flag"]), spec, mode="overwrite"
    )
    assert snapshot_read(spark, spec).columns == ["k", "flag"]
    # rollback to the evolved append restores that version's schema
    rollback(spec, 2)
    assert snapshot_read(spark, spec).columns == ["id", "v", "score"]


def test_schema_evolution_partitioned(spark, tmp_path):
    """Evolution works under hive partitioning: the pinned manifest schema
    includes the partition column and old commits project with nulls."""
    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("p",))
    snapshot_write(
        spark.createDataFrame([(1, "a", "x")], ["id", "v", "p"]), spec
    )
    snapshot_write(
        spark.createDataFrame([(2, "b", 4, "y")], ["id", "v", "extra", "p"]),
        spec,
        merge_schema=True,
    )
    head = snapshot_read(spark, spec)
    got = {(r.id, r.v, r.extra, r.p) for r in head.collect()}
    assert got == {(1, "a", None, "x"), (2, "b", 4, "y")}


def test_stats_pruned_read(spark, tmp_path):
    """Manifest min/max stats skip commits whose range is provably
    disjoint; the residual filter keeps semantics exact (the snapshot
    analogue of Delta data skipping)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.range(0, 100).selectExpr("id", "id * 2 AS v"), spec)
    snapshot_write(spark.range(100, 200).selectExpr("id", "id * 2 AS v"), spec)
    snapshot_write(spark.range(200, 300).selectExpr("id", "id * 2 AS v"), spec)

    kept, skipped = pruned_dirs(spec, {"id": (120, 150)})
    assert len(kept) == 1 and len(skipped) == 2
    got = snapshot_read_where(spark, spec, {"id": (120, 150)})
    assert got.count() == 31
    assert {r.id for r in got.collect()} == set(range(120, 151))

    # boundary-touching commits are kept (max == lo)
    kept, skipped = pruned_dirs(spec, {"id": (99, 100)})
    assert len(kept) == 2 and len(skipped) == 1
    # all pruned -> empty frame with the table schema, no read error
    none = snapshot_read_where(spark, spec, {"id": (1000, 2000)})
    assert none.count() == 0 and none.columns == ["id", "v"]
    # multi-column AND: v range that excludes everything under id range
    kept, _ = pruned_dirs(spec, {"id": (0, 99), "v": (500, 600)})
    assert kept == []


def test_stats_disabled_commit_never_pruned(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.range(0, 100).selectExpr("id"), spec, stats_cols=())
    snapshot_write(spark.range(100, 200).selectExpr("id"), spec)
    kept, skipped = pruned_dirs(spec, {"id": (500, 600)})
    # stats-less commit is conservatively kept; stats-bearing one pruned
    assert len(kept) == 1 and len(skipped) == 1
    assert snapshot_read_where(spark, spec, {"id": (500, 600)}).count() == 0


def test_stats_timestamp_pruning_and_vacuum_survival(spark, tmp_path):
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        pruned_dirs,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    for month in ("2024-01", "2024-02", "2024-03"):
        df = spark.range(3).select(
            F.col("id"),
            F.to_timestamp(F.lit(f"{month}-15 12:00:00")).alias("ts"),
        )
        snapshot_write(df, spec)
    kept, skipped = pruned_dirs(
        spec, {"ts": ("2024-02-01 00:00:00", "2024-02-28 23:59:59")}
    )
    assert len(kept) == 1 and len(skipped) == 2
    got = snapshot_read_where(
        spark, spec, {"ts": ("2024-02-01 00:00:00", "2024-02-28 23:59:59")}
    )
    assert got.count() == 3
    # stats survive checkpoint folding (manifests ride into the body)
    checkpoint_manifest(spec)
    kept2, skipped2 = pruned_dirs(
        spec, {"ts": ("2024-02-01 00:00:00", "2024-02-28 23:59:59")}
    )
    assert (kept2, skipped2) == (kept, skipped)


def test_snapshot_merge_rewrites_only_affected_commits(spark, tmp_path):
    """MERGE upsert: matched keys replaced, new keys inserted, and commits
    whose stats prove them disjoint from the source key range carry into
    the new manifest UNTOUCHED (Delta's file-level MERGE shape)."""
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_merge

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.range(0, 100).selectExpr("id", "id * 2 AS v"), spec)
    snapshot_write(spark.range(100, 150).selectExpr("id", "id * 2 AS v"), spec)
    snapshot_write(spark.range(200, 300).selectExpr("id", "id * 2 AS v"), spec)
    before = snapshot_dirs(spec, 2)

    # source envelope [120, 160]: updates two middle-commit keys, inserts a
    # new key in the unoccupied gap — envelope disjoint from commits 0 and 2
    source = spark.createDataFrame(
        [(120, -1), (140, -2), (160, -3)], ["id", "v"]
    )
    v = snapshot_merge(spark, spec, source, keys=["id"])
    assert v == 3
    after = snapshot_dirs(spec, 3)
    # commits 0 and 2 carried untouched; commit 1 replaced by the rewrite
    assert before[0] in after and before[2] in after and before[1] not in after
    assert len(after) == 3
    head = snapshot_read(spark, spec)
    assert head.count() == 251  # 250 + 1 inserted
    got = {r.id: r.v for r in head.filter("id IN (120, 140, 160, 10)").collect()}
    assert got == {120: -1, 140: -2, 160: -3, 10: 20}
    # time travel: pre-merge head intact
    assert snapshot_read(spark, spec, version=2).filter("id = 120").collect()[0].v == 240


def test_snapshot_merge_schema_must_match(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        SchemaMismatchError,
        snapshot_merge,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.range(5).selectExpr("id", "id * 2 AS v"), spec)
    with pytest.raises(SchemaMismatchError, match="must match"):
        snapshot_merge(
            spark, spec, spark.range(3).selectExpr("id"), keys=["id"]
        )


def test_snapshot_delete_where(spark, tmp_path):
    """Row-level delete rewrites only intersecting commits; disjoint
    predicate is a version-less no-op."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.range(0, 100).selectExpr("id", "id * 2 AS v"), spec)
    snapshot_write(spark.range(100, 200).selectExpr("id", "id * 2 AS v"), spec)
    before = snapshot_dirs(spec, 1)

    v = snapshot_delete_where(spark, spec, {"id": (120, 129)})
    assert v == 2
    after = snapshot_dirs(spec, 2)
    assert before[0] in after and before[1] not in after
    head = snapshot_read(spark, spec)
    assert head.count() == 190
    assert head.filter("id BETWEEN 120 AND 129").count() == 0
    # history keeps the deleted rows until vacuum (governance pairing)
    assert snapshot_read(spark, spec, version=1).count() == 200
    # provably-disjoint predicate: no rewrite, same version
    assert snapshot_delete_where(spark, spec, {"id": (10_000, 20_000)}) == 2


def test_optimize_snapshots_packs_head(spark, tmp_path):
    """OPTIMIZE parity: head's many commit dirs pack into one; content is
    preserved, history stays time-travelable, vacuum then reclaims the
    small dirs; max_dirs guards the maintenance loop."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
        snapshot_history,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    for i in range(5):
        snapshot_write(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id * 2 AS v"),
            spec,
        )
    assert len(snapshot_dirs(spec, 4)) == 5
    # under the guard threshold: skipped, no new version
    assert optimize_snapshots(spark, spec, max_dirs=10) is None
    v = optimize_snapshots(spark, spec, max_dirs=3)
    assert v == 5 and len(snapshot_dirs(spec, 5)) == 1
    head = snapshot_read(spark, spec)
    assert head.count() == 50
    assert {r.id for r in head.collect()} == set(range(50))
    # pre-optimize history still readable
    assert snapshot_read(spark, spec, version=2).count() == 30
    hist = snapshot_history(spec)
    assert [h["mode"] for h in hist] == ["append"] * 5 + ["optimize"]
    # numRecords operation metric: cumulative per version, metadata-only
    assert [h["n_rows"] for h in hist] == [10, 20, 30, 40, 50, 50]
    # vacuum reclaims the five small dirs
    deleted = vacuum_snapshots(spec, keep_last=1)
    assert len(deleted) == 5
    assert snapshot_read(spark, spec).count() == 50
    # packed commit keeps data-skipping stats (union of old ranges)
    from creatorops_lakehouse_spark.sources.snapshots import pruned_dirs

    kept, skipped = pruned_dirs(spec, {"id": (100, 200)})
    assert kept == [] and len(skipped) == 1


def test_txn_write_idempotent_replay(spark, tmp_path):
    """snapshot_write_txn: a redelivered (app_id, txn_version) is a no-op —
    no new rows, no new version, no new data dir — while a NEW txn version
    commits normally; watermarks are per-app."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        last_txn_version,
        snapshot_write_txn,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    b1 = spark.createDataFrame([(3, "c")], ["id", "v"])

    assert snapshot_write_txn(b0, spec, app_id="s1", txn_version=0) == 0
    # exact replay of batch 0: skipped
    assert snapshot_write_txn(b0, spec, app_id="s1", txn_version=0) == 0
    assert current_version(spec) == 0
    assert snapshot_write_txn(b1, spec, app_id="s1", txn_version=1) == 1
    # LATE replay of batch 0 after batch 1 (out-of-order redelivery):
    # still skipped — the watermark is monotonic, not exact-match
    assert snapshot_write_txn(b0, spec, app_id="s1", txn_version=0) == 1
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    assert len(snapshot_dirs(spec, 1)) == 2  # one data dir per real commit
    # a DIFFERENT app with the same txn version is independent
    assert snapshot_write_txn(b1, spec, app_id="s2", txn_version=0) == 2
    assert last_txn_version(spec, "s1") == 1
    assert last_txn_version(spec, "s2") == 0
    assert last_txn_version(spec, "nope") is None


def test_txn_watermarks_survive_other_writes(spark, tmp_path):
    """The txns map rides through plain appends, overwrite, rollback, and
    rewrite commits (delete), so interleaved batch maintenance can never
    re-open the exactly-once window."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        last_txn_version,
        snapshot_delete_where,
        snapshot_write_txn,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    snapshot_write_txn(b0, spec, app_id="s1", txn_version=0)
    # interleave: plain append, row-level delete, overwrite, rollback
    snapshot_write(spark.createDataFrame([(9, "z")], ["id", "v"]), spec)
    snapshot_delete_where(spark, spec, {"id": (9, 9)})
    assert last_txn_version(spec, "s1") == 0
    snapshot_write(
        spark.createDataFrame([(7, "q")], ["id", "v"]), spec, mode="overwrite"
    )
    assert last_txn_version(spec, "s1") == 0
    rollback(spec, 0)
    assert last_txn_version(spec, "s1") == 0
    # replay of batch 0 after all that: still skipped
    head = current_version(spec)
    assert snapshot_write_txn(b0, spec, app_id="s1", txn_version=0) == head


def test_txn_race_same_batch_single_commit(spark, tmp_path):
    """Two racing deliveries of the SAME batch: exactly one commits; the
    loser backs off at rebase time (its data dir stays orphaned and
    unreferenced, reaped by vacuum)."""
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_write_txn

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(0, "seed")], ["id", "v"]), spec)
    b = spark.createDataFrame([(1, "a")], ["id", "v"])

    def rival():
        # fires between the loser's data write and its commit attempt:
        # the SAME batch lands from a concurrent delivery
        snapshot_write_txn(b, spec, app_id="s1", txn_version=0)

    got = snapshot_write(
        b, spec, _txn=("s1", 0), _pre_commit=rival
    )
    assert got == current_version(spec) == 1
    assert _rows(snapshot_read(spark, spec)) == {(0, "seed"), (1, "a")}
    # loser's orphan dir exists on disk but no manifest references it.
    # Plain vacuum leaves it (it might be a concurrent writer's in-flight
    # dir); the uncommitted-file cleanup with a grace window reaps it —
    # Delta VACUUM's exact split.
    data_root = os.path.join(spec.path, "data")
    assert len(os.listdir(data_root)) == 3  # seed + winner + orphan
    vacuum_snapshots(spec, keep_last=1)
    assert len(os.listdir(data_root)) == 3
    vacuum_snapshots(spec, keep_last=1, orphan_grace_s=0)
    assert len(os.listdir(data_root)) == 2
    assert _rows(snapshot_read(spark, spec)) == {(0, "seed"), (1, "a")}


def test_streaming_exactly_once_sink(spark, tmp_path):
    """End-to-end: a real availableNow stream through start_exactly_once_sink
    lands every input row exactly once; re-running the stream over the same
    checkpoint (no new input) and REPLAYING batch bodies out-of-band both
    leave the table unchanged."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        last_txn_version,
        snapshot_read,
        snapshot_write_txn,
    )
    from creatorops_lakehouse_spark.streaming.pipeline import (
        start_exactly_once_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text("1,a\n2,b\n")
    (src / "b.csv").write_text("3,c\n")
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("id INT, v STRING")
            .option("maxFilesPerTrigger", 1)  # force >1 micro-batch
            .csv(str(src))
        )
        q = start_exactly_once_sink(stream, spec, ckpt, app_id="ingest")
        q.awaitTermination(120)

    run()
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    n_versions = current_version(spec) + 1
    assert n_versions == 2  # one commit per micro-batch
    assert last_txn_version(spec, "ingest") == 1

    # restart over the same checkpoint with no new files: no-op
    run()
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    assert current_version(spec) + 1 == 2

    # crash-redelivery simulation: the sink body re-runs for already-
    # committed batch ids (what foreachBatch does after a mid-commit crash)
    for bid, rows in ((0, [(1, "a"), (2, "b")]), (1, [(3, "c")])):
        snapshot_write_txn(
            spark.createDataFrame(rows, ["id", "v"]),
            spec,
            app_id="ingest",
            txn_version=bid,
        )
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    assert current_version(spec) + 1 == 2

    # new file arrives -> batch 2 commits exactly once
    (src / "c.csv").write_text("4,d\n")
    run()
    assert _rows(snapshot_read(spark, spec)) == {
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    }
    assert last_txn_version(spec, "ingest") == 2


def test_snapshot_count_metadata_only(spark, tmp_path):
    """snapshot_count answers COUNT(*) from the manifest without touching
    data files — across append, overwrite, time travel, delete-rewrite,
    optimize, and rollback — and returns None for pre-rowcount manifests
    (scan fallback)."""
    import json as _json
    import shutil as _shutil

    from creatorops_lakehouse_spark.sources.snapshots import (
        _manifest_dir,
        optimize_snapshots,
        snapshot_count,
        snapshot_delete_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    assert snapshot_count(spec) == 0  # empty table
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)
    assert snapshot_count(spec) == 3
    assert snapshot_count(spec, version=0) == 2
    snapshot_delete_where(spark, spec, {"id": (2, 3)})
    assert snapshot_count(spec) == snapshot_read(spark, spec).count() == 1
    snapshot_write(
        spark.range(7).selectExpr("id", "'x' AS v"), spec, mode="overwrite"
    )
    assert snapshot_count(spec) == 7
    optimize_snapshots(spark, spec)
    assert snapshot_count(spec) == 7
    rollback(spec, 2)
    assert snapshot_count(spec) == 1
    # metadata-only: physically delete every data dir — count still answers
    _shutil.rmtree(str(tmp_path / "t" / "data"))
    assert snapshot_count(spec) == 1
    # legacy manifest without row counts -> None (caller scans)
    head = current_version(spec)
    p = os.path.join(_manifest_dir(spec), f"v{head}.json")
    with open(p) as f:
        m = _json.load(f)
    del m["rows"]
    with open(p, "w") as f:
        _json.dump(m, f)
    assert snapshot_count(spec) is None


def test_optimize_zorder_multi_dir_skipping(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY on the snapshot log: the head rewrites into
    range-bucketed commit dirs whose per-dir stats make point predicates
    prune most of the table; content, counts, time travel, and vacuum all
    stay intact."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
        pruned_dirs,
        snapshot_count,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # two appends whose x-ranges fully overlap: pre-optimize, stats can
    # prune NOTHING for any x predicate
    snapshot_write(
        spark.range(0, 4000).selectExpr(
            "id AS x", "(id * 37) % 4000 AS y", "id AS payload"
        ),
        spec,
    )
    snapshot_write(
        spark.range(0, 4000).selectExpr(
            "id AS x", "(id * 91) % 4000 AS y", "id + 10000 AS payload"
        ),
        spec,
    )
    kept0, skipped0 = pruned_dirs(spec, {"x": (100, 120)})
    assert skipped0 == []  # overlapping appends: no skipping possible

    v = optimize_snapshots(spark, spec, zorder_by=["x", "y"], target_dirs=8)
    assert v == 2
    # range sampling seeds off session history (RDD ids), so the PHYSICAL
    # bucket count can land under target_dirs — layout is best-effort
    # (exactly like Delta's OPTIMIZE file counts); semantics below are
    # what must hold
    n_dirs = len(snapshot_dirs(spec, v))
    assert 4 <= n_dirs <= 8
    head = snapshot_read(spark, spec)
    assert head.count() == 8000
    assert snapshot_count(spec) == 8000  # per-bucket row counts recorded
    assert (
        head.selectExpr("sum(payload)").collect()[0][0]
        == 2 * sum(range(4000)) + 10000 * 4000
    )
    # clustered stats now prune for a point range on EITHER column
    kept_x, skipped_x = pruned_dirs(spec, {"x": (100, 120)})
    assert len(skipped_x) >= n_dirs // 2, (kept_x, skipped_x)
    kept_y, skipped_y = pruned_dirs(spec, {"y": (100, 120)})
    assert len(skipped_y) >= n_dirs // 2, (kept_y, skipped_y)
    got = snapshot_read_where(spark, spec, {"x": (100, 120)}).filter(
        "x BETWEEN 100 AND 120"
    )
    assert got.count() == 42  # 21 x-values, two rows each
    # time travel to the pre-optimize head still works
    assert snapshot_read(spark, spec, version=1).count() == 8000
    # vacuum reclaims the two old append dirs; bucket dirs survive
    deleted = vacuum_snapshots(spec, keep_last=1, orphan_grace_s=0)
    assert len(deleted) == 2
    assert snapshot_read(spark, spec).count() == 8000
    assert len(snapshot_dirs(spec, v)) == n_dirs


def _set_committed_at(spec, version, ts):
    import json as _json

    from creatorops_lakehouse_spark.sources.snapshots import _manifest_dir

    p = os.path.join(_manifest_dir(spec), f"v{version}.json")
    with open(p) as f:
        m = _json.load(f)
    m["committed_at"] = ts
    with open(p, "w") as f:
        _json.dump(m, f)


def test_timestamp_as_of_and_retain_hours(spark, tmp_path):
    """Delta's time-based surface: timestampAsOf resolves the head as of
    a UTC instant, and VACUUM RETAIN N HOURS keeps every version inside
    the window (plus the head) while dropping older history."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_history,
        version_as_of,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)
    for v, ts in ((0, "2026-08-10 00:00:00"), (1, "2026-08-12 00:00:00"),
                  (2, "2026-08-14 00:00:00")):
        _set_committed_at(spec, v, ts)

    assert version_as_of(spec, "2026-08-12 00:00:00") == 1  # inclusive
    assert version_as_of(spec, "2026-08-13 09:00:00") == 1
    assert version_as_of(spec, "2026-08-20 00:00:00") == 2
    assert _rows(snapshot_read(spark, spec, timestamp="2026-08-11 00:00:00")) == {
        (1, "a")
    }
    with pytest.raises(ValueError, match="at or before"):
        version_as_of(spec, "2026-08-01 00:00:00")
    with pytest.raises(ValueError, match="not both"):
        snapshot_read(spark, spec, version=1, timestamp="2026-08-12 00:00:00")
    assert [h["committed_at"] for h in snapshot_history(spec)] == [
        "2026-08-10 00:00:00", "2026-08-12 00:00:00", "2026-08-14 00:00:00",
    ]

    # RETAIN 72 HOURS as of Aug 15: v0 (5 days old) drops, v1/v2 retained.
    # Appends share data dirs, so no dir frees — v0's MANIFEST is gone.
    deleted = vacuum_snapshots(
        spec, retain_hours=72, _now="2026-08-15 00:00:00"
    )
    assert deleted == []
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_read(spark, spec, version=0)
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b")}
    # the head survives ANY window, even one that excludes everything
    vacuum_snapshots(spec, retain_hours=1, _now="2026-09-01 00:00:00")
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}
    with pytest.raises(ValueError, match="unknown snapshot"):
        snapshot_read(spark, spec, version=1)


def test_pyds_timestamp_as_of(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.pyds import register_snapshot_source

    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)
    _set_committed_at(spec, 0, "2026-08-10 00:00:00")
    _set_committed_at(spec, 1, "2026-08-14 00:00:00")
    got = (
        spark.read.format("snapshot")
        .option("path", spec.path)
        .option("timestampAsOf", "2026-08-11 00:00:00")
        .load()
    )
    assert _rows(got) == {(1, "a")}


def test_optimize_zorder_partitioned_spec(spark, tmp_path):
    """ZORDER optimize on a hive-partitioned spec: partition columns nest
    under each bucket subdir, reads rediscover them, content and counts
    survive."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
        snapshot_count,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("p",))
    snapshot_write(
        spark.range(0, 400).selectExpr(
            "id AS x", "id % 7 AS y", "CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END AS p"
        ),
        spec,
    )
    v = optimize_snapshots(spark, spec, zorder_by=["x", "y"], target_dirs=4)
    assert 2 <= len(snapshot_dirs(spec, v)) <= 4
    head = snapshot_read(spark, spec)
    assert head.count() == 400 and snapshot_count(spec) == 400
    assert head.filter("p = 'e'").count() == 200
    assert head.selectExpr("sum(x)").collect()[0][0] == sum(range(400))


def test_check_constraints_enforced_on_write(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        ConstraintViolationError,
        add_check_constraint,
        drop_check_constraint,
        table_constraints,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    v = add_check_constraint(spark, spec, "id_positive", "id > 0")
    assert v == 1 and table_constraints(spec) == {"id_positive": "id > 0"}
    # metadata-only commit: content unchanged, still time-travelable
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b")}

    # violating append refuses BEFORE committing (no new version, no data)
    with pytest.raises(ConstraintViolationError, match="id_positive"):
        snapshot_write(spark.createDataFrame([(-5, "x")], ["id", "v"]), spec)
    assert current_version(spec) == 1

    # NULL passes (SQL-standard CHECK), and constraints survive overwrite
    import pyspark.sql.functions as F

    nullrow = spark.createDataFrame([("n",)], ["v"]).select(
        F.lit(None).cast("long").alias("id"), "v"
    )
    v2 = snapshot_write(nullrow, spec, mode="overwrite")
    assert v2 == 2 and table_constraints(spec) == {"id_positive": "id > 0"}
    with pytest.raises(ConstraintViolationError):
        snapshot_write(spark.createDataFrame([(0, "y")], ["id", "v"]), spec)

    # drop lifts enforcement
    v3 = drop_check_constraint(spec, "id_positive")
    assert v3 == 3 and table_constraints(spec) == {}
    snapshot_write(spark.createDataFrame([(0, "y")], ["id", "v"]), spec)


def test_add_constraint_validates_existing_data(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        ConstraintViolationError,
        add_check_constraint,
        table_constraints,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (-2, "b")], ["id", "v"]), spec)
    with pytest.raises(ConstraintViolationError, match="existing data"):
        add_check_constraint(spark, spec, "id_positive", "id > 0")
    assert table_constraints(spec) == {} and current_version(spec) == 0


def test_constraints_survive_merge_and_rollback(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        ConstraintViolationError,
        add_check_constraint,
        snapshot_merge,
        table_constraints,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    add_check_constraint(spark, spec, "v_nonempty", "length(v) > 0")
    # merge whose source violates -> refused before any commit
    with pytest.raises(ConstraintViolationError, match="v_nonempty"):
        snapshot_merge(
            spark, spec, spark.createDataFrame([(2, "")], ["id", "v"]), ["id"]
        )
    v = snapshot_merge(
        spark, spec, spark.createDataFrame([(2, "B")], ["id", "v"]), ["id"]
    )
    assert table_constraints(spec) == {"v_nonempty": "length(v) > 0"}
    rollback(spec, 0)
    # RESTORE keeps table properties (constraints), like Delta
    assert table_constraints(spec) == {"v_nonempty": "length(v) > 0"}
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b")}


def test_shallow_clone_zero_copy_independent(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_clone

    src = TableSpec("t.src", str(tmp_path / "src"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), src)
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), src)

    dst = TableSpec("t.dst", str(tmp_path / "dst"))
    assert snapshot_clone(src, dst, shallow=True) == 0
    assert _rows(snapshot_read(spark, dst)) == {(1, "a"), (2, "b"), (3, "c")}
    # zero data files under the clone's root (manifest-only)
    assert not os.path.isdir(os.path.join(dst.path, "data"))

    # divergence is independent in both directions
    snapshot_write(spark.createDataFrame([(4, "d")], ["id", "v"]), dst)
    snapshot_write(spark.createDataFrame([(9, "z")], ["id", "v"]), src)
    assert _rows(snapshot_read(spark, dst)) == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    assert _rows(snapshot_read(spark, src)) == {(1, "a"), (2, "b"), (3, "c"), (9, "z")}

    # clone vacuum never deletes source-owned (absolute) dirs
    snapshot_write(
        spark.createDataFrame([(7, "q")], ["id", "v"]), dst, mode="overwrite"
    )
    deleted = vacuum_snapshots(dst, keep_last=1)
    assert all(not os.path.isabs(d) for d in deleted)
    assert _rows(snapshot_read(spark, src)) == {(1, "a"), (2, "b"), (3, "c"), (9, "z")}

    # clone target must be empty; spec shape must match
    with pytest.raises(ValueError, match="already has snapshots"):
        snapshot_clone(src, dst)


def test_clone_at_version_and_deep_survives_source_vacuum(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_clone

    src = TableSpec("t.src", str(tmp_path / "src"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), src)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), src)

    deep = TableSpec("t.deep", str(tmp_path / "deep"))
    snapshot_clone(src, deep, version=0, shallow=False)
    assert _rows(snapshot_read(spark, deep)) == {(1, "a")}

    # source history vanishes entirely: deep clone is self-contained
    snapshot_write(
        spark.createDataFrame([(9, "z")], ["id", "v"]), src, mode="overwrite"
    )
    vacuum_snapshots(src, keep_last=1)
    assert _rows(snapshot_read(spark, deep)) == {(1, "a")}


def test_clone_carries_constraints_and_stats(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        ConstraintViolationError,
        add_check_constraint,
        snapshot_clone,
        snapshot_count,
        table_constraints,
    )

    src = TableSpec("t.src", str(tmp_path / "src"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), src)
    add_check_constraint(spark, src, "id_positive", "id > 0")

    dst = TableSpec("t.dst", str(tmp_path / "dst"))
    snapshot_clone(src, dst, shallow=True)
    assert table_constraints(dst) == {"id_positive": "id > 0"}
    with pytest.raises(ConstraintViolationError):
        snapshot_write(spark.createDataFrame([(-1, "x")], ["id", "v"]), dst)
    # row-count stats remapped: COUNT(*) stays metadata-only on the clone
    assert snapshot_count(dst) == 2


def test_update_where_stats_bounded(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs as _dirs,
        snapshot_update_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # two disjoint key bands, one commit each
    snapshot_write(
        spark.createDataFrame([(i, 100) for i in range(10)], ["id", "cents"]),
        spec,
    )
    snapshot_write(
        spark.createDataFrame([(i, 100) for i in range(50, 60)], ["id", "cents"]),
        spec,
    )
    band0_dirs = set(_dirs(spec, 1)) - set(_dirs(spec, 0))  # v1's new dir
    v = snapshot_update_where(
        spark, spec, {"id": (52, 55)}, {"cents": "cents + 23"}
    )
    assert v == 2
    # band-0 commit dir carried byte-untouched (stats bounded the rewrite)
    assert set(_dirs(spec, 0)) <= set(_dirs(spec, 2))
    assert not band0_dirs & set(_dirs(spec, 2))
    got = {
        (r.id, r.cents) for r in snapshot_read(spark, spec).collect()
    }
    want = {(i, 100) for i in range(10)}
    want |= {(i, 123 if 52 <= i <= 55 else 100) for i in range(50, 60)}
    assert got == want
    # time travel: pre-update head unchanged
    pre = {(r.id, r.cents) for r in snapshot_read(spark, spec, version=1).collect()}
    assert pre == {(i, 100) for i in range(10)} | {
        (i, 100) for i in range(50, 60)
    }
    # schema (types) preserved despite the arithmetic SET expression
    assert dict(snapshot_read(spark, spec).dtypes)["cents"] == "bigint"

    # stats prove nothing matches -> pure no-op, same head version
    assert snapshot_update_where(
        spark, spec, {"id": (1000, 2000)}, {"cents": "0"}
    ) == 2
    with pytest.raises(ValueError, match="SET columns not in table"):
        snapshot_update_where(spark, spec, {"id": (0, 1)}, {"nope": "1"})


def test_update_where_enforces_constraints(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        ConstraintViolationError,
        add_check_constraint,
        snapshot_update_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, 100), (2, 100)], ["id", "cents"]), spec)
    add_check_constraint(spark, spec, "cents_nonneg", "cents >= 0")
    with pytest.raises(ConstraintViolationError, match="cents_nonneg"):
        snapshot_update_where(spark, spec, {"id": (1, 1)}, {"cents": "-5"})
    # refused update committed nothing
    assert {(r.id, r.cents) for r in snapshot_read(spark, spec).collect()} == {
        (1, 100),
        (2, 100),
    }


def test_bloom_point_lookup_pruning(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # two commits whose id RANGES fully overlap (evens vs odds in [0,100)),
    # so min/max stats can never prune a point lookup — only the bloom can
    evens = spark.createDataFrame([(i, "e") for i in range(0, 100, 2)], ["id", "v"])
    odds = spark.createDataFrame([(i, "o") for i in range(1, 100, 2)], ["id", "v"])
    snapshot_write(evens, spec, bloom_for=("id",))
    snapshot_write(odds, spec, bloom_for=("id",))
    d0 = snapshot_dirs(spec, 0)[0]

    # no false negatives: every present value keeps its true dir
    for probe in (0, 42, 98, 1, 43, 99):
        kept, _ = pruned_dirs(spec, {"id": (probe, probe)})
        true_dir = d0 if probe % 2 == 0 else None
        names = [os.path.join(spec.path, k) for k in kept]
        if probe % 2 == 0:
            assert d0 in names
        else:
            assert d0 not in names or len(names) == 2  # fp keeps, never drops
    # bloom pruned at least one foreign dir across the probes (data and
    # hashes are deterministic, so this pins actual skipping, not luck)
    skips = 0
    for probe in (0, 42, 98, 1, 43, 99):
        _, skipped = pruned_dirs(spec, {"id": (probe, probe)})
        skips += len(skipped)
    assert skips >= 4

    # equality read: pruned plan, exact semantics
    got = {
        tuple(r)
        for r in snapshot_read_where(spark, spec, {"id": (42, 42)})
        .select("id", "v")
        .collect()
    }
    assert got == {(42, "e")}
    # absent value: provably-empty read still returns the right schema
    assert (
        snapshot_read_where(spark, spec, {"id": (1000, 1000)}).count() == 0
    )
    # RANGE predicates ignore blooms (no false pruning on non-equality)
    kept, _ = pruned_dirs(spec, {"id": (10, 20)})
    assert len(kept) == 2


def test_bloom_carry_vacuum_and_clone(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_clone,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "a") for i in range(0, 50)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    snapshot_write(
        spark.createDataFrame([(i, "b") for i in range(1000, 1050)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    bdir = os.path.join(spec.path, "_bloom")
    assert len(os.listdir(bdir)) == 2

    # shallow clone probes the SOURCE's sidecars (absolute refs)
    dst = TableSpec("t.dst", str(tmp_path / "dst"))
    snapshot_clone(spec, dst, shallow=True)
    kept, skipped = pruned_dirs(dst, {"id": (1005, 1005)})
    assert len(kept) == 1 and len(skipped) == 1

    # overwrite drops both commits; vacuum reaps their orphaned sidecars
    snapshot_write(
        spark.createDataFrame([(7, "z")], ["id", "v"]),
        spec,
        mode="overwrite",
        bloom_for=("id",),
    )
    vacuum_snapshots(spec, keep_last=1)
    assert len(os.listdir(bdir)) == 1  # only the live head's sidecar

    # the clone's own vacuum never reaches into the source's _bloom dir
    snapshot_write(spark.createDataFrame([(8, "y")], ["id", "v"]), dst, mode="overwrite")
    vacuum_snapshots(dst, keep_last=1)
    assert len(os.listdir(bdir)) == 1


def test_deletion_vector_merge_on_read(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_count,
        snapshot_delete_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "a") for i in range(10)], ["id", "v"]), spec
    )
    snapshot_write(
        spark.createDataFrame([(i, "b") for i in range(50, 60)], ["id", "v"]),
        spec,
    )
    pre_dirs = set(snapshot_dirs(spec, 1))

    v = snapshot_delete_where(spark, spec, {"id": (52, 55)}, rewrite=False)
    assert v == 2
    # merge-on-read: ZERO data rewritten — the file set is byte-identical
    assert set(snapshot_dirs(spec, 2)) == pre_dirs
    got = _rows(snapshot_read(spark, spec))
    assert got == {(i, "a") for i in range(10)} | {
        (i, "b") for i in range(50, 60) if not 52 <= i <= 55
    }
    # time travel sees the pre-delete rows; COUNT stays metadata-only
    assert len(_rows(snapshot_read(spark, spec, version=1))) == 20
    assert snapshot_count(spec) == 16
    # stats-pruned equality read honors the vector too
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read_where

    assert snapshot_read_where(spark, spec, {"id": (53, 53)}).count() == 0
    assert snapshot_read_where(spark, spec, {"id": (51, 51)}).count() == 1

    # a LATER append re-inserting a deleted key is visible (the vector is
    # scoped to the dirs that existed at delete time)
    snapshot_write(spark.createDataFrame([(53, "new")], ["id", "v"]), spec)
    assert (53, "new") in _rows(snapshot_read(spark, spec))
    assert snapshot_count(spec) == 17
    # second, overlapping vector: counts stay exact (no double-subtract)
    snapshot_delete_where(spark, spec, {"id": (50, 56)}, rewrite=False)
    head = _rows(snapshot_read(spark, spec))
    assert head == {(i, "a") for i in range(10)} | {
        (i, "b") for i in range(57, 60)
    }
    # the re-inserted (53,'new') predates the SECOND vector's scope? No —
    # its dir existed at second-delete time, so 53 deletes again
    assert snapshot_count(spec) == len(head) == 13

    # rollback restores the single-vector state, vectors included
    rollback(spec, 2)
    assert snapshot_count(spec) == 16


def test_dv_dml_interplay_and_purge(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        purge_deletes,
        snapshot_count,
        snapshot_delete_where,
        snapshot_merge,
        snapshot_update_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, 100) for i in range(20)], ["id", "cents"]),
        spec,
    )
    snapshot_delete_where(spark, spec, {"id": (5, 9)}, rewrite=False)

    # UPDATE over the DV'd dir: deleted rows do NOT resurrect, and the
    # partially-trimmed vector drops its exact count (scan fallback)
    snapshot_update_where(spark, spec, {"id": (0, 3)}, {"cents": "cents + 1"})
    got = {(r.id, r.cents) for r in snapshot_read(spark, spec).collect()}
    assert got == {(i, 101 if i <= 3 else 100) for i in range(20) if not 5 <= i <= 9}
    # the rewrite consumed the only DV'd dir, so no vector survives
    from creatorops_lakehouse_spark.sources.snapshots import _read_manifest

    assert "dv" not in _read_manifest(spec, current_version(spec))

    # fresh vector; MERGE re-inserting a deleted key wins over the vector
    snapshot_delete_where(spark, spec, {"id": (10, 12)}, rewrite=False)
    snapshot_merge(
        spark,
        spec,
        spark.createDataFrame([(11, 777)], ["id", "cents"]),
        ["id"],
    )
    got = {(r.id, r.cents) for r in snapshot_read(spark, spec).collect()}
    assert (11, 777) in got and all(i not in (10, 12) for i, _ in got)

    # purge materializes: content identical, vectors gone, count exact
    pre = {(r.id, r.cents) for r in snapshot_read(spark, spec).collect()}
    v = purge_deletes(spark, spec)
    assert "dv" not in _read_manifest(spec, v)
    assert {(r.id, r.cents) for r in snapshot_read(spark, spec).collect()} == pre
    assert snapshot_count(spec) == len(pre)
    # idempotent: second purge is a no-op
    assert purge_deletes(spark, spec) == v


def test_dv_datasource_and_clone(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.pyds import register_snapshot_source
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_clone,
        snapshot_delete_where,
    )

    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "x") for i in range(10)], ["id", "v"]), spec
    )
    snapshot_delete_where(spark, spec, {"id": (3, 6)}, rewrite=False)

    via_ds = {
        tuple(r)
        for r in spark.read.format("snapshot")
        .option("path", spec.path)
        .load()
        .select("id", "v")
        .collect()
    }
    assert via_ds == _rows(snapshot_read(spark, spec))
    # time travel through the DataSource sees pre-delete rows
    pre = (
        spark.read.format("snapshot")
        .option("path", spec.path)
        .option("version", "0")
        .load()
        .count()
    )
    assert pre == 10

    # clones carry vectors (remapped dirs)
    dst = TableSpec("t.dst", str(tmp_path / "dst"))
    snapshot_clone(spec, dst, shallow=True)
    assert _rows(snapshot_read(spark, dst)) == _rows(snapshot_read(spark, spec))


def test_in_set_point_lookup_pruning(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # three commits: disjoint ranges for the first two, overlapping evens/
    # odds for the bloom case
    snapshot_write(
        spark.createDataFrame([(i, "a") for i in range(0, 100, 2)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    snapshot_write(
        spark.createDataFrame([(i, "b") for i in range(1, 100, 2)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    snapshot_write(
        spark.createDataFrame([(i, "c") for i in range(1000, 1050)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )

    # one IN-set spanning an even id and a far-band id: the odd commit
    # prunes (bloom rejects 42, stats reject 1007), both others keep
    kept, skipped = pruned_dirs(spec, {}, eq_in={"id": [42, 1007]})
    assert len(kept) == 2 and len(skipped) == 1
    got = {
        tuple(r)
        for r in snapshot_read_where(spark, spec, eq_in={"id": [42, 1007]})
        .select("id", "v")
        .collect()
    }
    assert got == {(42, "a"), (1007, "c")}

    # all values provably absent -> every dir prunes, empty exact read
    kept, skipped = pruned_dirs(spec, {}, eq_in={"id": [2001, 3001]})
    assert not kept and len(skipped) == 3
    assert snapshot_read_where(spark, spec, eq_in={"id": [2001, 3001]}).count() == 0

    # combined range + IN-set: range excludes the far band, IN-set the odds
    got = {
        tuple(r)
        for r in snapshot_read_where(
            spark, spec, {"id": (0, 100)}, eq_in={"id": [4, 5, 1004]}
        )
        .select("id", "v")
        .collect()
    }
    assert got == {(4, "a"), (5, "b")}


def test_optimize_rebuilds_blooms_and_min_max_metadata(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
        pruned_dirs,
        snapshot_delete_where,
        snapshot_min_max,
        snapshot_write,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # evens/odds: overlapping ranges so only blooms can prune point lookups
    snapshot_write(
        spark.createDataFrame([(i, "e") for i in range(0, 100, 2)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    snapshot_write(
        spark.createDataFrame([(i, "o") for i in range(1, 100, 2)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    assert snapshot_min_max(spec, "id") == (0, 99)

    # plain OPTIMIZE with bloom re-index: one dir, one fresh sidecar
    v = optimize_snapshots(spark, spec, bloom_for=("id",))
    from creatorops_lakehouse_spark.sources.snapshots import _read_manifest

    m = _read_manifest(spec, v)
    assert len(m["dirs"]) == 1 and set(m.get("bloom", {})) == set(m["dirs"])
    kept, skipped = pruned_dirs(spec, {"id": (5000, 5000)})
    assert not kept  # absent value: the re-indexed dir prunes

    # ZORDER optimize with per-bucket blooms: absent value prunes ALL
    # buckets; a present value keeps at most a couple (bloom ∧ z-range)
    v = optimize_snapshots(
        spark, spec, zorder_by=["id"], target_dirs=4, bloom_for=("id",)
    )
    m = _read_manifest(spec, v)
    assert len(m["dirs"]) == 4 and set(m.get("bloom", {})) == set(m["dirs"])
    kept, skipped = pruned_dirs(spec, {"id": (7777, 7777)})
    assert not kept
    kept, _ = pruned_dirs(spec, {"id": (42, 42)})
    assert 1 <= len(kept) <= 2
    assert snapshot_min_max(spec, "id") == (0, 99)

    # deletion vectors disable the metadata answer (envelope, not answer)
    snapshot_delete_where(spark, spec, {"id": (99, 99)}, rewrite=False)
    assert snapshot_min_max(spec, "id") is None


def test_partition_transforms_hidden_partitioning(spark, tmp_path):
    import datetime as dt

    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_count,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("days(ts)",))
    rows = [
        (i, dt.datetime(2026, 4, 1 + i % 3, 8 + i % 10), f"v{i}")
        for i in range(30)
    ]
    snapshot_write(
        spark.createDataFrame(rows, ["id", "ts", "v"]), spec
    )
    # hidden column: data files land under _p_days_ts=... hive dirs...
    data_root = os.path.join(spec.path, "data")
    commit = os.listdir(data_root)[0]
    hive_dirs = sorted(
        d for d in os.listdir(os.path.join(data_root, commit))
        if d.startswith("_p_days_ts=")
    )
    assert hive_dirs == [
        "_p_days_ts=2026-04-01", "_p_days_ts=2026-04-02", "_p_days_ts=2026-04-03"
    ]
    # ...but readers never see it
    head = snapshot_read(spark, spec)
    assert head.columns == ["id", "ts", "v"] and head.count() == 30
    assert snapshot_count(spec) == 30

    # a source-column time range prunes hive dirs inside the commit AND
    # stays exact
    got = snapshot_read_where(
        spark,
        spec,
        {"ts": (dt.datetime(2026, 4, 2, 0), dt.datetime(2026, 4, 2, 23))},
    )
    assert got.columns == ["id", "ts", "v"]
    assert {r.id for r in got.collect()} == {i for i in range(30) if i % 3 == 1}
    # the hive filter reached the scan as a PARTITION filter (hive-dir
    # pruning, not a row filter): inputFiles() reflects the pre-pruning
    # relation, so inspect the executed plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_p_days_ts" in pf[0]


def test_partition_transforms_bucket_and_truncate(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read_where,
    )

    spec = TableSpec(
        "t.snap",
        str(tmp_path / "t"),
        partition_by=("bucket(8, user)", "truncate(100, id)"),
    )
    rows = [(i, f"u{i % 20}", i % 7) for i in range(0, 500, 3)]
    snapshot_write(spark.createDataFrame(rows, ["id", "user", "x"]), spec)

    # bucket equality probe: the probe maps to ONE bucket partition filter
    got = snapshot_read_where(spark, spec, eq_in={"user": ["u7"]})
    assert {r.user for r in got.collect()} == {"u7"}
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_p_bucket8_user" in pf[0]

    # truncate range probe: id in [120, 180] needs only the 100-band
    got = snapshot_read_where(spark, spec, {"id": (120, 180)})
    assert {r.id for r in got.collect()} == {
        i for i in range(0, 500, 3) if 120 <= i <= 180
    }
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_p_truncate100_id" in pf[0]

    # DML over a transform-partitioned table keeps the layout consistent
    snapshot_delete_where(spark, spec, {"id": (0, 99)})
    got = snapshot_read(spark, spec)
    assert got.columns == ["id", "user", "x"]
    assert min(r.id for r in got.collect()) >= 100


def test_cdf_detect_updates_four_types(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "d")], ["id", "v"]
        ),
        spec,
    )
    snapshot_write(
        spark.createDataFrame(
            [(2, "B"), (3, "c"), (4, "d"), (5, "e")], ["id", "v"]
        ),
        spec,
        mode="overwrite",
    )
    got = {
        (r.id, r.v, r._change_type)
        for r in snapshot_diff(
            spark, spec, 0, 1, keys=["id"], detect_updates=True
        ).collect()
    }
    assert got == {
        (1, "a", "delete"),
        (5, "e", "insert"),
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
        (3, None, "update_preimage"),  # NULL -> value counts as a change
        (3, "c", "update_postimage"),
        # key 4 unchanged: emits nothing
    }
    # default stays the two-type key-level feed
    got2 = {
        r._change_type
        for r in snapshot_diff(spark, spec, 0, 1, keys=["id"]).collect()
    }
    assert got2 == {"insert", "delete"}


def test_dv_and_bloom_survive_checkpoint_folding(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        pruned_dirs,
        snapshot_count,
        snapshot_delete_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "e") for i in range(0, 50, 2)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    snapshot_write(
        spark.createDataFrame([(i, "o") for i in range(1, 50, 2)], ["id", "v"]),
        spec,
        bloom_for=("id",),
    )
    snapshot_delete_where(spark, spec, {"id": (10, 13)}, rewrite=False)

    checkpoint_manifest(spec)  # folds every manifest into c<N>.json
    # DV still applies through the checkpointed manifest
    got = _rows(snapshot_read(spark, spec))
    assert got == {(i, "e" if i % 2 == 0 else "o") for i in range(50) if not 10 <= i <= 13}
    assert snapshot_count(spec) == 46
    # bloom pointers still prune through the checkpointed manifest
    kept, skipped = pruned_dirs(spec, {"id": (2, 2)})
    assert len(kept) == 1 and len(skipped) == 1
    # time travel into the folded pre-delete history still works
    assert len(_rows(snapshot_read(spark, spec, version=1))) == 50


def test_dv_commit_aborts_on_concurrent_write(spark, tmp_path, monkeypatch):
    """A deletion-vector commit is read-modify-write (its dir scope and
    cardinality were computed against the head it read) — a concurrent
    commit racing it to the version wins and the DV delete aborts with
    SnapshotConflictError instead of publishing stale scope."""
    import creatorops_lakehouse_spark.sources.snapshots as S

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    # simulate the interleaving: the delete reads head v0, a competitor
    # commits v1 before the delete publishes — pin the delete's view of
    # the head at 0 while the competitor takes the v1 slot for real
    head = S._read_manifest(spec, 0)
    S._commit(spec, 1, {**head, "version": 1, "parent": 0, "mode": "append"})
    real_cv = S.current_version
    monkeypatch.setattr(
        S, "current_version", lambda sp: 0 if sp.path == spec.path else real_cv(sp)
    )
    with pytest.raises(S.SnapshotConflictError):
        S.snapshot_delete_where(spark, spec, {"id": (1, 1)}, rewrite=False)
    monkeypatch.undo()
    # nothing was lost: the winner's version is intact, no v2 appeared
    assert current_version(spec) == 1


def test_rename_column_metadata_only(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        drop_column,
        pruned_dirs,
        rename_column,
        snapshot_min_max,
        snapshot_read_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, f"x{i}") for i in range(10)], ["id", "v"]),
        spec,
        bloom_for=("v",),
    )
    pre_dirs = set(snapshot_dirs(spec, 0))
    v = rename_column(spec, "v", "label")
    assert v == 1 and set(snapshot_dirs(spec, 1)) == pre_dirs  # zero rewrite

    head = snapshot_read(spark, spec)
    assert head.columns == ["id", "label"]
    assert {(r.id, r.label) for r in head.collect()} == {
        (i, f"x{i}") for i in range(10)
    }
    # time travel reads the PRE-rename schema
    assert snapshot_read(spark, spec, version=0).columns == ["id", "v"]

    # appends written AFTER the rename use the logical name; old and new
    # files read back as one consistent table
    snapshot_write(
        spark.createDataFrame([(10, "x10")], ["id", "label"]), spec
    )
    assert {(r.id, r.label) for r in snapshot_read(spark, spec).collect()} == {
        (i, f"x{i}") for i in range(11)
    }
    # stats + bloom pruning translate the renamed probe column
    assert snapshot_min_max(spec, "label") == ("x0", "x9")
    kept, skipped = pruned_dirs(spec, {"label": ("x3", "x3")})
    assert len(kept) == 1 and len(skipped) == 1  # bloom pruned the append
    got = snapshot_read_where(spark, spec, {"label": ("x3", "x3")})
    assert [tuple(r) for r in got.collect()] == [(3, "x3")]

    # second rename composes (label -> tag still maps to physical 'v')
    rename_column(spec, "label", "tag")
    assert snapshot_read(spark, spec).columns == ["id", "tag"]
    assert snapshot_min_max(spec, "tag") == ("x0", "x9")

    # DROP COLUMN: metadata-only projection
    drop_column(spec, "tag")
    assert snapshot_read(spark, spec).columns == ["id"]
    with pytest.raises(ValueError, match="only column"):
        drop_column(spec, "id")


def test_rename_refusals_and_dml_after_rename(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import (
        add_check_constraint,
        drop_check_constraint,
        purge_deletes,
        rename_column,
        snapshot_delete_where,
        snapshot_merge,
        snapshot_update_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(1, 100), (2, 200)], ["id", "cents"]), spec
    )
    add_check_constraint(spark, spec, "cents_pos", "cents > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        rename_column(spec, "cents", "pennies")
    drop_check_constraint(spec, "cents_pos")
    snapshot_delete_where(spark, spec, {"id": (2, 2)}, rewrite=False)
    with pytest.raises(ValueError, match="deletion vector"):
        rename_column(spec, "id", "key")
    purge_deletes(spark, spec)
    rename_column(spec, "cents", "pennies")

    # MERGE and UPDATE speak the logical name; files keep the physical one
    snapshot_merge(
        spark,
        spec,
        spark.createDataFrame([(1, 111), (3, 333)], ["id", "pennies"]),
        ["id"],
    )
    snapshot_update_where(spark, spec, {"id": (3, 3)}, {"pennies": "pennies + 1"})
    got = {(r.id, r.pennies) for r in snapshot_read(spark, spec).collect()}
    assert got == {(1, 111), (3, 334)}

    # partition-spec columns refuse renames
    pspec = TableSpec("t.p", str(tmp_path / "p"), partition_by=("days(ts)",))
    import datetime as dt

    snapshot_write(
        spark.createDataFrame(
            [(1, dt.datetime(2026, 4, 1))], ["id", "ts"]
        ),
        pspec,
    )
    with pytest.raises(ValueError, match="partition spec"):
        rename_column(pspec, "ts", "event_time")


def test_rename_through_datasource(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.pyds import register_snapshot_source
    from creatorops_lakehouse_spark.sources.snapshots import rename_column

    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    rename_column(spec, "v", "label")
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "label"]), spec)

    df = spark.read.format("snapshot").option("path", spec.path).load()
    assert df.columns == ["id", "label"]
    assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, "b")}
    # equality pushdown on the renamed column still prunes via stats
    got = df.filter("label = 'b'")
    assert [tuple(r) for r in got.collect()] == [(2, "b")]


def test_schema_evolution_after_rename(spark, tmp_path):
    from creatorops_lakehouse_spark.sources.snapshots import rename_column

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    rename_column(spec, "v", "label")
    # additive evolution under a live column map: the new column appends
    # with its own (identity) physical name; old files null-fill it
    snapshot_write(
        spark.createDataFrame([(2, "b", 7)], ["id", "label", "extra"]),
        spec,
        merge_schema=True,
    )
    got = {
        tuple(r)
        for r in snapshot_read(spark, spec)
        .select("id", "label", "extra")
        .collect()
    }
    assert got == {(1, "a", None), (2, "b", 7)}
    # renaming the evolved column composes with the existing map
    rename_column(spec, "extra", "bonus")
    got = {
        tuple(r)
        for r in snapshot_read(spark, spec).select("id", "label", "bonus").collect()
    }
    assert got == {(1, "a", None), (2, "b", 7)}


# --- checkpoint/commit lost-update race (ADVICE r7 medium) ---------------


def test_commit_rejects_version_at_or_below_checkpoint(spark, tmp_path):
    """A lagging writer targeting a version the checkpoint already folded
    must conflict, not silently republish it (the fold deleted the loose
    file, so bare put-if-absent would succeed)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        _commit,
        checkpoint_manifest,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)
    checkpoint_manifest(spec)
    rel = [os.path.relpath(d, spec.path) for d in snapshot_dirs(spec, 0)]
    for stale in (0, 1):
        with pytest.raises(SnapshotConflictError, match="covered by checkpoint"):
            _commit(spec, stale, {"version": stale, "mode": "append", "dirs": rel})
    # history is intact and a fresh append still lands as v2
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b")}
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)
    assert current_version(spec) == 2


def test_commit_retracts_when_fold_races_inside_link_window(
    spark, tmp_path, monkeypatch
):
    """The exact ADVICE interleave: writer A commits v1; a checkpoint folds
    it (deleting the loose v1.json) AFTER lagging writer B's pre-check but
    BEFORE B's os.link — B's link succeeds, so the post-link verify must
    retract B's conflicting manifest and abort, leaving A's v1 in history."""
    import os as _os

    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        _commit,
        _read_manifest,
        checkpoint_manifest,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)
    original = _read_manifest(spec, 1)

    real_link = _os.link
    fired = {}

    def racing_link(src, dst, *a, **k):
        if dst.endswith("v1.json") and "x" not in fired:
            fired["x"] = True
            checkpoint_manifest(spec)  # the fold completes inside the window
        return real_link(src, dst, *a, **k)

    monkeypatch.setattr(_os, "link", racing_link)
    rel = [os.path.relpath(d, spec.path) for d in snapshot_dirs(spec, 0)]
    with pytest.raises(SnapshotConflictError, match="raced a checkpoint"):
        _commit(spec, 1, {"version": 1, "mode": "overwrite", "dirs": rel})
    assert fired == {"x": True}
    # the bogus loose manifest was retracted; A's commit is what history serves
    assert not os.path.exists(os.path.join(spec.path, "_manifests", "v1.json"))
    assert _read_manifest(spec, 1) == original
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a"), (2, "b")}


def test_commit_stands_when_fold_consumes_own_manifest(
    spark, tmp_path, monkeypatch
):
    """The benign side of the window: the fold runs right AFTER the link and
    folds THIS writer's manifest — the post-link verify sees an equal body
    and the commit stands (no spurious conflict)."""
    import os as _os

    from creatorops_lakehouse_spark.sources.snapshots import (
        _commit,
        _read_manifest,
        checkpoint_manifest,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)

    real_link = _os.link
    fired = {}

    def folding_link(src, dst, *a, **k):
        r = real_link(src, dst, *a, **k)
        if dst.endswith("v1.json") and "x" not in fired:
            fired["x"] = True
            checkpoint_manifest(spec)  # folds the just-linked manifest
        return r

    monkeypatch.setattr(_os, "link", folding_link)
    rel = [os.path.relpath(d, spec.path) for d in snapshot_dirs(spec, 0)]
    _commit(spec, 1, {"version": 1, "mode": "append", "dirs": rel, "parent": 0})
    assert fired == {"x": True}
    assert current_version(spec) == 1
    assert _read_manifest(spec, 1)["mode"] == "append"
    assert _rows(snapshot_read(spark, spec, version=1)) == {(1, "a")}


def test_version_as_of_inclusive_at_exact_commit_second_production_format(
    spark, tmp_path
):
    """Production committed_at carries a '+00:00' tz suffix; a tz-less probe
    at the exact commit second must still be INCLUSIVE (ADVICE r7: the
    lexicographic compare rejected it; the test only passed by rewriting
    timestamps to tz-less strings — this one does NOT rewrite)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        version_as_of,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    at = _read_manifest(spec, 0)["committed_at"]
    assert at.endswith("+00:00")  # the real stored format, untouched
    assert version_as_of(spec, at[:19]) == 0


# --- disjoint-DML concurrent commits (VERDICT r7 item 2) ------------------


def _ids(spark, spec):
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read

    return {r.id for r in snapshot_read(spark, spec).select("id").collect()}


def _race(monkeypatch, version, interleaved):
    """Patch os.link so the FIRST attempt to publish v<version>.json runs
    ``interleaved()`` first — the deterministic two-writer interleave: the
    lagging writer has computed its rewrite, the other commit lands just
    before its put-if-absent, forcing the conflict/rebase path."""
    import os as _os

    real_link = _os.link
    fired = {}

    def racing_link(src, dst, *a, **k):
        if dst.endswith(f"v{version}.json") and "x" not in fired:
            fired["x"] = True
            interleaved()
        return real_link(src, dst, *a, **k)

    monkeypatch.setattr(_os, "link", racing_link)
    return fired


def _two_band_table(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "lo") for i in range(100)], ["id", "v"]), spec
    )
    snapshot_write(
        spark.createDataFrame([(i, "hi") for i in range(100, 200)], ["id", "v"]),
        spec,
    )
    return spec


def test_disjoint_delete_writers_both_commit(spark, tmp_path, monkeypatch):
    """Two writers deleting disjoint key bands: writer A's commit lands
    inside writer B's commit window; B REBASES (manifest stats prove A's
    rewrite output disjoint from B's predicate) and both deletes apply."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_history,
    )

    spec = _two_band_table(spark, tmp_path)

    def writer_a():
        snapshot_delete_where(spark, spec, {"id": (0, 49)})  # band in dir0

    _race(monkeypatch, 2, writer_a)
    v = snapshot_delete_where(spark, spec, {"id": (150, 159)})  # band in dir1
    assert v == 3  # rebased past A's v2
    assert _ids(spark, spec) == set(range(50, 150)) | set(range(160, 200))
    hist = {h["version"]: h["mode"] for h in snapshot_history(spec)}
    assert hist[2] == "delete" and hist[3] == "delete"  # A's then B's


def test_disjoint_partition_delete_writers_both_commit(
    spark, tmp_path, monkeypatch
):
    """The literal Delta case: two writers deleting DISJOINT PARTITIONS
    both commit — partition-column stats (collected per commit dir) are
    what prove the rewrites compatible."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("p",))
    snapshot_write(
        spark.createDataFrame([(i, "x") for i in range(10)], ["id", "p"]), spec
    )
    snapshot_write(
        spark.createDataFrame([(i, "y") for i in range(10)], ["id", "p"]), spec
    )

    def writer_a():
        snapshot_delete_where(spark, spec, {"p": ("x", "x"), "id": (0, 4)})

    _race(monkeypatch, 2, writer_a)
    v = snapshot_delete_where(spark, spec, {"p": ("y", "y"), "id": (0, 4)})
    assert v == 3
    got = {
        (r.id, r.p) for r in snapshot_read(spark, spec).select("id", "p").collect()
    }
    assert got == {(i, p) for i in range(5, 10) for p in ("x", "y")}


def test_overlapping_dml_aborts(spark, tmp_path, monkeypatch):
    """Writer A rewrites a dir writer B also read: B must abort — a rebase
    would resurrect rows A deleted."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        snapshot_delete_where,
    )

    spec = _two_band_table(spark, tmp_path)

    def writer_a():
        snapshot_delete_where(spark, spec, {"id": (0, 9)})  # touches dir0

    _race(monkeypatch, 2, writer_a)
    with pytest.raises(SnapshotConflictError, match="also read"):
        snapshot_delete_where(spark, spec, {"id": (20, 29)})  # also dir0
    # A's delete survives untouched by the aborted writer
    assert _ids(spark, spec) == set(range(10, 200))


def test_concurrent_append_in_predicate_band_aborts(
    spark, tmp_path, monkeypatch
):
    """A concurrent append whose rows MIGHT match the delete's predicate
    conflicts (serializable semantics); an append provably outside the
    band rebases and the appended dir carries into the rebased manifest."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        snapshot_delete_where,
    )

    spec = _two_band_table(spark, tmp_path)

    def append_inside():
        snapshot_write(
            spark.createDataFrame([(155, "new")], ["id", "v"]), spec
        )

    _race(monkeypatch, 2, append_inside)
    with pytest.raises(SnapshotConflictError, match="may match"):
        snapshot_delete_where(spark, spec, {"id": (150, 159)})

    # disjoint append: delete rebases over it and keeps the appended rows
    def append_outside():
        snapshot_write(
            spark.createDataFrame([(500, "far")], ["id", "v"]), spec
        )

    # head is v2 (the 155 append landed; the delete aborted) — race the
    # next delete's v3 against the outside-band append
    _race(monkeypatch, 3, append_outside)
    v = snapshot_delete_where(spark, spec, {"id": (100, 109)})
    assert v == 4
    assert _ids(spark, spec) == (
        set(range(100)) | set(range(110, 200)) | {155, 500}
    )


def test_disjoint_update_and_merge_rebase(spark, tmp_path, monkeypatch):
    """UPDATE and MERGE take the same rebase path as DELETE."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_merge,
        snapshot_read,
        snapshot_update_where,
    )

    spec = _two_band_table(spark, tmp_path)

    def writer_a():
        snapshot_delete_where(spark, spec, {"id": (0, 4)})

    _race(monkeypatch, 2, writer_a)
    v = snapshot_update_where(
        spark, spec, {"id": (150, 154)}, {"v": "'updated'"}
    )
    assert v == 3
    got = snapshot_read(spark, spec)
    assert got.filter("v = 'updated'").count() == 5
    assert _ids(spark, spec) == set(range(5, 200))

    def writer_b():
        snapshot_delete_where(spark, spec, {"id": (5, 9)})

    _race(monkeypatch, 4, writer_b)
    v = snapshot_merge(
        spark,
        spec,
        spark.createDataFrame([(199, "merged"), (1000, "ins")], ["id", "v"]),
        keys=["id"],
    )
    assert v == 5
    got = snapshot_read(spark, spec)
    assert got.filter("v = 'merged'").count() == 1
    assert _ids(spark, spec) == set(range(10, 200)) | {1000}


def test_concurrent_metadata_change_aborts_dml(spark, tmp_path, monkeypatch):
    """A concurrent constraint add (metadata change) aborts an in-flight
    rewrite — Delta's MetadataChangedException."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        add_check_constraint,
        snapshot_delete_where,
    )

    spec = _two_band_table(spark, tmp_path)

    def meta_writer():
        add_check_constraint(spark, spec, "id_nonneg", "id >= 0")

    _race(monkeypatch, 2, meta_writer)
    with pytest.raises(SnapshotConflictError, match="metadata"):
        snapshot_delete_where(spark, spec, {"id": (150, 159)})


# --- protocol / feature gating (VERDICT r7 item 3) -------------------------


def _edit_manifest(spec, version, mutate):
    import json as _json

    p = os.path.join(spec.path, "_manifests", f"v{version}.json")
    with open(p) as f:
        m = _json.load(f)
    mutate(m)
    with open(p, "w") as f:
        _json.dump(m, f)


def test_protocol_feature_stamps_follow_content(spark, tmp_path):
    """Commits stamp the features their manifest actually uses: a DV
    delete requires deletionVectors (reader+writer), a rename requires
    columnMapping, a CHECK constraint is writer-only; a purge that removes
    the last vector drops the requirement (self-describing per version)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        add_check_constraint,
        purge_deletes,
        rename_column,
        snapshot_delete_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "a") for i in range(10)], ["id", "v"]), spec
    )
    assert "reader_features" not in _read_manifest(spec, 0)

    v = snapshot_delete_where(spark, spec, {"id": (0, 2)}, rewrite=False)
    m = _read_manifest(spec, v)
    assert m["reader_features"] == ["deletionVectors"]
    assert m["writer_features"] == ["deletionVectors"]

    v = purge_deletes(spark, spec)
    m = _read_manifest(spec, v)
    assert "reader_features" not in m  # requirement dropped with the DVs

    v = rename_column(spec, "v", "val")
    m = _read_manifest(spec, v)
    assert m["reader_features"] == ["columnMapping"]

    v = add_check_constraint(spark, spec, "id_nonneg", "id >= 0")
    m = _read_manifest(spec, v)
    assert "checkConstraints" in m["writer_features"]
    assert "checkConstraints" not in m.get("reader_features", [])


def test_unknown_reader_feature_refused_everywhere(spark, tmp_path):
    """A manifest requiring a reader feature this build lacks refuses in
    BOTH read paths (native snapshot_read and the pyds DataSource) and in
    every writer (writers must be able to read what they rewrite)."""
    from creatorops_lakehouse_spark.sources.pyds import register_snapshot_source
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotProtocolError,
        snapshot_delete_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "a") for i in range(10)], ["id", "v"]), spec
    )
    _edit_manifest(
        spec, 0, lambda m: m.update(reader_features=["timeCrystals"])
    )
    with pytest.raises(SnapshotProtocolError, match="timeCrystals"):
        snapshot_read(spark, spec)
    register_snapshot_source(spark)
    with pytest.raises(Exception, match="timeCrystals"):
        spark.read.format("snapshot").option("path", spec.path).load()
    with pytest.raises(SnapshotProtocolError, match="timeCrystals"):
        snapshot_write(spark.createDataFrame([(99, "z")], ["id", "v"]), spec)
    with pytest.raises(SnapshotProtocolError, match="timeCrystals"):
        snapshot_delete_where(spark, spec, {"id": (0, 1)})


def test_unknown_writer_feature_blocks_writes_not_reads(spark, tmp_path):
    """Writer-only features gate commits but never reads — Delta's
    split-protocol contract (e.g. appendOnly-style table properties)."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotProtocolError,
        snapshot_update_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "a") for i in range(10)], ["id", "v"]), spec
    )
    _edit_manifest(
        spec, 0, lambda m: m.update(writer_features=["quantumLocks"])
    )
    assert snapshot_read(spark, spec).count() == 10  # reads unaffected
    with pytest.raises(SnapshotProtocolError, match="quantumLocks"):
        snapshot_write(spark.createDataFrame([(99, "z")], ["id", "v"]), spec)
    with pytest.raises(SnapshotProtocolError, match="quantumLocks"):
        snapshot_update_where(spark, spec, {"id": (0, 1)}, {"v": "'x'"})


def test_chaos_exactly_once_sink_vs_batch_writer(spark, tmp_path):
    """VERDICT r7 item 6 — the exactly-once sink and the multi-writer
    rebase loop INTERLEAVED: 50 micro-batches delivered through
    snapshot_write_txn while a concurrent batch writer's append is
    injected between every third delivery's data write and its first
    commit attempt (a guaranteed version collision forcing the txn
    rebase), with at-least-once redeliveries every 7th batch and a
    checkpoint fold every 10 commits. No micro-batch may be lost or
    duplicated, and every batch-writer row must survive."""
    from collections import Counter

    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        last_txn_version,
        snapshot_write_txn,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(-1, "seed")], ["id", "src"]), spec)

    def deliver(i):
        kwargs = {}
        if i % 3 == 0:
            # the collision: a batch append wins the version the sink is
            # about to claim, exercising rebase + txn dedup together
            kwargs["_pre_commit"] = lambda: snapshot_write(
                spark.createDataFrame([(1000 + i, "batch")], ["id", "src"]),
                spec,
            )
        snapshot_write_txn(
            spark.createDataFrame([(i, "stream")], ["id", "src"]),
            spec,
            app_id="s1",
            txn_version=i,
            **kwargs,
        )

    for i in range(50):
        deliver(i)
        if i % 7 == 0:
            deliver(i)  # at-least-once redelivery: must no-op pre-write
        if i % 10 == 9:
            checkpoint_manifest(spec)

    assert last_txn_version(spec, "s1") == 49
    got = [(r.id, r.src) for r in snapshot_read(spark, spec).collect()]
    counts = Counter(got)
    dupes = {k: v for k, v in counts.items() if v != 1}
    assert not dupes  # nothing duplicated anywhere
    assert sorted(i for i, s in got if s == "stream") == list(range(50))
    assert sorted(i for i, s in got if s == "batch") == [
        1000 + i for i in range(0, 50, 3)
    ]


# --- full-clause MERGE + replaceWhere (round 8) ----------------------------


def test_merge_clauses_cdc_apply(spark, tmp_path):
    """matched_delete / matched_update / conditional insert in ONE merge —
    the CDC-apply shape; source carries an op column the table lacks."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_merge_clauses,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (4, 40)], ["id", "v"]
        ),
        spec,
    )
    source = spark.createDataFrame(
        [
            (2, None, "D"),   # delete
            (3, 333, "U"),    # update v from source
            (9, 90, "I"),     # insert (condition op='I')
            (8, 80, "X"),     # unmatched but condition FALSE -> not inserted
        ],
        "id long, v long, op string",
    )
    v = snapshot_merge_clauses(
        spark,
        spec,
        source,
        keys=["id"],
        matched_delete="src_op = 'D'",
        matched_update={"v": "src_v"},
        insert="op = 'I'",
    )
    assert v == 1
    got = {(r.id, r.v) for r in snapshot_read(spark, spec).collect()}
    assert got == {(1, 10), (3, 333), (4, 40), (9, 90)}


def test_merge_clauses_not_matched_by_source(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE DELETE sweeps target rows with no source
    match (condition over target columns); update-only merge, no insert."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_merge_clauses,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (4, 40)], ["id", "v"]
        ),
        spec,
    )
    source = spark.createDataFrame([(1, 111)], "id long, v long")
    snapshot_merge_clauses(
        spark,
        spec,
        source,
        keys=["id"],
        matched_update={"v": "src_v"},
        insert=False,
        not_matched_by_source_delete="v >= 30",  # sweeps 3 and 4, keeps 2
    )
    got = {(r.id, r.v) for r in snapshot_read(spark, spec).collect()}
    assert got == {(1, 111), (2, 20)}


def test_merge_clauses_refusals_and_expressions(spark, tmp_path):
    """Key updates are refused (row identity); update expressions may mix
    target and source columns and cast back to the table type."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_merge_clauses,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, 10)], ["id", "v"]), spec)
    src = spark.createDataFrame([(1, 5)], "id long, v long")
    with pytest.raises(ValueError, match="row identity"):
        snapshot_merge_clauses(
            spark, spec, src, keys=["id"], matched_update={"id": "src_v"}
        )
    snapshot_merge_clauses(
        spark, spec, src, keys=["id"],
        matched_update={"v": "v + src_v * 2 + 0.9"},  # double expr -> long cast
    )
    assert {(r.id, r.v) for r in snapshot_read(spark, spec).collect()} == {
        (1, 20)
    }


def test_merge_by_source_aborts_on_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A merge with NOT MATCHED BY SOURCE reads the WHOLE table, so a
    concurrent blind append — even one provably outside the source key
    envelope — must ABORT (Delta's ConcurrentAppendException when the
    merge predicate spans the table): a rebase would let the appended
    rows silently escape the by-source delete."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        snapshot_merge_clauses,
    )

    spec = _two_band_table(spark, tmp_path)
    src = spark.createDataFrame([(0, "keep")], "id long, v string")

    def blind_append():  # far outside src's key envelope (id=0)
        snapshot_write(spark.createDataFrame([(999, "new")], ["id", "v"]), spec)

    _race(monkeypatch, 2, blind_append)
    with pytest.raises(SnapshotConflictError, match="may match"):
        snapshot_merge_clauses(
            spark, spec, src, keys=["id"],
            matched_update={"v": "src_v"},
            insert=False,
            not_matched_by_source_delete="id >= 100",
        )
    # the append survives; the aborted merge changed nothing
    assert 999 in _ids(spark, spec) and len(_ids(spark, spec)) == 201

    # the SAME merge without the by-source clause reads only the source
    # key envelope -> the disjoint append rebases and both effects land
    def blind_append2():
        snapshot_write(spark.createDataFrame([(998, "new")], ["id", "v"]), spec)

    _race(monkeypatch, 3, blind_append2)
    snapshot_merge_clauses(
        spark, spec, src, keys=["id"], matched_update={"v": "src_v"}
    )
    got = {(r.id, r.v) for r in snapshot_read(spark, spec)
           .filter("id in (0, 998)").collect()}
    assert got == {(0, "keep"), (998, "new")}


def test_merge_cardinality_violation(spark, tmp_path):
    """Duplicate source keys that MATCH a target row + a matched clause
    raise (Delta's MERGE_CARDINALITY_VIOLATION) instead of silently
    multiplying rows; duplicate UNMATCHED keys legitimately insert twice,
    and a matched-clause-free merge is never guarded."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_merge_clauses,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"]), spec)

    dup_matched = spark.createDataFrame(
        [(1, 100), (1, 101)], "id long, v long"
    )
    with pytest.raises(ValueError, match="CARDINALITY"):
        snapshot_merge_clauses(
            spark, spec, dup_matched, keys=["id"], matched_update={"v": "src_v"}
        )
    with pytest.raises(ValueError, match="CARDINALITY"):
        snapshot_merge_clauses(
            spark, spec, dup_matched, keys=["id"], matched_delete="src_v > 0"
        )
    assert {(r.id, r.v) for r in snapshot_read(spark, spec).collect()} == {
        (1, 10), (2, 20)
    }  # the refused merges changed nothing

    # duplicate keys that match NO target row insert once per source row
    dup_unmatched = spark.createDataFrame(
        [(9, 90), (9, 91)], "id long, v long"
    )
    snapshot_merge_clauses(
        spark, spec, dup_unmatched, keys=["id"], matched_update={"v": "src_v"}
    )
    got = sorted(
        (r.id, r.v) for r in snapshot_read(spark, spec).collect()
    )
    assert got == [(1, 10), (2, 20), (9, 90), (9, 91)]


def test_replace_where_atomic_backfill(spark, tmp_path):
    """Predicate-scoped overwrite: one commit swaps the band, untouched
    commits carry byte-identical, validation rejects out-of-band rows."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs,
        snapshot_replace_where,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, "old") for i in range(10)], ["id", "v"]),
        spec,
    )
    snapshot_write(
        spark.createDataFrame(
            [(i, "old") for i in range(10, 20)], ["id", "v"]
        ),
        spec,
    )
    dir0 = snapshot_dirs(spec, 1)[0]
    with pytest.raises(ValueError, match="violate the predicate"):
        snapshot_replace_where(
            spark,
            spec,
            spark.createDataFrame([(5, "oops")], ["id", "v"]),
            {"id": (10, 19)},
        )
    v = snapshot_replace_where(
        spark,
        spec,
        spark.createDataFrame([(12, "new"), (15, "new")], ["id", "v"]),
        {"id": (10, 19)},
    )
    assert v == 2  # ONE commit: delete+insert atomically
    got = {(r.id, r.v) for r in snapshot_read(spark, spec).collect()}
    assert got == {(i, "old") for i in range(10)} | {(12, "new"), (15, "new")}
    assert dir0 in snapshot_dirs(spec, v)  # untouched band carried
    # pre-replace version intact
    assert snapshot_read(spark, spec, version=1).count() == 20


def test_optimize_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """Delta's matrix: OPTIMIZE never conflicts with a blind append — the
    compaction consumed only the dirs it read; the appended dir carries
    into the rebased manifest unharmed."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
        snapshot_history,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(2, "b")], ["id", "v"]), spec)

    def appender():
        snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)

    _race(monkeypatch, 2, appender)
    v = optimize_snapshots(spark, spec)
    assert v == 3  # rebased past the append's v2
    hist = {h["version"]: h["mode"] for h in snapshot_history(spec)}
    assert hist[2] == "append" and hist[3] == "optimize"
    assert _rows(snapshot_read(spark, spec)) == {(1, "a"), (2, "b"), (3, "c")}


def test_zorder_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """OPTIMIZE ZORDER BY rebases over a blind append exactly like plain
    OPTIMIZE: the appended dir carries next to the Z-bucketed output."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        optimize_snapshots,
        pruned_dirs,
    )

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame([(i, str(i % 7)) for i in range(100)], ["id", "v"]),
        spec,
    )
    snapshot_write(
        spark.createDataFrame(
            [(i, str(i % 7)) for i in range(100, 200)], ["id", "v"]
        ),
        spec,
    )

    def appender():
        snapshot_write(spark.createDataFrame([(999, "z")], ["id", "v"]), spec)

    _race(monkeypatch, 2, appender)
    v = optimize_snapshots(spark, spec, zorder_by=("id",), target_dirs=4)
    assert v == 3  # rebased past the append's v2
    m = _read_manifest(spec, 3)
    assert m["mode"] == "optimize-zorder"
    zdirs = [d for d in m["dirs"] if "_zbucket=" in d]
    assert len(zdirs) == 4 and len(m["dirs"]) == 5  # 4 buckets + carried append
    got = {r.id for r in snapshot_read(spark, spec).select("id").collect()}
    assert got == set(range(200)) | {999}
    # per-bucket stats still prune point probes after the rebase
    keptd, skipped = pruned_dirs(spec, {"id": (5, 5)}, 3)
    assert len(skipped) >= 3
