"""Incremental materialized-view maintenance (sources/matview.py): after
EVERY refresh the view must equal a from-scratch aggregate of the source
head — under appends (fast path), multi-version catch-up, copy-on-write
deletes, updates (pre/post image folding), group death, and replayed
refreshes. Also pins the refusal contracts (no watermark, null measures)
and that the fast path really is chosen for append-only deltas."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.sources.matview import (
    create_agg_view,
    refresh_agg_view,
)
from creatorops_lakehouse_spark.sources.snapshots import (
    snapshot_delete_where,
    snapshot_read,
    snapshot_update_where,
    snapshot_write,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec

KEYS = ["grp"]
SUMS = {"sum_val": "val"}
ROW_KEY = ["k"]


def _rows(spark, ks):
    return spark.createDataFrame(
        [(k, k % 5, k * 10) for k in ks], "k long, grp long, val long"
    )


def _expect(spark, src):
    return {
        (r.grp): (r.n, r.s)
        for r in snapshot_read(spark, src)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def _view(spark, view):
    return {
        (r.grp): (r.n_rows, r.sum_val)
        for r in snapshot_read(spark, view).collect()
    }


def test_matview_incremental_equals_full(spark, tmp_path):
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    snapshot_write(_rows(spark, range(0, 40)), src)
    assert create_agg_view(spark, src, view, KEYS, SUMS) == 0
    assert _view(spark, view) == _expect(spark, src)

    # append-only delta -> fast path (added dirs scanned, no CDF)
    snapshot_write(_rows(spark, range(40, 70)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (1, "incremental-append")
    assert _view(spark, view) == _expect(spark, src)

    # multi-version catch-up across appends is STILL the fast path (the
    # check is content-based on the two manifests, not per-version)
    snapshot_write(_rows(spark, range(70, 90)), src)
    snapshot_write(_rows(spark, range(90, 100)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (3, "incremental-append")
    assert _view(spark, view) == _expect(spark, src)

    # DML in the span -> CDF fallback; deletes + a later append fold in one
    snapshot_delete_where(spark, src, {"k": (30, 45)})
    snapshot_write(_rows(spark, range(100, 110)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert mode == "incremental-diff"
    assert _view(spark, view) == _expect(spark, src)

    # updates fold via pre/post images (count unchanged, sums move)
    snapshot_update_where(spark, src, {"k": (10, 20)}, {"val": "val + 1000"})
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert mode == "incremental-diff"
    assert _view(spark, view) == _expect(spark, src)

    # replayed refresh of an already-applied version is a no-op
    v2, mode2 = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v2, mode2) == (v, "noop")
    assert _view(spark, view) == _expect(spark, src)


def test_matview_group_death(spark, tmp_path):
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 10)), src)  # grps 0..4, 2 rows each
    create_agg_view(spark, src, view, KEYS, SUMS)
    # kill every row of grp 2 (k=2, k=7)
    snapshot_delete_where(spark, src, {"k": (2, 2)})
    snapshot_delete_where(spark, src, {"k": (7, 7)})
    refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    got = _view(spark, view)
    assert 2 not in got, "a count-zero group must leave the view"
    assert got == _expect(spark, src)


def test_matview_refusals(spark, tmp_path):
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 6)), src)

    with pytest.raises(ValueError, match="no watermark"):
        refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)

    create_agg_view(spark, src, view, KEYS, SUMS)
    # a NULL measure would silently diverge full vs incremental -> refused
    snapshot_write(
        spark.createDataFrame([(999, 0, None)], "k long, grp long, val long"),
        src,
    )
    with pytest.raises(ValueError, match="non-null"):
        refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)


def test_matview_concurrent_refreshers(spark, tmp_path):
    """Two refreshers racing the same view: the overwrite commit aborts
    the loser, whose retry re-reads the watermark and no-ops (the txn map
    already records the winner's source version). Both calls return, the
    view equals the full recompute, and no delta was double-applied."""
    import threading

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 30)), src)
    create_agg_view(spark, src, view, KEYS, SUMS)
    snapshot_write(_rows(spark, range(30, 60)), src)
    snapshot_write(_rows(spark, range(60, 90)), src)

    results, errors = [], []

    def go():
        try:
            results.append(refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ts = [threading.Thread(target=go) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert {v for v, _ in results} == {2}, results
    assert _view(spark, view) == _expect(spark, src)


def test_matview_over_streaming_sink(spark, tmp_path):
    """Composition: micro-batches land in the source table through the
    exactly-once streaming sink, and the matview refreshes incrementally
    on top — every sink commit is a plain append, so the refresh takes
    the fast path (only the new micro-batch dirs are scanned). The
    pattern is the streaming→serving handoff: the stream owns the fact
    table, the view serves the aggregate, and both legs are exactly-once
    (sink via its batch-id txn, refresh via its source-version txn)."""
    import json
    import os

    from creatorops_lakehouse_spark.streaming.pipeline import (
        start_exactly_once_sink,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def drop(name, ks):
        with open(os.path.join(in_dir, name), "w") as f:
            for k in ks:
                f.write(json.dumps({"k": k, "grp": k % 5, "val": k * 10}) + "\n")

    drop("f0.json", range(0, 20))
    stream = (
        spark.readStream.schema("k long, grp long, val long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = start_exactly_once_sink(
        stream, src, str(tmp_path / "ckpt"), app_id="mvstream"
    )
    q.awaitTermination()
    create_agg_view(spark, src, view, KEYS, SUMS)
    assert _view(spark, view) == _expect(spark, src)

    # two more micro-batches, then an incremental catch-up refresh
    drop("f1.json", range(20, 45))
    drop("f2.json", range(45, 60))
    q = start_exactly_once_sink(
        stream, src, str(tmp_path / "ckpt"), app_id="mvstream"
    )
    q.awaitTermination()
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert mode == "incremental-append"
    assert _view(spark, view) == _expect(spark, src)
    assert snapshot_read(spark, src).count() == 60


def test_matview_survives_optimize_and_rollback(spark, tmp_path):
    """Maintenance and undo between refreshes: OPTIMIZE rewrites the file
    set without changing content (the diff path must fold an EMPTY
    delta), and a rollback re-publishes an old file set as a NEW version
    (the diff path must fold the reverted rows back out). Both end in
    exact equality with the full recompute."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
        rollback,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 30)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS)
    snapshot_write(_rows(spark, range(30, 50)), src)  # v1
    refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)

    optimize_snapshots(spark, src)  # v2: same rows, new file set
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert mode == "incremental-diff"  # dirs changed -> not append-only
    assert _view(spark, view) == _expect(spark, src)

    rollback(src, 0)  # v3: back to the first 30 rows
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert mode == "incremental-diff"
    assert _view(spark, view) == _expect(spark, src)
    assert snapshot_read(spark, src).count() == 30


def test_matview_vacuumed_watermark_full_rebuild(spark, tmp_path):
    """Vacuum reclaims the version the view last refreshed at: the delta
    is unreconstructible, so the refresh must FULL-REBUILD (Delta's
    behavior past the change-feed retention horizon) rather than raise —
    and the rebuild is still one commit carrying the new watermark."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        vacuum_snapshots,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 20)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS)  # watermark = 0
    snapshot_write(_rows(spark, range(20, 40)), src)  # v1
    snapshot_write(_rows(spark, range(40, 60)), src)  # v2
    checkpoint_manifest(src)
    vacuum_snapshots(src, keep_last=1)  # v0 (the watermark) is gone

    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (2, "full-rebuild")
    assert _view(spark, view) == _expect(spark, src)
    # and the watermark advanced: the next refresh is a no-op
    assert refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)[1] == "noop"
