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


def test_matview_enriched_with_broadcast_dim(spark, tmp_path):
    """Dimension-enriched view (the gold-layer fact⋈dim shape): source
    rows pass through a row-local broadcast-dim join before aggregation
    on EVERY refresh path — append, multi-version catch-up, delete, and
    update all end in exact equality with the enriched full recompute.
    The update moves rows BETWEEN groups (the dim key changes), so the
    CDF pre/post images must re-enrich consistently."""
    import pyspark.sql.functions as F

    # static dim: k%10 -> band name
    dim = spark.createDataFrame(
        [(i, f"band{i % 3}") for i in range(10)], "dk long, band string"
    )

    def enrich(df):
        return df.withColumn("dk", F.col("k") % 10).join(
            F.broadcast(dim), on="dk", how="left"
        ).drop("dk")

    KEYS_E, SUMS_E = ["band"], {"sum_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    def expect():
        return {
            r.band: (r.n, r.s)
            for r in enrich(snapshot_read(spark, src))
            .groupBy("band")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("val").cast("long").alias("s"),
            )
            .collect()
        }

    def got():
        return {
            r.band: (r.n_rows, r.sum_val)
            for r in snapshot_read(spark, view).collect()
        }

    snapshot_write(_rows(spark, range(0, 40)), src)
    create_agg_view(spark, src, view, KEYS_E, SUMS_E, enrich=enrich)
    assert got() == expect()

    snapshot_write(_rows(spark, range(40, 70)), src)
    snapshot_write(_rows(spark, range(70, 90)), src)
    v, mode = refresh_agg_view(
        spark, src, view, KEYS_E, SUMS_E, ROW_KEY, enrich=enrich
    )
    assert mode == "incremental-append"
    assert got() == expect()

    # delete + an update that changes k%10 -> the row CHANGES dim group
    snapshot_delete_where(spark, src, {"k": (10, 25)})
    snapshot_update_where(spark, src, {"k": (30, 45)}, {"val": "val + 1000"})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS_E, SUMS_E, ROW_KEY, enrich=enrich
    )
    assert mode == "incremental-diff"
    assert got() == expect()


def test_overwrite_expected_version_cas(spark, tmp_path):
    """snapshot_write's optimistic-concurrency CAS: a read-modify-write
    overwrite declares the version its state was derived from; if the
    head moved, the commit aborts instead of silently discarding the
    interleaved commit."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        snapshot_write,
    )

    spec = TableSpec("cas.t", str(tmp_path / "t"))
    snapshot_write(_rows(spark, range(0, 5)), spec)  # v0
    snapshot_write(_rows(spark, range(5, 10)), spec)  # v1

    with pytest.raises(SnapshotConflictError, match="optimistic overwrite"):
        snapshot_write(
            _rows(spark, range(0, 3)), spec, mode="overwrite",
            expected_version=0,
        )
    v = snapshot_write(
        _rows(spark, range(0, 3)), spec, mode="overwrite", expected_version=1
    )
    assert v == 2


def test_matview_interleaved_refresher_no_double_fold(spark, tmp_path, monkeypatch):
    """Deterministic replay of the double-fold race the cross-process
    duel caught: refresher R2 reads the watermark, then a competitor R1
    lands a refresh (folding source v1) BEFORE R2 reads the old view
    state and commits. Pre-fix, R2's lazy head read picked up R1's
    already-merged state and re-folded R1's span (R2's newer txn_version
    sails past the replay guard) — counts inflate. Post-fix, R2's state
    read is PINNED to the same view version as its watermark and its
    commit carries an expected_version CAS, so the stale merge aborts
    and the retry folds exactly once."""
    import creatorops_lakehouse_spark.sources.matview as mv
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_write_txn,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 20)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS)  # watermark 0
    snapshot_write(_rows(spark, range(20, 40)), src)  # v1
    snapshot_write(_rows(spark, range(40, 60)), src)  # v2

    # competitor state: a refresh that folded ONLY source v1
    from creatorops_lakehouse_spark.sources.snapshots import (
        _load_dirs as _ld,
        _read_manifest as _rm,
    )
    import pyspark.sql.functions as F

    v1_state = (
        _ld(spark, src, _rm(src, 1), _rm(src, 1)["dirs"])
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").cast("long").alias("sum_val"),
        )
    )

    fired = {"done": False}
    orig_rm = mv._read_manifest

    def hooked(spec, v):
        m = orig_rm(spec, v)
        if spec.path == view.path and not fired["done"]:
            fired["done"] = True
            # R1 lands between R2's watermark read and R2's commit
            snapshot_write_txn(
                v1_state, view, app_id="matview:mv.view", txn_version=1,
                mode="overwrite",
            )
        return m

    monkeypatch.setattr(mv, "_read_manifest", hooked)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    monkeypatch.setattr(mv, "_read_manifest", orig_rm)
    assert v == 2
    assert _view(spark, view) == _expect(spark, src), (
        "interleaved refresher double-folded a span"
    )


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


def test_matview_hll_over_streaming_sink(spark, tmp_path):
    """Composition: the exactly-once streaming sink owns the fact table,
    an HLL distinct-count view serves on top — every micro-batch commit
    is a plain append, so the refresh takes the register-fold fast path
    and the stored sketch stays bucket-identical to a from-scratch
    sketch of the head. The full streaming→serving handoff for the
    COUNT(DISTINCT) dashboard case (distinct users per group over an
    ever-growing stream) without ever re-scanning history."""
    import json
    import os

    from creatorops_lakehouse_spark.streaming.pipeline import (
        start_exactly_once_sink,
    )

    HLLS = {"nd_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def drop(name, ks):
        with open(os.path.join(in_dir, name), "w") as f:
            for k in ks:
                f.write(
                    json.dumps({"k": k, "grp": k % 5, "val": k % 13}) + "\n"
                )

    drop("f0.json", range(0, 30))
    stream = (
        spark.readStream.schema("k long, grp long, val long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = start_exactly_once_sink(
        stream, src, str(tmp_path / "ckpt"), app_id="mvhllstream"
    )
    q.awaitTermination()
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)
    assert _hll_view(spark, view) == _hll_full(spark, src)

    drop("f1.json", range(30, 70))
    drop("f2.json", range(70, 90))
    q = start_exactly_once_sink(
        stream, src, str(tmp_path / "ckpt"), app_id="mvhllstream"
    )
    q.awaitTermination()
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS)
    assert mode == "incremental-append"
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert _view(spark, view) == _expect(spark, src)


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
    # r12: mode='optimize' commits are content-noops (dataChange=false) —
    # the watermark advances free instead of paying an empty-delta CDF
    assert (v, mode) == (2, "noop-optimize")
    assert _view(spark, view) == _expect(spark, src)

    rollback(src, 0)  # v3: back to the first 30 rows
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert mode == "incremental-diff"
    assert _view(spark, view) == _expect(spark, src)
    assert snapshot_read(spark, src).count() == 30


def _hll_full(spark, src, in_col="val"):
    """From-scratch per-group HLL state of the source head — the ground
    truth the incrementally-folded registers must equal exactly."""
    from creatorops_lakehouse_spark.operators.hll import hll_registers
    from creatorops_lakehouse_spark.sources.matview import _hll_state

    df = snapshot_read(spark, src)
    state = _hll_state(
        hll_registers(df, in_col, 7, ("grp",)), ["grp"], "nd_val"
    )
    return {
        r.grp: (tuple((x.bucket, x.rho) for x in r.nd_val_regs), r.nd_val)
        for r in state.collect()
    }


def _hll_view(spark, view):
    return {
        r.grp: (tuple((x.bucket, x.rho) for x in r.nd_val_regs), r.nd_val)
        for r in snapshot_read(spark, view).collect()
    }


def test_matview_hll_append_equals_full(spark, tmp_path):
    """COUNT(DISTINCT) self-maintenance (VERDICT r10 item 2): per-group
    HLL registers stored in the view fold new-data registers in by
    per-bucket MAX on the append path. After every refresh the stored
    registers AND the exact-integer estimate must equal a from-scratch
    sketch of the source head, bucket for bucket — and the SUM/COUNT
    measures stay exact alongside."""
    HLLS = {"nd_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    # vals collide across rows (k*10 % 70 per grp…) — use val=k%13 to get
    # real duplicate keys so distinct < count
    def rows(ks):
        return spark.createDataFrame(
            [(k, k % 5, k % 13) for k in ks], "k long, grp long, val long"
        )

    snapshot_write(rows(range(0, 60)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)
    assert _hll_view(spark, view) == _hll_full(spark, src)

    snapshot_write(rows(range(60, 90)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS)
    assert (v, mode) == (1, "incremental-append")
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert _view(spark, view) == {
        g: (n, s)
        for g, (n, s) in _expect(spark, src).items()
    }

    # multi-version catch-up still folds registers exactly once
    snapshot_write(rows(range(90, 120)), src)
    snapshot_write(rows(range(120, 200)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS)
    assert (v, mode) == (3, "incremental-append")
    assert _hll_view(spark, view) == _hll_full(spark, src)

    # replay no-ops
    assert refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS)[1] == "noop"


def _cms_full(spark, src, in_col="val"):
    """From-scratch per-group CMS state of the source head."""
    from creatorops_lakehouse_spark.sources.matview import (
        _cms_long,
        _cms_state,
    )

    df = snapshot_read(spark, src)
    state = _cms_state(_cms_long(df, ["grp"], in_col), ["grp"], "f_val")
    return {
        r.grp: tuple((c.row_i, c.bucket, c.cnt) for c in r.f_val_cms)
        for r in state.collect()
    }


def _cms_view(spark, view):
    return {
        r.grp: tuple((c.row_i, c.bucket, c.cnt) for c in r.f_val_cms)
        for r in snapshot_read(spark, view).collect()
    }


def test_matview_minmax_append_only(spark, tmp_path):
    """MIN/MAX measures fold on the append path (a new row can only
    tighten the extreme — least/greatest against the stored scalar, new
    groups and untouched groups handled by the NULL-skipping fold) and
    are REFUSED on DML with the same loud contract as HLL."""
    MM = dict(mins={"min_val": "val"}, maxs={"max_val": "val"})
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    def rows(ks, grp_mod=5):
        return spark.createDataFrame(
            [(k, k % grp_mod, (k * 37) % 101) for k in ks],
            "k long, grp long, val long",
        )

    def expect_mm():
        return {
            r.grp: (r.mn, r.mx)
            for r in snapshot_read(spark, src)
            .groupBy("grp")
            .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
            .collect()
        }

    def got_mm():
        return {
            r.grp: (r.min_val, r.max_val)
            for r in snapshot_read(spark, view).collect()
        }

    snapshot_write(rows(range(0, 40)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, **MM)
    assert got_mm() == expect_mm()

    snapshot_write(rows(range(40, 90)), src)
    snapshot_write(rows(range(90, 130)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, **MM)
    assert mode == "incremental-append"
    assert got_mm() == expect_mm()
    assert _view(spark, view) == _expect(spark, src)

    # DML -> refused loudly; the view is untouched
    snapshot_delete_where(spark, src, {"k": (10, 20)})
    with pytest.raises(ValueError, match="append-only"):
        refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, **MM)

    # vacuumed watermark -> full rebuild recomputes extremes from head
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        vacuum_snapshots,
    )

    snapshot_write(rows(range(130, 160)), src)
    checkpoint_manifest(src)
    vacuum_snapshots(src, keep_last=1)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, **MM)
    assert mode == "full-rebuild"
    assert got_mm() == expect_mm()


def test_matview_cms_survives_dml(spark, tmp_path):
    """Count-Min matview measures are LINEAR — cells add and subtract —
    so unlike HLL every refresh path maintains them, including the CDF
    fallback: a delete's ±1-weighted preimage cells decrement exactly
    what its insert incremented. After EVERY refresh (append, catch-up,
    delete, update) the stored cells must equal a from-scratch build of
    the head CELL FOR CELL, and probe estimates never undercount."""
    from creatorops_lakehouse_spark.sources.matview import (
        matview_cms_estimate,
    )

    CMSS = {"f_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    def rows(ks):  # val = k % 13: real duplicate keys per group
        return spark.createDataFrame(
            [(k, k % 5, k % 13) for k in ks], "k long, grp long, val long"
        )

    snapshot_write(rows(range(0, 60)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, cmss=CMSS)
    assert _cms_view(spark, view) == _cms_full(spark, src)

    # append fast path
    snapshot_write(rows(range(60, 100)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, cmss=CMSS)
    assert (v, mode) == (1, "incremental-append")
    assert _cms_view(spark, view) == _cms_full(spark, src)

    # copy-on-write DELETE -> diff path, cells subtract exactly
    snapshot_delete_where(spark, src, {"k": (20, 45)})
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, cmss=CMSS)
    assert mode == "incremental-diff"
    assert _cms_view(spark, view) == _cms_full(spark, src)
    assert _view(spark, view) == _expect(spark, src)

    # UPDATE that MOVES the sketched key: pre-image cells decrement,
    # post-image cells increment
    snapshot_update_where(spark, src, {"k": (50, 70)}, {"val": "val + 3"})
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, cmss=CMSS)
    assert mode == "incremental-diff"
    assert _cms_view(spark, view) == _cms_full(spark, src)

    # deletion-vector delete (metadata-only DML) folds the same way
    snapshot_delete_where(spark, src, {"k": (80, 88)}, rewrite=False)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, cmss=CMSS)
    assert mode == "incremental-diff"
    assert _cms_view(spark, view) == _cms_full(spark, src)

    # probe: estimates never undercount the exact per-(grp, val) counts
    exact = (
        snapshot_read(spark, src)
        .groupBy("grp", "val")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    est = matview_cms_estimate(
        snapshot_read(spark, view), "f_val", ["grp"],
        exact.select("grp", "val"), "val",
    )
    merged = exact.join(est, on=["grp", "val"])
    n_under = merged.filter(F.col("est") < F.col("exact")).count()
    assert n_under == 0, "CMS estimate undercounted"


def test_matview_hist_quantiles_survive_dml(spark, tmp_path):
    """Histogram matview measures: linear like CMS (every refresh path
    maintains them, DML included), with engine-exact integer bins. After
    every refresh the stored bins equal a from-scratch build, and the
    derived quantile bins match the exact per-group quantile's bin."""
    from creatorops_lakehouse_spark.sources.matview import (
        _hist_bin,
        _hist_long,
        _hist_state,
        matview_hist_quantile,
    )

    SPEC = ("val", 0, 13, 13)  # unit-width bins: bin == val exactly
    HISTS = {"h_val": SPEC}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    def rows(ks):
        return spark.createDataFrame(
            [(k, k % 5, k % 13) for k in ks], "k long, grp long, val long"
        )

    def hist_full():
        state = _hist_state(
            _hist_long(snapshot_read(spark, src), ["grp"], SPEC),
            ["grp"], "h_val",
        )
        return {
            r.grp: tuple((c.bin, c.cnt) for c in r.h_val_hist)
            for r in state.collect()
        }

    def hist_view():
        return {
            r.grp: tuple((c.bin, c.cnt) for c in r.h_val_hist)
            for r in snapshot_read(spark, view).collect()
        }

    snapshot_write(rows(range(0, 80)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hists=HISTS)
    assert hist_view() == hist_full()

    snapshot_write(rows(range(80, 140)), src)
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hists=HISTS
    )
    assert (v, mode) == (1, "incremental-append")
    assert hist_view() == hist_full()

    snapshot_delete_where(spark, src, {"k": (25, 60)})
    snapshot_update_where(spark, src, {"k": (70, 95)}, {"val": "(val + 4) % 13"})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hists=HISTS
    )
    assert mode == "incremental-diff"
    assert hist_view() == hist_full()
    assert _view(spark, view) == _expect(spark, src)

    # with unit-width bins the histogram median IS the exact median
    got = {
        r.grp: r.q_bin
        for r in matview_hist_quantile(
            snapshot_read(spark, view), "h_val", ["grp"], 5000
        ).collect()
    }
    import math

    exact = {}
    for r in snapshot_read(spark, src).groupBy("grp").agg(
        F.sort_array(F.collect_list("val")).alias("vs")
    ).collect():
        exact[r.grp] = r.vs[math.ceil(0.5 * len(r.vs)) - 1]
    assert got == exact


def test_matview_hll_dml_refused(spark, tmp_path):
    """HLL registers are MAX-folded — not subtractable. Any DML between
    refreshes must be REFUSED loudly (same contract as MIN/MAX), never
    silently folded into a wrong sketch."""
    HLLS = {"nd_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 40)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)

    snapshot_delete_where(spark, src, {"k": (5, 15)})
    with pytest.raises(ValueError, match="not subtractable"):
        refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS)

    # a deletion-vector delete is DML too — same refusal, not a crash
    src2 = TableSpec("mv.src2", str(tmp_path / "src2"))
    view2 = TableSpec("mv.view2", str(tmp_path / "view2"))
    snapshot_write(_rows(spark, range(0, 40)), src2)
    create_agg_view(spark, src2, view2, KEYS, SUMS, hlls=HLLS)
    snapshot_delete_where(spark, src2, {"k": (5, 15)}, rewrite=False)
    with pytest.raises(ValueError, match="not subtractable"):
        refresh_agg_view(spark, src2, view2, KEYS, SUMS, ROW_KEY, hlls=HLLS)


def test_matview_hll_vacuumed_full_rebuild(spark, tmp_path):
    """A vacuumed watermark full-rebuilds HLL views from the head —
    a rebuild has no subtraction, so DML that happened in the lost span
    is absorbed correctly."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        vacuum_snapshots,
    )

    HLLS = {"nd_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 30)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)
    snapshot_delete_where(spark, src, {"k": (0, 9)})  # DML in the lost span
    snapshot_write(_rows(spark, range(30, 50)), src)
    checkpoint_manifest(src)
    vacuum_snapshots(src, keep_last=1)

    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS)
    assert mode == "full-rebuild"
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert _view(spark, view) == _expect(spark, src)


def test_matview_deletion_vector_delete(spark, tmp_path):
    """MERGE-ON-READ delete (``rewrite=False`` — a new deletion-vector
    entry, NO data rewritten) between refreshes: the manifest's ``dv`` is
    a LIST of entries, and a dv change must route the refresh to the
    CDF fallback, not crash the append-fast-path check (the r10 bug:
    ``_append_only`` assumed dv was a dict keyed by dir and raised
    AttributeError on any live vector). Also pins the converse: an
    append AFTER the DV delete carries the vector list verbatim, so the
    fast path still triggers while vectors are merely present."""
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 40)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS)

    # v1: metadata-only delete — dv list grows, file set unchanged
    snapshot_delete_where(spark, src, {"k": (10, 25)}, rewrite=False)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (1, "incremental-diff")
    assert _view(spark, view) == _expect(spark, src)

    # v2: append with the vector still live — dv carried verbatim, so
    # the delta really is just the new dirs: fast path
    snapshot_write(_rows(spark, range(40, 60)), src)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (2, "incremental-append")
    assert _view(spark, view) == _expect(spark, src)

    # v3: a second DV delete on top — diff path again, still exact
    snapshot_delete_where(spark, src, {"k": (45, 52)}, rewrite=False)
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (3, "incremental-diff")
    assert _view(spark, view) == _expect(spark, src)


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


def test_matview_optimize_is_content_noop(spark, tmp_path):
    """VERDICT r11 item 1 (the round's one real defect): OPTIMIZE commits
    are content-noops — mode='optimize' is the snapshot log's
    dataChange=false. A span of pure maintenance advances the watermark
    with a metadata-only commit (no fold, no state rewrite), and a mixed
    append→OPTIMIZE→append span folds EXACTLY the appended dirs even
    though the later OPTIMIZE packed them out of the head's dir set."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 30)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS)

    optimize_snapshots(spark, src)  # v1: same rows, packed layout
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (1, "noop-optimize")
    assert _view(spark, view) == _expect(spark, src)
    # the advance is durable: a replay no-ops via the txn map
    assert refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)[1] == "noop"

    # append → OPTIMIZE → append: the OPTIMIZE at v3 consumes v2's
    # appended dir; the span walk must still fold v2's AND v4's content
    # exactly once each, via the incremental-append path (never the CDF)
    snapshot_write(_rows(spark, range(30, 50)), src)  # v2
    optimize_snapshots(spark, src)  # v3 packs v2's dir away
    snapshot_write(_rows(spark, range(50, 70)), src)  # v4
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (4, "incremental-append")
    assert _view(spark, view) == _expect(spark, src)


def test_matview_hll_minmax_survive_optimize(spark, tmp_path):
    """The same fix, on the measures OPTIMIZE used to BRICK: HLL and
    MIN/MAX views refused to refresh forever after a compaction (the dir
    set changed, so every span looked like DML). With per-commit mode
    classification they refresh green — noop for pure maintenance,
    append fold for mixed spans — and the folded registers/extremes
    equal a from-scratch build of the head bucket for bucket."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
    )

    HLLS = {"nd_val": "val"}
    MM = dict(mins={"min_val": "val"}, maxs={"max_val": "val"})
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    def rows(ks):  # val = k % 13: real duplicate distinct keys per group
        return spark.createDataFrame(
            [(k, k % 5, k % 13) for k in ks], "k long, grp long, val long"
        )

    def mm_expect():
        return {
            r.grp: (r.mn, r.mx)
            for r in snapshot_read(spark, src)
            .groupBy("grp")
            .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
            .collect()
        }

    def mm_got():
        return {
            r.grp: (r.min_val, r.max_val)
            for r in snapshot_read(spark, view).collect()
        }

    snapshot_write(rows(range(0, 60)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS, **MM)

    optimize_snapshots(spark, src)  # v1 — pre-r12 this bricked the view
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS, **MM
    )
    assert (v, mode) == (1, "noop-optimize")
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert mm_got() == mm_expect()

    # mixed span: append v2, OPTIMIZE v3, append v4 — one append fold
    snapshot_write(rows(range(60, 90)), src)
    optimize_snapshots(spark, src)
    snapshot_write(rows(range(90, 140)), src)
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS, **MM
    )
    assert (v, mode) == (4, "incremental-append")
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert mm_got() == mm_expect()
    assert _view(spark, view) == _expect(spark, src)


def test_matview_dml_rescan_groups(spark, tmp_path):
    """VERDICT r11 item 2: on_dml='rescan_groups' upgrades the append-only
    refusal to a surgical repair — the CDF's distinct group keys name the
    affected groups, ONLY their head rows are rescanned, and the
    re-sketched registers/extremes are spliced next to the untouched
    groups' stored state. After a delete (which must LOOSEN a max) and an
    update, the view equals a from-scratch build bucket for bucket."""
    HLLS = {"nd": "dval"}
    MM = dict(mins={"min_val": "val"}, maxs={"max_val": "val"})

    def rows(ks):
        return spark.createDataFrame(
            [(k, k % 5, k * 10, k % 13) for k in ks],
            "k long, grp long, val long, dval long",
        )

    def hll_full():
        from creatorops_lakehouse_spark.operators.hll import hll_registers
        from creatorops_lakehouse_spark.sources.matview import _hll_state

        df = snapshot_read(spark, src)
        state = _hll_state(
            hll_registers(df, "dval", 7, ("grp",)), ["grp"], "nd"
        )
        return {
            r.grp: (tuple((x.bucket, x.rho) for x in r.nd_regs), r.nd)
            for r in state.collect()
        }

    def hll_got():
        return {
            r.grp: (tuple((x.bucket, x.rho) for x in r.nd_regs), r.nd)
            for r in snapshot_read(spark, view).collect()
        }

    def mm_expect():
        return {
            r.grp: (r.mn, r.mx)
            for r in snapshot_read(spark, src)
            .groupBy("grp")
            .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
            .collect()
        }

    def mm_got():
        return {
            r.grp: (r.min_val, r.max_val)
            for r in snapshot_read(spark, view).collect()
        }

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(rows(range(0, 60)), src)  # v0
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS, **MM)
    before_max = mm_got()

    # delete the TOP rows (k 55..59 are each group's max: val = k*10) —
    # the repair must loosen those maxes, which no fold can do
    snapshot_delete_where(spark, src, {"k": (55, 59)})
    # default contract unchanged: refuse loudly
    with pytest.raises(ValueError, match="append-only"):
        refresh_agg_view(
            spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS, **MM
        )
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups", **MM
    )
    assert mode == "incremental-diff-rescan"
    assert mm_got() == mm_expect()
    assert any(
        mm_got()[g][1] < before_max[g][1] for g in mm_got()
    ), "the delete was supposed to loosen at least one group max"
    assert hll_got() == hll_full()
    assert _view(spark, view) == _expect(spark, src)

    # an update changes dval for a band of rows: affected groups'
    # registers must be re-sketched, untouched groups' carried verbatim
    snapshot_update_where(spark, src, {"k": (10, 14)}, {"dval": "dval + 20"})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups", **MM
    )
    assert mode == "incremental-diff-rescan"
    assert hll_got() == hll_full()
    assert mm_got() == mm_expect()
    assert _view(spark, view) == _expect(spark, src)

    # replay no-ops; a pure append afterwards takes the fast path again
    assert refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups", **MM
    )[1] == "noop"
    snapshot_write(rows(range(60, 80)), src)
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups", **MM
    )
    assert mode == "incremental-append"
    assert hll_got() == hll_full()
    assert mm_got() == mm_expect()


def test_matview_rescan_semijoin_path(spark, tmp_path, monkeypatch):
    """The rescan's scale path: above _RESCAN_INLIST_MAX affected keys
    the IN-list inlining gives way to a distributed semi-join (no
    driver-side key materialization). Forced here by pinning the
    threshold to 0 — the repair must be byte-identical either way."""
    import creatorops_lakehouse_spark.sources.matview as mv

    monkeypatch.setattr(mv, "_RESCAN_INLIST_MAX", 0)
    HLLS = {"nd_val": "val"}

    def rows(ks):
        return spark.createDataFrame(
            [(k, k % 5, k % 13) for k in ks], "k long, grp long, val long"
        )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(rows(range(0, 60)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)
    snapshot_delete_where(spark, src, {"k": (5, 25)})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups",
    )
    assert mode == "incremental-diff-rescan"
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert _view(spark, view) == _expect(spark, src)


def test_matview_watermark_advance_cas(spark, tmp_path):
    """The metadata-only watermark advance holds the same CAS invariant
    as the state-rewriting commits: a stale pinned view version aborts
    with SnapshotConflictError instead of publishing over a racing
    refresher's commit."""
    from creatorops_lakehouse_spark.sources.matview import _advance_watermark
    from creatorops_lakehouse_spark.sources.snapshots import (
        SnapshotConflictError,
        optimize_snapshots,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(_rows(spark, range(0, 30)), src)
    create_agg_view(spark, src, view, KEYS, SUMS)
    optimize_snapshots(spark, src)
    with pytest.raises(SnapshotConflictError):
        _advance_watermark(view, 7, 1)  # view head is 0, not 7
    # and the real advance still lands after the failed attempt
    v, mode = refresh_agg_view(spark, src, view, KEYS, SUMS, ROW_KEY)
    assert (v, mode) == (1, "noop-optimize")


def test_matview_hist_quantile_keeps_empty_groups(spark, tmp_path):
    """A group whose histogram measure column was all-NULL stores an
    empty histogram; matview_hist_quantile must return that group with a
    NULL q_bin (percentile-of-no-rows), not silently drop it into the
    void of a downstream inner join."""
    from creatorops_lakehouse_spark.sources.matview import (
        matview_hist_quantile,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    df = spark.createDataFrame(
        [(k, k % 3, k * 10, None if k % 3 == 2 else k % 50) for k in range(30)],
        "k long, grp long, val long, hv int",
    )
    snapshot_write(df, src)
    create_agg_view(
        spark, src, view, KEYS, SUMS, hists={"h": ("hv", 0, 50, 10)}
    )
    q = {
        r.grp: r.q_bin
        for r in matview_hist_quantile(
            snapshot_read(spark, view), "h", ["grp"], 5000
        ).collect()
    }
    assert set(q) == {0, 1, 2}
    assert q[2] is None
    assert q[0] is not None and q[1] is not None


def test_matview_name_collisions_refused(spark, tmp_path):
    """Output-name collisions anywhere in the view's schema — with the
    grouping keys or with the derived sketch-state suffix columns — are
    refused at the API, not surfaced as ambiguous-column errors deep in
    a refresh."""
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    with pytest.raises(ValueError, match="collide"):
        create_agg_view(spark, src, view, ["grp"], {"grp": "val"})
    with pytest.raises(ValueError, match="collide"):
        create_agg_view(
            spark, src, view, ["grp"], {"x_regs": "val"}, hlls={"x": "val"}
        )
    with pytest.raises(ValueError, match="collide"):
        create_agg_view(
            spark, src, view, ["grp"], {"x_cms": "val"},
            cmss={"x": "val"},
        )


def test_matview_cascade_silver_gold(spark, tmp_path):
    """View-over-view (VERDICT r11 item 5): a gold view whose SOURCE is
    the silver view. The child's watermark chains on the PARENT's
    version; parent refreshes commit as overwrites, so the child folds
    the parent's key-level CDF — O(changed parent groups), never a fact
    scan. After appends, DML, and group death the chain equals a
    from-scratch rollup of the source head at both levels."""
    from creatorops_lakehouse_spark.sources.matview import refresh_cascade

    src = TableSpec("mv.src", str(tmp_path / "src"))
    silver = TableSpec("mv.silver", str(tmp_path / "silver"))
    gold = TableSpec("mv.gold", str(tmp_path / "gold"))

    def rows(ks):  # fine groups k%10, coarse groups (k%10)%3
        return spark.createDataFrame(
            [(k, k % 10, k * 10) for k in ks], "k long, grp long, val long"
        )

    g_enrich = lambda df: df.withColumn("cgrp", F.col("grp") % 3)  # noqa: E731
    S = dict(src=src, view=silver, keys=["grp"], sums={"sum_val": "val"},
             row_key=["k"])
    G = dict(src=silver, view=gold, keys=["cgrp"],
             sums={"sum_val": "sum_val", "src_rows": "n_rows"},
             row_key=["grp"], enrich=g_enrich)

    def gold_expect():
        return {
            r.cgrp: (r.n, r.s, r.sr)
            for r in snapshot_read(spark, src)
            .groupBy((F.col("grp") % 3).alias("cgrp"))
            .agg(
                F.count_distinct("grp").cast("long").alias("n"),
                F.sum("val").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("sr"),
            )
            .collect()
        }

    def gold_got():
        return {
            r.cgrp: (r.n_rows, r.sum_val, r.src_rows)
            for r in snapshot_read(spark, gold).collect()
        }

    snapshot_write(rows(range(0, 50)), src)
    create_agg_view(spark, src, silver, **{k: S[k] for k in ("keys", "sums")},
                    )
    create_agg_view(spark, silver, gold, G["keys"], G["sums"],
                    enrich=g_enrich)
    assert gold_got() == gold_expect()

    # append → cascade: silver takes the fast path, gold folds the
    # parent CDF (parent overwrites are DML to the child)
    snapshot_write(rows(range(50, 80)), src)
    modes = refresh_cascade(spark, [S, G])
    assert modes[0][1] == "incremental-append"
    assert modes[1][1] == "incremental-diff"
    assert gold_got() == gold_expect()

    # DML on the fact → both levels diff; equality holds
    snapshot_delete_where(spark, src, {"k": (10, 30)})
    snapshot_update_where(spark, src, {"k": (40, 60)}, {"val": "val + 7"})
    modes = refresh_cascade(spark, [S, G])
    assert modes[0][1] == "incremental-diff"
    assert modes[1][1] == "incremental-diff"
    assert gold_got() == gold_expect()

    # no new source commits → the whole chain no-ops
    modes = refresh_cascade(spark, [S, G])
    assert [m for _, m in modes] == ["noop", "noop"]

    # fact-level group death cascades: kill every row of grp 7 (k%10==7)
    for k in (7, 17, 27, 37, 47, 57, 67, 77):
        snapshot_delete_where(spark, src, {"k": (k, k)})
    modes = refresh_cascade(spark, [S, G])
    assert gold_got() == gold_expect()
    silver_groups = {
        r.grp for r in snapshot_read(spark, silver).collect()
    }
    assert 7 not in silver_groups


def test_matview_cascade_optimize_propagates_noop(spark, tmp_path):
    """Maintenance composes down the chain: an OPTIMIZE on the fact
    table advances the silver watermark as a content-noop, and the
    silver 'matview_watermark' commit is itself a content-noop to the
    gold view — neither level folds anything."""
    from creatorops_lakehouse_spark.sources.matview import refresh_cascade
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    silver = TableSpec("mv.silver", str(tmp_path / "silver"))
    gold = TableSpec("mv.gold", str(tmp_path / "gold"))
    g_enrich = lambda df: df.withColumn("cgrp", F.col("grp") % 2)  # noqa: E731
    S = dict(src=src, view=silver, keys=["grp"], sums={"sum_val": "val"},
             row_key=["k"])
    G = dict(src=silver, view=gold, keys=["cgrp"],
             sums={"sum_val": "sum_val"}, row_key=["grp"], enrich=g_enrich)

    snapshot_write(_rows(spark, range(0, 40)), src)
    create_agg_view(spark, src, silver, S["keys"], S["sums"])
    create_agg_view(spark, silver, gold, G["keys"], G["sums"],
                    enrich=g_enrich)

    optimize_snapshots(spark, src)
    modes = refresh_cascade(spark, [S, G])
    assert [m for _, m in modes] == ["noop-optimize", "noop-optimize"]

    # and data still flows after the maintenance pass
    snapshot_write(_rows(spark, range(40, 60)), src)
    modes = refresh_cascade(spark, [S, G])
    assert modes[0][1] == "incremental-append"
    assert modes[1][1] == "incremental-diff"
    got = {
        r.cgrp: r.sum_val for r in snapshot_read(spark, gold).collect()
    }
    exp = {
        r.cgrp: r.s
        for r in snapshot_read(spark, src)
        .groupBy((F.col("grp") % 2).alias("cgrp"))
        .agg(F.sum("val").cast("long").alias("s"))
        .collect()
    }
    assert got == exp


def test_matview_cascade_racing_refreshers(spark, tmp_path):
    """Parent and child refreshers racing in threads: every commit is
    CAS-guarded, so any interleaving converges — after the dust settles
    one final ordered cascade must land on the from-scratch rollup with
    no double-fold."""
    import threading

    from creatorops_lakehouse_spark.sources.matview import refresh_cascade

    src = TableSpec("mv.src", str(tmp_path / "src"))
    silver = TableSpec("mv.silver", str(tmp_path / "silver"))
    gold = TableSpec("mv.gold", str(tmp_path / "gold"))
    g_enrich = lambda df: df.withColumn("cgrp", F.col("grp") % 2)  # noqa: E731
    S = dict(src=src, view=silver, keys=["grp"], sums={"sum_val": "val"},
             row_key=["k"])
    G = dict(src=silver, view=gold, keys=["cgrp"],
             sums={"sum_val": "sum_val"}, row_key=["grp"], enrich=g_enrich)

    snapshot_write(_rows(spark, range(0, 30)), src)
    create_agg_view(spark, src, silver, S["keys"], S["sums"])
    create_agg_view(spark, silver, gold, G["keys"], G["sums"],
                    enrich=g_enrich)

    snapshot_write(_rows(spark, range(30, 60)), src)
    snapshot_write(_rows(spark, range(60, 90)), src)

    errs = []

    def refresh_stage(st):
        try:
            refresh_agg_view(spark, **st)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [
        threading.Thread(target=refresh_stage, args=(st,))
        for st in (S, S, G, G)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    refresh_cascade(spark, [S, G])  # settle ordering, then check
    got = {
        r.cgrp: (r.n_rows, r.sum_val)
        for r in snapshot_read(spark, gold).collect()
    }
    exp = {
        r.cgrp: (r.n, r.s)
        for r in snapshot_read(spark, src)
        .groupBy((F.col("grp") % 2).alias("cgrp"))
        .agg(
            F.count_distinct("grp").cast("long").alias("n"),
            F.sum("val").cast("long").alias("s"),
        )
        .collect()
    }
    assert got == exp


def test_matview_rescan_through_mixed_dml_optimize_span(spark, tmp_path):
    """DML and OPTIMIZE in the SAME span: the walk classifies it DML
    (the optimize is a noop step but the delete isn't), the CDF between
    the pinned endpoints sees through the rewrite, and the rescan reads
    affected groups from the post-OPTIMIZE head — state still equals a
    from-scratch build bucket for bucket."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        optimize_snapshots,
    )

    HLLS = {"nd_val": "val"}

    def rows(ks):
        return spark.createDataFrame(
            [(k, k % 5, k % 13) for k in ks], "k long, grp long, val long"
        )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(rows(range(0, 60)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)

    snapshot_write(rows(range(60, 80)), src)       # append
    snapshot_delete_where(spark, src, {"k": (5, 25)})  # DML
    optimize_snapshots(spark, src)                 # pack it all
    snapshot_write(rows(range(80, 100)), src)      # append after pack

    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups",
    )
    assert mode == "incremental-diff-rescan"
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert _view(spark, view) == _expect(spark, src)


def test_matview_rescan_prunes_clustered_source(spark, tmp_path):
    """When the source layout separates group keys across commit dirs
    (per-band appends here; OPTIMIZE ZORDER BY grp at scale), the rescan
    repair's IN-set read proves most dirs disjoint from its manifest
    stats — repair I/O ∝ touched groups, not the table — and the
    repaired state still equals a from-scratch build."""
    from creatorops_lakehouse_spark.sources.snapshots import pruned_dirs

    HLLS = {"nd_val": "val"}
    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))

    def band(g, lo, hi):  # one grp per commit dir -> tight grp stats
        return spark.createDataFrame(
            [(g * 1000 + k, g, k % 13) for k in range(lo, hi)],
            "k long, grp long, val long",
        )

    for g in range(5):
        snapshot_write(band(g, 0, 40), src)  # v0..v4, one grp per dir
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS)

    # delete a slice of grp 2 only (k 2000..2019 lives in grp 2's dir)
    snapshot_delete_where(spark, src, {"k": (2000, 2019)})
    v_now = 5
    kept, skipped = pruned_dirs(src, {}, version=v_now, eq_in={"grp": [2]})
    assert len(skipped) >= 3, (
        f"grp-banded dirs should prune for the affected-key IN-set "
        f"(kept {len(kept)}, skipped {len(skipped)})"
    )

    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS,
        on_dml="rescan_groups",
    )
    assert mode == "incremental-diff-rescan"
    assert _hll_view(spark, view) == _hll_full(spark, src)
    assert _view(spark, view) == _expect(spark, src)


def test_matview_cascade_depth3(spark, tmp_path):
    """Three-level chain (bronze fact → silver → gold → platinum): the
    chaining argument is inductive — each child folds its parent's CDF —
    so depth composes without new machinery. After appends and DML the
    top of the chain equals a from-scratch rollup of the fact head."""
    from creatorops_lakehouse_spark.sources.matview import refresh_cascade

    src = TableSpec("mv.src", str(tmp_path / "src"))
    silver = TableSpec("mv.silver", str(tmp_path / "silver"))
    gold = TableSpec("mv.gold", str(tmp_path / "gold"))
    plat = TableSpec("mv.plat", str(tmp_path / "plat"))

    def rows(ks):  # fine k%12 → mid %4 → coarse %2
        return spark.createDataFrame(
            [(k, k % 12, k * 10) for k in ks], "k long, grp long, val long"
        )

    g_enrich = lambda df: df.withColumn("g4", F.col("grp") % 4)  # noqa: E731
    p_enrich = lambda df: df.withColumn("g2", F.col("g4") % 2)  # noqa: E731
    S = dict(src=src, view=silver, keys=["grp"], sums={"sum_val": "val"},
             row_key=["k"])
    G = dict(src=silver, view=gold, keys=["g4"],
             sums={"sum_val": "sum_val", "fact_rows": "n_rows"},
             row_key=["grp"], enrich=g_enrich)
    P = dict(src=gold, view=plat, keys=["g2"],
             sums={"sum_val": "sum_val", "fact_rows": "fact_rows"},
             row_key=["g4"], enrich=p_enrich)

    snapshot_write(rows(range(0, 60)), src)
    create_agg_view(spark, src, silver, S["keys"], S["sums"])
    create_agg_view(spark, silver, gold, G["keys"], G["sums"],
                    enrich=g_enrich)
    create_agg_view(spark, gold, plat, P["keys"], P["sums"],
                    enrich=p_enrich)

    snapshot_write(rows(range(60, 100)), src)
    snapshot_delete_where(spark, src, {"k": (10, 30)})
    refresh_cascade(spark, [S, G, P])

    got = {
        r.g2: (r.sum_val, r.fact_rows)
        for r in snapshot_read(spark, plat).collect()
    }
    exp = {
        r.g2: (r.s, r.n)
        for r in snapshot_read(spark, src)
        .groupBy(((F.col("grp") % 4) % 2).alias("g2"))
        .agg(
            F.sum("val").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    }
    assert got == exp
    # settled chain no-ops at every level
    assert [m for _, m in refresh_cascade(spark, [S, G, P])] == ["noop"] * 3


def test_matview_sqsums_variance_class(spark, tmp_path):
    """Exact sum-of-squares measures (``sqsums``): linear in row
    multiplicity like SUM, so they fold through appends AND the ±1 CDF
    fallback; stored as DECIMAL(38,0) with the square computed through
    DECIMAL(19,0) so 64-bit values never silently wrap. After every
    refresh the stored s2 equals a from-scratch Σx², and (n, s1, s2)
    derive the exact population variance numerator."""
    SQ = {"sq_val": "val"}

    def rows(ks):  # values big enough that val*val overflows... no -
        # keep honest magnitudes: val up to ~4e9 so val² > 2^63 exercises
        # the decimal path on real overflow territory
        return spark.createDataFrame(
            [(k, k % 5, (k % 7) * 700_000_000) for k in ks],
            "k long, grp long, val long",
        )

    def expect_s2():
        return {
            r.grp: str(r.s2)
            for r in snapshot_read(spark, src)
            .groupBy("grp")
            .agg(
                F.sum(
                    F.col("val").cast("decimal(19,0)")
                    * F.col("val").cast("decimal(19,0)")
                ).cast("decimal(38,0)").alias("s2")
            )
            .collect()
        }

    def got_s2():
        return {
            r.grp: str(r.sq_val)
            for r in snapshot_read(spark, view).collect()
        }

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(rows(range(0, 40)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, sqsums=SQ)
    assert got_s2() == expect_s2()
    # a single row's square exceeds 2^63 — the long path would have
    # wrapped; the decimal path must hold the exact value
    assert any(int(v) > 2**63 for v in got_s2().values())

    snapshot_write(rows(range(40, 90)), src)
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, sqsums=SQ
    )
    assert mode == "incremental-append"
    assert got_s2() == expect_s2()

    # DML folds squares with ±1 weights — no refusal (linear measure)
    snapshot_delete_where(spark, src, {"k": (10, 25)})
    snapshot_update_where(spark, src, {"k": (30, 45)}, {"val": "val + 3"})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, sqsums=SQ
    )
    assert mode == "incremental-diff"
    assert got_s2() == expect_s2()
    assert _view(spark, view) == _expect(spark, src)


def test_matview_cascade_parent_maintenance(spark, tmp_path):
    """Maintenance on the PARENT VIEW's own table composes with the
    chain: OPTIMIZE on silver is a content-noop to gold (noop-optimize,
    nothing folds), and a vacuum that reclaims gold's watermark version
    of silver forces gold to FULL-REBUILD from the silver head — never a
    wrong answer, and the chain keeps flowing afterwards."""
    from creatorops_lakehouse_spark.sources.matview import refresh_cascade
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        optimize_snapshots,
        vacuum_snapshots,
    )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    silver = TableSpec("mv.silver", str(tmp_path / "silver"))
    gold = TableSpec("mv.gold", str(tmp_path / "gold"))
    g_enrich = lambda df: df.withColumn("cgrp", F.col("grp") % 2)  # noqa: E731
    S = dict(src=src, view=silver, keys=["grp"], sums={"sum_val": "val"},
             row_key=["k"])
    G = dict(src=silver, view=gold, keys=["cgrp"],
             sums={"sum_val": "sum_val"}, row_key=["grp"], enrich=g_enrich)

    def gold_ok():
        got = {
            r.cgrp: r.sum_val
            for r in snapshot_read(spark, gold).collect()
        }
        exp = {
            r.cgrp: r.s
            for r in snapshot_read(spark, src)
            .groupBy((F.col("grp") % 2).alias("cgrp"))
            .agg(F.sum("val").cast("long").alias("s"))
            .collect()
        }
        assert got == exp

    snapshot_write(_rows(spark, range(0, 40)), src)
    create_agg_view(spark, src, silver, S["keys"], S["sums"])
    create_agg_view(spark, silver, gold, G["keys"], G["sums"],
                    enrich=g_enrich)

    # OPTIMIZE the PARENT VIEW itself: a content-noop commit on silver,
    # so gold advances free
    optimize_snapshots(spark, silver)
    v, mode = refresh_agg_view(spark, silver, gold, G["keys"], G["sums"],
                               G["row_key"], enrich=g_enrich)
    assert mode == "noop-optimize"
    gold_ok()

    # grow the chain a few refreshes, then vacuum silver's history past
    # gold's watermark: the delta is unreconstructible -> full-rebuild
    for lo in (40, 60, 80):
        snapshot_write(_rows(spark, range(lo, lo + 20)), src)
        refresh_agg_view(spark, **S)  # silver advances, gold does NOT
    checkpoint_manifest(silver)
    vacuum_snapshots(silver, keep_last=1)
    v, mode = refresh_agg_view(spark, silver, gold, G["keys"], G["sums"],
                               G["row_key"], enrich=g_enrich)
    assert mode == "full-rebuild"
    gold_ok()

    # and the chain keeps flowing incrementally afterwards
    snapshot_write(_rows(spark, range(100, 120)), src)
    modes = refresh_cascade(spark, [S, G])
    assert modes[0][1] == "incremental-append"
    assert modes[1][1] == "incremental-diff"
    gold_ok()


def test_matview_null_group_keys(spark, tmp_path):
    """SQL GROUP BY puts every NULL key in ONE group, but Spark's
    ``on=[names]`` join matches null-UNSAFELY — before r12's _key_join,
    each refresh added another duplicate NULL-group row to the view.
    Pinned here through every path and measure class: create, append
    fold (sums + sqsums + hll + minmax), CDF diff (linear measures),
    rescan repair (append-only measures), and group death."""
    HLLS = {"nd": "dval"}
    MM = dict(mins={"min_val": "val"}, maxs={"max_val": "val"})
    SQ = {"sq_val": "val"}

    def rows(ks):  # every third k lands in the NULL group
        return spark.createDataFrame(
            [
                (k, None if k % 3 == 0 else k % 4, k * 10, k % 7)
                for k in ks
            ],
            "k long, grp long, val long, dval long",
        )

    def expect():
        return {
            r.grp: (r.n, r.s)
            for r in snapshot_read(spark, src)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
            .collect()
        }

    def got():
        out = {}
        for r in snapshot_read(spark, view).collect():
            assert r.grp not in out, (
                f"duplicate view row for group {r.grp!r} — the null-safe "
                "merge regressed"
            )
            out[r.grp] = (r.n_rows, r.sum_val)
        return out

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    snapshot_write(rows(range(0, 30)), src)
    create_agg_view(spark, src, view, KEYS, SUMS, hlls=HLLS, sqsums=SQ, **MM)
    assert got() == expect()
    assert None in got(), "the NULL group must exist as ONE row"

    # append fold: NULL-group delta must merge into the stored NULL row
    snapshot_write(rows(range(30, 60)), src)
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS, sqsums=SQ, **MM
    )
    assert mode == "incremental-append"
    assert got() == expect()

    # DML + rescan: the NULL group's extremes/registers repair too
    # (the IN-list path cannot express a NULL key — the semi-join
    # fallback must kick in)
    snapshot_delete_where(spark, src, {"k": (0, 10)})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS, SUMS, ROW_KEY, hlls=HLLS, sqsums=SQ,
        on_dml="rescan_groups", **MM
    )
    assert mode == "incremental-diff-rescan"
    assert got() == expect()
    mm_expect = {
        r.grp: (r.mn, r.mx)
        for r in snapshot_read(spark, src)
        .groupBy("grp")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .collect()
    }
    mm_got = {
        r.grp: (r.min_val, r.max_val)
        for r in snapshot_read(spark, view).collect()
    }
    assert mm_got == mm_expect

    # plain linear diff on a view without append-only measures
    src2 = TableSpec("mv.src2", str(tmp_path / "src2"))
    view2 = TableSpec("mv.view2", str(tmp_path / "view2"))
    snapshot_write(rows(range(0, 30)), src)  # no-op guard: distinct paths
    snapshot_write(rows(range(0, 40)), src2)
    create_agg_view(spark, src2, view2, KEYS, SUMS, sqsums=SQ)
    snapshot_delete_where(spark, src2, {"k": (0, 6)})  # kills NULL rows too
    v, mode = refresh_agg_view(
        spark, src2, view2, KEYS, SUMS, ROW_KEY, sqsums=SQ
    )
    assert mode == "incremental-diff"
    exp2 = {
        r.grp: (r.n, r.s)
        for r in snapshot_read(spark, src2)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    got2 = {}
    for r in snapshot_read(spark, view2).collect():
        assert r.grp not in got2
        got2[r.grp] = (r.n_rows, r.sum_val)
    assert got2 == exp2


def test_matview_rescan_composite_key_pruned(spark, tmp_path, monkeypatch):
    """VERDICT r12 item 3: a COMPOSITE group key no longer forces the
    rescan repair onto a full head scan — the single most-pruning
    physical key column (measured as planned commit dirs via the
    manifest stats, metadata-only) carries an IN-set pruned read and the
    exact multi-key null-safe semi-join stays as the residual. On a
    source clustered by that column the repair plans ONLY the touched
    band's commits, and the spliced state still equals a from-scratch
    build bucket for bucket."""
    import creatorops_lakehouse_spark.sources.snapshots as sn
    from creatorops_lakehouse_spark.sources.matview import _hll_state
    from creatorops_lakehouse_spark.operators.hll import hll_registers

    KEYS2 = ["band", "parity"]
    HLLS = {"nd": "dval"}

    def rows(ks):
        # band = k // 20 (clustered: each commit is one band), parity
        # spans every commit (low dir selectivity — the wrong prune)
        return spark.createDataFrame(
            [(k, k // 20, k % 2, k * 10, k % 13) for k in ks],
            "k long, band long, parity long, val long, dval long",
        )

    src = TableSpec("mv.src", str(tmp_path / "src"))
    view = TableSpec("mv.view", str(tmp_path / "view"))
    for b in range(5):  # five band-clustered commits: band stats prune
        snapshot_write(rows(range(b * 20, (b + 1) * 20)), src)
    create_agg_view(
        spark, src, view, KEYS2, SUMS, hlls=HLLS,
        mins={"min_val": "val"}, maxs={"max_val": "val"},
    )

    calls = []
    orig = sn.snapshot_read_where

    def spy(spark_, spec_, ranges=None, version=None, eq_in=None):
        calls.append(eq_in)
        return orig(spark_, spec_, ranges=ranges, version=version, eq_in=eq_in)

    monkeypatch.setattr(sn, "snapshot_read_where", spy)

    # delete band 1's top rows: the repair must loosen maxes in (1, *)
    snapshot_delete_where(spark, src, {"k": (35, 39)})
    v, mode = refresh_agg_view(
        spark, src, view, KEYS2, SUMS, ROW_KEY, hlls=HLLS,
        mins={"min_val": "val"}, maxs={"max_val": "val"},
        on_dml="rescan_groups",
    )
    assert mode == "incremental-diff-rescan"
    # the prune chose the clustered column and read a strict dir subset
    assert calls and list(calls[-1].keys()) == ["band"]
    assert set(calls[-1]["band"]) == {1}
    head_v = sn.current_version(src)
    kept, _ = sn.pruned_dirs(src, {}, head_v, eq_in=calls[-1])
    total = len(sn._read_manifest(src, head_v)["dirs"])
    assert len(kept) < total, "clustered layout was supposed to prune"

    # state equals a from-scratch build: counts/sums/extremes/registers
    got = {
        (r.band, r.parity): (r.n_rows, r.sum_val, r.min_val, r.max_val)
        for r in snapshot_read(spark, view).collect()
    }
    want = {
        (r.band, r.parity): (r.n, r.s, r.mn, r.mx)
        for r in snapshot_read(spark, src)
        .groupBy("band", "parity")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"),
            F.min("val").alias("mn"), F.max("val").alias("mx"),
        )
        .collect()
    }
    assert got == want
    full = _hll_state(
        hll_registers(snapshot_read(spark, src), "dval", 7, ("band", "parity")),
        ["band", "parity"], "nd",
    )
    assert {
        (r.band, r.parity): tuple((x.bucket, x.rho) for x in r.nd_regs)
        for r in full.collect()
    } == {
        (r.band, r.parity): tuple((x.bucket, x.rho) for x in r.nd_regs)
        for r in snapshot_read(spark, view).collect()
    }
