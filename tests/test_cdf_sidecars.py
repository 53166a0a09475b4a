"""CDF-at-write change sidecars (VERDICT r12 item 1): every DML rewrite
persists its removed/added rows as a per-commit ``_cdf/`` sidecar —
Delta's change-data files — and ``snapshot_diff`` assembles a span's
feed from sidecars + appended dirs in O(changed rows), falling back to
the O(2×table) anti-join recompute only when the span isn't covered.
The invariant under test: sidecar-assembled CDF == recomputed CDF,
row for row, for every DML shape and for mixed spans."""

from __future__ import annotations

import os

from creatorops_lakehouse_spark.sources.matview import (
    create_agg_view,
    refresh_agg_view,
)
from creatorops_lakehouse_spark.sources.snapshots import (
    _read_manifest,
    _sidecar_span_diff,
    current_version,
    optimize_snapshots,
    snapshot_delete_where,
    snapshot_diff,
    snapshot_merge,
    snapshot_merge_clauses,
    snapshot_read,
    snapshot_replace_where,
    snapshot_update_where,
    snapshot_write,
    vacuum_snapshots,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec


def _feed(df):
    return {tuple(r) for r in df.collect()}


def _both_ways(spark, spec, v_from, v_to, keys, detect_updates=False):
    """(sidecar-assembled feed, recomputed feed) for the same span."""
    fast = _sidecar_span_diff(spark, spec, v_from, v_to, keys, detect_updates)
    slow = snapshot_diff(
        spark, spec, v_from, v_to, keys,
        detect_updates=detect_updates, use_sidecars=False,
    )
    return fast, slow


def _mk(spark, tmp_path, rows):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame(rows, ["id", "v", "cents"]), spec)
    return spec


def test_every_dml_shape_writes_a_sidecar_and_matches_recompute(
    spark, tmp_path
):
    spec = _mk(
        spark, tmp_path,
        [(i, chr(97 + i % 5), i * 10) for i in range(1, 21)],
    )
    # v1 DELETE (copy-on-write)
    snapshot_delete_where(spark, spec, {"id": (1, 3)})
    # v2 UPDATE
    snapshot_update_where(
        spark, spec, {"id": (4, 6)}, {"cents": "cents + 1000"}
    )
    # v3 MERGE (whole-row upsert: update id 7, insert id 100)
    snapshot_merge(
        spark, spec,
        spark.createDataFrame([(7, "Z", 7), (100, "n", 0)], ["id", "v", "cents"]),
        keys=["id"],
    )
    # v4 full-clause MERGE: delete id 8, bump id 9, insert id 101
    snapshot_merge_clauses(
        spark, spec,
        spark.createDataFrame(
            [(8, "D", 0), (9, "U", 0), (101, "n", 5)], ["id", "v", "cents"]
        ),
        keys=["id"],
        matched_delete="src_v = 'D'",
        matched_update={"cents": "cents + src_cents + 7"},
    )
    # v5 replaceWhere a band
    snapshot_replace_where(
        spark, spec,
        spark.createDataFrame([(10, "r", -1), (11, "r", -2)], ["id", "v", "cents"]),
        {"id": (10, 12)},
    )
    # v6 merge-on-read DELETE (deletion vector)
    snapshot_delete_where(spark, spec, {"id": (13, 14)}, rewrite=False)
    head = current_version(spec)
    assert head == 6
    for v in range(1, head + 1):
        assert "cdf" in _read_manifest(spec, v), f"v{v} missing sidecar"
    # every consecutive span and the full span, both feed flavors
    for det in (False, True):
        for v_from in range(0, head):
            fast, slow = _both_ways(
                spark, spec, v_from, head, ["id"], detect_updates=det
            )
            assert fast is not None, f"span {v_from}->{head} not covered"
            assert _feed(fast) == _feed(slow), (v_from, det)


def test_mixed_span_appends_optimize_dml(spark, tmp_path):
    spec = _mk(spark, tmp_path, [(i, "a", i) for i in range(1, 11)])
    snapshot_write(
        spark.createDataFrame([(11, "b", 11), (12, "b", 12)], ["id", "v", "cents"]),
        spec,
    )  # v1 append
    snapshot_delete_where(spark, spec, {"id": (2, 2)})  # v2 dml
    optimize_snapshots(spark, spec)  # v3 layout noop
    snapshot_write(
        spark.createDataFrame([(13, "c", 13)], ["id", "v", "cents"]), spec
    )  # v4 append
    snapshot_update_where(spark, spec, {"id": (11, 11)}, {"v": "'B'"})  # v5
    head = current_version(spec)
    for det in (False, True):
        fast, slow = _both_ways(spark, spec, 0, head, ["id"], det)
        assert fast is not None
        assert _feed(fast) == _feed(slow)
    # the appended-then-updated key surfaces once with its FINAL payload
    feed = _feed(snapshot_diff(spark, spec, 0, head, ["id"]))
    assert (11, "B", 11, "insert") in feed
    assert (11, "b", 11, "insert") not in feed


def test_update_images_via_sidecar(spark, tmp_path):
    spec = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    snapshot_update_where(spark, spec, {"id": (1, 1)}, {"cents": "cents + 5"})
    fast, slow = _both_ways(spark, spec, 0, 1, ["id"], detect_updates=True)
    assert fast is not None
    want = {
        (1, "a", 10, "update_preimage"),
        (1, "a", 15, "update_postimage"),
    }
    assert _feed(fast) == _feed(slow) == want


def test_opt_out_and_uncovered_spans_fall_back(spark, tmp_path):
    spec = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    snapshot_delete_where(spark, spec, {"id": (1, 1)}, write_cdf=False)
    assert "cdf" not in _read_manifest(spec, 1)
    assert _sidecar_span_diff(spark, spec, 0, 1, ["id"], False) is None
    # the public API still answers via the recompute
    feed = _feed(snapshot_diff(spark, spec, 0, 1, ["id"]))
    assert feed == {(1, "a", 10, "delete")}


def test_nonunique_keys_multi_net_falls_back(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame(
            [(1, "a", 1), (1, "b", 2), (2, "c", 3)], ["id", "v", "cents"]
        ),
        spec,
    )
    # BOTH of key 1's rows deleted: two net-negative rows under one key
    # — the net-shape validator rejects the fast path (keys violate the
    # row-identifier contract) and the recompute answers
    snapshot_delete_where(spark, spec, {"cents": (1, 2)})
    assert _sidecar_span_diff(spark, spec, 0, 1, ["id"], False) is None
    feed = _feed(snapshot_diff(spark, spec, 0, 1, ["id"]))
    assert feed == {(1, "a", 1, "delete"), (1, "b", 2, "delete")}


def test_nonunique_keys_single_residue_is_row_exact(spark, tmp_path):
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(
        spark.createDataFrame(
            [(1, "a", 1), (1, "b", 2), (2, "c", 3)], ["id", "v", "cents"]
        ),
        spec,
    )
    # ONE of key 1's two rows deleted: the net residue is shaped exactly
    # like a clean single-row delete, so the validator cannot flag it.
    # Documented divergence (contract-violating input): the sidecar feed
    # reports the ROW that vanished — the answer a ±1-weighted fold
    # needs — while the recompute's key-membership anti-joins emit
    # nothing (key 1 exists at both endpoints) and would silently drop
    # the change from linear consumers.
    snapshot_delete_where(spark, spec, {"cents": (1, 1)})
    fast = _sidecar_span_diff(spark, spec, 0, 1, ["id"], False)
    assert fast is not None
    assert _feed(fast) == {(1, "a", 1, "delete")}
    slow = snapshot_diff(spark, spec, 0, 1, ["id"], use_sidecars=False)
    assert _feed(slow) == set()


def test_dv_delete_sidecar_and_count(spark, tmp_path):
    spec = _mk(spark, tmp_path, [(i, "a", i) for i in range(1, 8)])
    snapshot_delete_where(spark, spec, {"id": (2, 4)}, rewrite=False)
    m = _read_manifest(spec, 1)
    assert m["dv"][-1]["n"] == 3  # counted from the sidecar's files
    fast, slow = _both_ways(spark, spec, 0, 1, ["id"])
    assert fast is not None
    assert _feed(fast) == _feed(slow) == {
        (2, "a", 2, "delete"), (3, "a", 3, "delete"), (4, "a", 4, "delete")
    }


def test_vacuum_reaps_dropped_versions_sidecars(spark, tmp_path):
    spec = _mk(spark, tmp_path, [(i, "a", i) for i in range(1, 6)])
    snapshot_delete_where(spark, spec, {"id": (1, 1)})  # v1
    snapshot_delete_where(spark, spec, {"id": (2, 2)})  # v2
    d1 = _read_manifest(spec, 1)["cdf"]["dir"]
    d2 = _read_manifest(spec, 2)["cdf"]["dir"]
    assert os.path.isdir(os.path.join(spec.path, d1))
    vacuum_snapshots(spec, keep_last=1)
    assert not os.path.isdir(os.path.join(spec.path, d1))
    assert os.path.isdir(os.path.join(spec.path, d2))  # head's survives


def test_matview_refresh_stamps_view_commits_with_group_deltas(
    spark, tmp_path
):
    src = TableSpec("s.snap", str(tmp_path / "s"))
    view = TableSpec("v.snap", str(tmp_path / "v"))
    rows = [(i, f"g{i % 3}", i * 2) for i in range(30)]
    snapshot_write(spark.createDataFrame(rows, ["rk", "g", "x"]), src)
    create_agg_view(spark, src, view, ["g"], {"sum_x": "x"})
    # append touching ONE group, then a DML touching another
    snapshot_write(spark.createDataFrame([(100, "g0", 7)], ["rk", "g", "x"]), src)
    refresh_agg_view(spark, src, view, ["g"], {"sum_x": "x"}, row_key=["rk"])
    snapshot_delete_where(spark, spec=src, ranges={"rk": (3, 3)})  # g0
    refresh_agg_view(spark, src, view, ["g"], {"sum_x": "x"}, row_key=["rk"])
    vh = current_version(view)
    assert vh == 2
    for v in (1, 2):
        m = _read_manifest(view, v)
        assert "cdf" in m
        # the sidecar holds ONLY the touched group's pre/post rows
        side = spark.read.parquet(os.path.join(view.path, m["cdf"]["dir"]))
        assert {r.g for r in side.select("g").distinct().collect()} == {"g0"}
    # a cascade child's diff of the parent view rides the sidecars
    for span in ((0, 1), (1, 2), (0, 2)):
        fast, slow = _both_ways(
            spark, view, *span, ["g"], detect_updates=True
        )
        assert fast is not None
        assert _feed(fast) == _feed(slow)


def test_snapshot_changes_per_commit_feed(spark, tmp_path):
    """table_changes parity: per-commit rows stamped with
    _commit_version; verbatim sidecar rows without keys, key-level
    pre/post images with keys; noop commits contribute nothing."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_changes,
    )

    spec = _mk(spark, tmp_path, [(i, "a", i * 10) for i in range(1, 8)])
    snapshot_write(
        spark.createDataFrame([(8, "b", 80)], ["id", "v", "cents"]), spec
    )  # v1 append
    snapshot_update_where(spark, spec, {"id": (2, 2)}, {"cents": "99"})  # v2
    optimize_snapshots(spark, spec)  # v3 noop
    snapshot_delete_where(spark, spec, {"id": (3, 3)})  # v4

    # keyless: verbatim row-level changes straight from the sidecars
    feed = {
        (r.id, r.cents, r._change_type, r._commit_version)
        for r in snapshot_changes(spark, spec, 0).collect()
    }
    assert feed == {
        (8, 80, "insert", 1),
        (2, 20, "delete", 2), (2, 99, "insert", 2),
        (3, 30, "delete", 4),
    }
    # keyed: per-commit key-level feed with update images
    keyed = {
        (r.id, r.cents, r._change_type, r._commit_version)
        for r in snapshot_changes(spark, spec, 0, keys=["id"]).collect()
    }
    assert keyed == {
        (8, 80, "insert", 1),
        (2, 20, "update_preimage", 2), (2, 99, "update_postimage", 2),
        (3, 30, "delete", 4),
    }
    # bounded span; all-noop span is empty
    assert {
        r._commit_version
        for r in snapshot_changes(spark, spec, 1, 2).collect()
    } == {2}
    assert snapshot_changes(spark, spec, 2, 3).count() == 0


def test_snapshot_changes_refuses_uncovered_without_keys(spark, tmp_path):
    import pytest as _pytest

    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_changes,
    )

    spec = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    snapshot_delete_where(spark, spec, {"id": (1, 1)}, write_cdf=False)
    with _pytest.raises(ValueError, match="no change sidecar"):
        snapshot_changes(spark, spec, 0).collect()
    # keys= recomputes the same feed from the version pair
    got = {
        (r.id, r._change_type, r._commit_version)
        for r in snapshot_changes(spark, spec, 0, keys=["id"]).collect()
    }
    assert got == {(1, "delete", 1)}


def test_consume_changes_exactly_once(spark, tmp_path):
    """Pull-based CDC consumer: initial snapshot, incremental spans that
    compose, caught-up no-op, and crash-safe redelivery via the sink's
    txn watermark."""
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.sources.snapshots import (
        consume_changes,
        snapshot_changes,
    )

    src = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    sink = TableSpec("t.audit", str(tmp_path / "audit"))

    def audit(feed):
        return feed.select(
            "id", "cents", "_change_type", "_commit_version"
        )

    # initial snapshot: head rows as inserts at the head version
    assert consume_changes(spark, src, sink, audit) == (-1, 0)
    assert {
        (r.id, r._change_type, r._commit_version)
        for r in snapshot_read(spark, sink).collect()
    } == {(1, "insert", 0), (2, "insert", 0)}
    # caught up: no-op
    assert consume_changes(spark, src, sink, audit) is None

    snapshot_update_where(spark, spec=src, ranges={"id": (1, 1)},
                          set_exprs={"cents": "cents + 5"})  # v1
    snapshot_write(
        spark.createDataFrame([(3, "c", 30)], ["id", "v", "cents"]), src
    )  # v2
    assert consume_changes(spark, src, sink, audit) == (0, 2)
    got = {
        (r.id, r.cents, r._change_type, r._commit_version)
        for r in snapshot_read(spark, sink).collect()
    }
    assert (1, 10, "delete", 1) in got and (1, 15, "insert", 1) in got
    assert (3, 30, "insert", 2) in got

    # redelivery of an already-consumed span no-ops through the txn map
    n_before = snapshot_read(spark, sink).count()
    assert consume_changes(spark, src, sink, audit) is None
    assert snapshot_read(spark, sink).count() == n_before

    # two incremental calls == the per-commit feed of the whole span
    full = {
        (r.id, r.cents, r._change_type, r._commit_version)
        for r in snapshot_changes(spark, src, 0).collect()
    }
    incremental = {
        t for t in got if t[3] > 0
    }
    assert incremental == full


def test_sidecar_reclaimed_mid_read_falls_back(spark, tmp_path, monkeypatch):
    """A vacuum reclaiming a change sidecar BETWEEN the span assembler's
    plan construction and its execution must downgrade to the endpoint
    recompute — never fail the refresh, never net a partial feed (the
    chaos suite's refresher-vs-vacuum race, reproduced deterministically
    by deleting the sidecar dir right after its lazy read is planned)."""
    import shutil

    from creatorops_lakehouse_spark.sources import snapshots as S

    spec = _mk(spark, tmp_path, [(i, "a", i * 10) for i in range(1, 11)])
    snapshot_delete_where(spark, spec, {"id": (1, 2)})  # v1 + sidecar
    snapshot_update_where(
        spark, spec, {"id": (5, 6)}, {"cents": "cents + 1"}
    )  # v2 + sidecar
    head = current_version(spec)
    slow = _feed(
        snapshot_diff(spark, spec, 0, head, ["id"], use_sidecars=False)
    )

    real = S._read_cdf_sidecar
    hits = {"n": 0}

    def racy(spark_, spec_, entry, schema_json):
        df = real(spark_, spec_, entry, schema_json)
        if df is not None and hits["n"] == 0:
            hits["n"] += 1
            shutil.rmtree(os.path.join(spec_.path, entry["dir"]))
        return df

    monkeypatch.setattr(S, "_read_cdf_sidecar", racy)
    got = snapshot_diff(spark, spec, 0, head, ["id"])  # must not raise
    assert hits["n"] == 1, "race seam never fired"
    assert _feed(got) == slow
