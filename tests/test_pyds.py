"""spark.read.format("snapshot") — the custom Python DataSource over the
snapshot log (sources/pyds.py): schema-from-manifest, time travel,
partition reconstruction, schema-evolution null fill, and advisory
manifest-stats pruning through pushFilters."""

from __future__ import annotations

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.sources.pyds import (
    SnapshotReader,
    register_snapshot_source,
)
from creatorops_lakehouse_spark.sources.snapshots import (
    snapshot_read,
    snapshot_write,
)
from creatorops_lakehouse_spark.sources.tables import TableSpec


def _fmt(spark, path, **opts):
    r = spark.read.format("snapshot").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_snapshot_format_roundtrip_and_time_travel(spark, tmp_path):
    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)

    got = _fmt(spark, spec.path)
    assert [f.name for f in got.schema.fields] == ["id", "v"]
    assert {tuple(r) for r in got.collect()} == {(1, "a"), (2, "b"), (3, "c")}
    # time travel through the format string
    v0 = _fmt(spark, spec.path, version="0")
    assert {tuple(r) for r in v0.collect()} == {(1, "a"), (2, "b")}
    # parity with the native reader
    assert got.count() == snapshot_read(spark, spec).count()


def test_snapshot_format_schema_evolution_null_fill(spark, tmp_path):
    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(
        spark.createDataFrame([(2, "b", 9)], ["id", "v", "extra"]),
        spec,
        merge_schema=True,
    )
    got = _fmt(spark, spec.path)
    assert {tuple(r) for r in got.collect()} == {(1, "a", None), (2, "b", 9)}
    # the pre-evolution version reads with its own (narrower) schema
    v0 = _fmt(spark, spec.path, version="0")
    assert [f.name for f in v0.schema.fields] == ["id", "v"]


def test_snapshot_format_partitioned_hive_reconstruction(spark, tmp_path):
    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("p",))
    snapshot_write(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y"), (3, "c", None)], ["id", "v", "p"]
        ),
        spec,
    )
    got = _fmt(spark, spec.path)
    assert {tuple(r) for r in got.collect()} == {
        (1, "a", "x"), (2, "b", "y"), (3, "c", None),
    }
    # filters over the reconstructed partition column behave normally
    assert got.filter(F.col("p") == "x").count() == 1


def test_snapshot_format_pushdown_prunes_dirs(spark, tmp_path):
    """pushFilters drops commit dirs whose manifest stats prove them
    disjoint — and never changes results (Spark re-applies all filters)."""
    from pyspark.sql.datasource import GreaterThan, LessThan

    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.range(0, 100).selectExpr("id", "id * 2 AS v"), spec)
    snapshot_write(spark.range(1000, 1100).selectExpr("id", "id * 2 AS v"), spec)

    # unit-level: the reader's partition list shrinks under a disjoint range
    r_all = SnapshotReader(snapshot_read(spark, spec).schema, {"path": spec.path})
    n_all = len(r_all.partitions())
    r_f = SnapshotReader(snapshot_read(spark, spec).schema, {"path": spec.path})
    kept = list(r_f.pushFilters([GreaterThan(("id",), 500)]))
    assert len(kept) == 1  # every filter handed back to Spark
    assert 0 < len(r_f.partitions()) < n_all

    # a filter spanning both commits prunes nothing
    r_s = SnapshotReader(snapshot_read(spark, spec).schema, {"path": spec.path})
    list(r_s.pushFilters([LessThan(("id",), 5000)]))
    assert len(r_s.partitions()) == n_all

    # end-to-end: results identical to the native reader under the filter
    register_snapshot_source(spark)
    got = _fmt(spark, spec.path).filter("id > 500")
    want = snapshot_read(spark, spec).filter("id > 500")
    assert got.count() == want.count() == 100
    assert {r.id for r in got.collect()} == {r.id for r in want.collect()}


def _run_stream(spark, path, out_name, ckpt, **opts):
    """Run the snapshot stream availableNow and return the emitted rows.
    foreachBatch (not the memory sink — it cannot recover from a
    checkpoint, and restart-resume is exactly what these tests pin)."""
    del out_name
    rows: list[tuple] = []

    def collect_batch(batch_df, _bid):
        rows.extend(tuple(r) for r in batch_df.collect())

    reader = spark.readStream.format("snapshot").option("path", path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return rows


def test_snapshot_stream_source_versions_as_offsets(spark, tmp_path):
    """readStream.format('snapshot'): each append commit is a micro-batch,
    checkpoint restart resumes at the committed version, startingVersion
    skips history."""
    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), spec)
    ckpt = str(tmp_path / "ckpt")

    got = _run_stream(spark, spec.path, "snap_s1", ckpt)
    assert set(got) == {(1, "a"), (2, "b"), (3, "c")}

    # two more commits land; the restarted stream emits ONLY them
    snapshot_write(spark.createDataFrame([(4, "d")], ["id", "v"]), spec)
    snapshot_write(spark.createDataFrame([(5, "e")], ["id", "v"]), spec)
    got2 = _run_stream(spark, spec.path, "snap_s2", ckpt)
    assert set(got2) == {(4, "d"), (5, "e")}

    # restart with nothing new: empty batch, no re-emission
    got3 = _run_stream(spark, spec.path, "snap_s3", ckpt)
    assert got3 == []

    # startingVersion=3 streams only versions >= 3 on a fresh checkpoint
    got4 = _run_stream(
        spark, spec.path, "snap_s4", str(tmp_path / "ckpt2"), startingVersion="3"
    )
    assert set(got4) == {(5, "e")}


def test_snapshot_stream_rejects_rewrites_unless_ignore_changes(
    spark, tmp_path
):
    """A non-append commit fails the stream by default (rewritten dirs
    would re-emit streamed rows); ignoreChanges=true emits new files and
    keeps going — Delta's documented contract."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a")], ["id", "v"]), spec)
    snapshot_write(
        spark.createDataFrame([(9, "z")], ["id", "v"]), spec, mode="overwrite"
    )
    try:
        _run_stream(spark, spec.path, "snap_rw1", str(tmp_path / "c1"))
        raise AssertionError("overwrite commit must fail the strict stream")
    except (StreamingQueryException, Py4JJavaError, Exception) as e:  # noqa: BLE001
        assert "ignoreChanges" in str(e)

    got = _run_stream(
        spark, spec.path, "snap_rw2", str(tmp_path / "c2"), ignoreChanges="true"
    )
    assert set(got) == {(1, "a"), (9, "z")}


def test_snapshot_to_snapshot_incremental_pipeline(spark, tmp_path):
    """The composed loop: readStream.format('snapshot') out of a source
    table → transform → exactly-once append into a destination snapshot
    table. Restarting after new source commits moves ONLY the delta, and
    a full re-run of the stream never duplicates destination rows."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        current_version,
        snapshot_read,
    )
    from creatorops_lakehouse_spark.streaming.pipeline import (
        start_exactly_once_sink,
    )

    register_snapshot_source(spark)
    src = TableSpec("t.src", str(tmp_path / "src"))
    dst = TableSpec("t.dst", str(tmp_path / "dst"))
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.format("snapshot")
            .option("path", src.path)
            .load()
            .selectExpr("id", "upper(v) AS v_up")
        )
        q = start_exactly_once_sink(stream, dst, ckpt, app_id="pipe")
        assert q.awaitTermination(120)

    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), src)
    run()
    assert {tuple(r) for r in snapshot_read(spark, dst).collect()} == {
        (1, "A"), (2, "B"),
    }
    v_after_first = current_version(dst)

    # incremental: one more source commit -> exactly one more dst commit
    snapshot_write(spark.createDataFrame([(3, "c")], ["id", "v"]), src)
    run()
    assert {tuple(r) for r in snapshot_read(spark, dst).collect()} == {
        (1, "A"), (2, "B"), (3, "C"),
    }
    assert current_version(dst) == v_after_first + 1

    # idle re-run: no new source commits -> no new dst commits, no dupes
    run()
    assert current_version(dst) == v_after_first + 1
    assert snapshot_read(spark, dst).count() == 3


def test_snapshot_stream_ignore_deletes(spark, tmp_path):
    """A DELETE commit (deletion vector or rewrite) fails the strict
    stream naming ignoreDeletes; with ignoreDeletes=true it emits nothing
    (deleted rows were already streamed) and later appends keep flowing —
    Delta's ignoreDeletes contract, narrower than ignoreChanges."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
    )

    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]), spec)

    ckpt = str(tmp_path / "c1")
    got = _run_stream(spark, spec.path, "s1", ckpt, ignoreDeletes="true")
    assert set(got) == {(1, "a"), (2, "b")}

    # merge-on-read delete: metadata-only commit, nothing re-emits
    snapshot_delete_where(spark, spec, {"id": (2, 2)}, rewrite=False)
    assert _run_stream(spark, spec.path, "s2", ckpt, ignoreDeletes="true") == []
    # copy-on-write delete: rewrite commit, survivors suppressed too
    snapshot_delete_where(spark, spec, {"id": (1, 1)}, rewrite=True)
    assert _run_stream(spark, spec.path, "s3", ckpt, ignoreDeletes="true") == []
    # appends after the deletes still stream
    snapshot_write(spark.createDataFrame([(9, "z")], ["id", "v"]), spec)
    assert _run_stream(spark, spec.path, "s4", ckpt, ignoreDeletes="true") == [
        (9, "z")
    ]

    # strict stream over the same history names the right option
    try:
        _run_stream(spark, spec.path, "s5", str(tmp_path / "c2"))
        raise AssertionError("delete commit must fail the strict stream")
    except Exception as e:  # noqa: BLE001
        assert "ignoreDeletes" in str(e)


def test_pushdown_bloom_pruning(spark, tmp_path):
    """An equality filter through the DataSource consults bloom sidecars:
    commits whose range stats overlap but whose bloom proves the value
    absent plan zero files — and a value present anywhere stays exact."""
    from pyspark.sql.datasource import EqualTo

    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"))
    # evens/odds: overlapping id ranges, only blooms can separate them
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

    # unit-level: the reader's partition list halves under the eq probe
    # (deterministic data + hashes make this a stable pin, not luck)
    schema = snapshot_read(spark, spec).schema
    r_all = SnapshotReader(schema, {"path": spec.path})
    n_all = len(r_all.partitions())
    r_eq = SnapshotReader(schema, {"path": spec.path})
    handed_back = list(r_eq.pushFilters([EqualTo(("id",), 42)]))
    assert len(handed_back) == 1
    assert 0 < len(r_eq.partitions()) < n_all

    # an absent value prunes EVERY dir (both blooms reject)
    r_none = SnapshotReader(schema, {"path": spec.path})
    list(r_none.pushFilters([EqualTo(("id",), 5000)]))
    assert len(r_none.partitions()) == 0

    # end-to-end: results identical to the native reader under the filter
    df = (
        spark.read.format("snapshot")
        .option("path", spec.path)
        .load()
        .filter("id = 42")
    )
    assert [tuple(r) for r in df.select("id", "v").collect()] == [(42, "e")]


def test_snapshot_format_unescapes_partition_path_values(spark, tmp_path):
    """Spark percent-escapes partition path segments (':'→'%3A', ' '→'%20');
    the DataSource's hive reconstruction must unescape them so string
    partition values round-trip identically to the native reader
    (ADVICE r7)."""
    register_snapshot_source(spark)
    spec = TableSpec("t.snap", str(tmp_path / "t"), partition_by=("p",))
    vals = ["2026-08-15 10:00:00", "a:b", "pct%lit", "plain"]
    snapshot_write(
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], ["id", "p"]
        ),
        spec,
    )
    native = {tuple(r) for r in snapshot_read(spark, spec).collect()}
    via_fmt = {tuple(r) for r in _fmt(spark, spec.path).collect()}
    assert via_fmt == native == {(i, v) for i, v in enumerate(vals)}
    assert _fmt(spark, spec.path).filter(F.col("p") == "a:b").count() == 1
