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
