"""MERGE-style upsert semantics over the parquet table layer."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.sources.tables import (
    TableSpec,
    read_table,
    upsert_table,
)


def test_upsert_replaces_matched_keeps_unmatched(spark, tmp_path):
    spec = TableSpec("t", str(tmp_path / "t"), ("p",))
    base = spark.createDataFrame(
        [(1, "a", "2026-01-01"), (2, "b", "2026-01-01"), (3, "c", "2026-01-02")],
        ["id", "v", "p"],
    )
    upsert_table(spark, spec, base, keys=["id"])
    updates = spark.createDataFrame(
        [(2, "B", "2026-01-01"), (4, "d", "2026-01-01")], ["id", "v", "p"]
    )
    upsert_table(spark, spec, updates, keys=["id"])
    rows = {r.id: r.v for r in read_table(spark, spec).collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_upsert_untouched_partition_not_rewritten(spark, tmp_path):
    import os

    spec = TableSpec("t", str(tmp_path / "t2"), ("p",))
    base = spark.createDataFrame(
        [(1, "a", "2026-01-01"), (3, "c", "2026-01-02")], ["id", "v", "p"]
    )
    upsert_table(spark, spec, base, keys=["id"])
    p2 = os.path.join(spec.path, "p=2026-01-02")
    mtime_before = max(os.path.getmtime(os.path.join(p2, f)) for f in os.listdir(p2))
    upsert_table(
        spark,
        spec,
        spark.createDataFrame([(1, "A", "2026-01-01")], ["id", "v", "p"]),
        keys=["id"],
    )
    mtime_after = max(os.path.getmtime(os.path.join(p2, f)) for f in os.listdir(p2))
    assert mtime_after == mtime_before  # dynamic overwrite skipped 01-02
    rows = {r.id: r.v for r in read_table(spark, spec).collect()}
    assert rows == {1: "A", 3: "c"}


def test_upsert_unpartitioned_spec(spark, tmp_path):
    # Regression: unpartitioned upsert used to overwrite the same path the
    # merged plan was lazily reading (dynamic-overwrite staging only covers
    # partitioned specs) — data loss or AnalysisException. The staging-swap
    # path must merge correctly and clean up after itself.
    from creatorops_lakehouse_spark.sources.tables import (
        TableSpec,
        read_table,
        upsert_table,
    )

    spec = TableSpec("t.flat", str(tmp_path / "flat"))  # no partition_by
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "val"]
    )
    upsert_table(spark, spec, base, ["id"])
    updates = spark.createDataFrame([(2, "B2"), (4, "d")], ["id", "val"])
    upsert_table(spark, spec, updates, ["id"])

    got = {(r.id, r.val) for r in read_table(spark, spec).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    import os

    assert not os.path.exists(str(tmp_path / "flat__staging"))
