"""Executable catalog DDL over a pipeline-written lakehouse (S6)."""

from __future__ import annotations

import pytest

from creatorops_lakehouse_spark.generator import GeneratorConfig
from creatorops_lakehouse_spark.pipelines.run_all import run_all
from creatorops_lakehouse_spark.sources.ddl import register_catalog


def test_catalog_over_lakehouse(spark, tmp_path):
    root = str(tmp_path / "lh")
    stats = run_all(
        spark,
        root,
        cfg=GeneratorConfig(seed=7, n_tenants=1, authors_per_tenant=1,
                            stories_per_author=1, days=7),
        as_of_ts="2026-05-01 00:00:00",
        as_of_date="2026-05-01",
        ingested_at="2026-05-01 00:00:00",
    )
    ddl = register_catalog(spark, root)
    assert any("CREATE TABLE" in s and "silver.creatorops_events" in s for s in ddl)
    n = spark.sql("SELECT COUNT(*) AS n FROM silver.creatorops_events").collect()[0].n
    assert n == stats.silver_rows
    top = spark.sql(
        """
        SELECT stage, COUNT(*) AS n FROM silver.creatorops_events
        GROUP BY stage ORDER BY n DESC LIMIT 1
        """
    ).collect()[0]
    assert top.n > 0
    assert spark.sql("SELECT COUNT(*) AS n FROM bronze.creatorops_events_raw").collect()[0].n == stats.bronze_rows


def test_delta_format_seam(tmp_path):
    # Exercises the TableSpec.format="delta" swap end-to-end WHEN delta-spark
    # is importable; skips otherwise (it is not installable in this
    # environment — sources/tables.py documents the parquet stand-ins).
    # Keeping this test green-or-skipped keeps the one-line swap honest if
    # the environment ever gains the package.
    delta = pytest.importorskip(
        "delta", reason="delta-spark not installed; parquet stand-in is the default"
    )
    from pyspark.sql import SparkSession

    from creatorops_lakehouse_spark.sources.tables import (
        TableSpec,
        read_table,
        upsert_table,
        write_table,
    )

    active = SparkSession.getActiveSession()
    if active is not None:  # extensions are fixed at session construction
        active.stop()
    builder = (
        SparkSession.builder.master("local[2]")
        .appName("delta-seam")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        spec = TableSpec("t.delta_seam", str(tmp_path / "dt"), ("p",), format="delta")
        base = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")], ["id", "v", "p"]
        )
        write_table(base, spec)
        assert read_table(spark, spec).count() == 2
        upsert_table(
            spark,
            spec,
            spark.createDataFrame([(1, "A", "x"), (3, "c", "x")], ["id", "v", "p"]),
            ["id"],
        )
        rows = {r.id: r.v for r in read_table(spark, spec).collect()}
        assert rows == {1: "A", 2: "b", 3: "c"}
    finally:
        spark.stop()


def test_maintenance_sql_matches_reference_prescription():
    """The exact commands the reference DDL comments prescribe but never
    run: 01_bronze.sql:25-26 and 02_silver_events.sql:62. String-level —
    delta-spark is not installable here (pip re-verified round 6), so the
    swap is specified by assertion instead of execution."""
    from creatorops_lakehouse_spark.sources.ddl import maintenance_sql

    assert maintenance_sql(
        "bronze.creatorops_events_raw", retain_hours=168
    ) == [
        "OPTIMIZE bronze.creatorops_events_raw",
        "VACUUM bronze.creatorops_events_raw RETAIN 168 HOURS",
    ]
    assert maintenance_sql(
        "silver.creatorops_events",
        zorder_by=("story_id", "author_id", "event_type"),
    ) == [
        "OPTIMIZE silver.creatorops_events "
        "ZORDER BY (story_id, author_id, event_type)"
    ]
    with pytest.raises(ValueError, match="retain_hours"):
        maintenance_sql("t", retain_hours=-1)


def test_merge_upsert_sql_statement():
    """The MERGE INTO the silver upsert becomes on Delta
    (runbooks/silver-transform.md:121-122), with partition keys in the
    match condition for rewrite pruning."""
    from creatorops_lakehouse_spark.sources.ddl import merge_upsert_sql

    got = merge_upsert_sql(
        "silver.creatorops_events",
        "updates",
        keys=("event_id",),
        partition_keys=("p_event_date",),
    )
    assert got == (
        "MERGE INTO silver.creatorops_events AS t\n"
        "USING updates AS s\n"
        "ON t.event_id = s.event_id AND t.p_event_date = s.p_event_date\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )
    with pytest.raises(ValueError, match="key"):
        merge_upsert_sql("t", "s", keys=())
