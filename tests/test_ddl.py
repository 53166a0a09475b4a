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
