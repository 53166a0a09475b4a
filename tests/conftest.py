from __future__ import annotations

import tempfile

import pytest

from creatorops_lakehouse_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark("creatorops-tests", master="local[4]", **{
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "false",
        # static conf: managed/bucketed test tables land in a temp warehouse
        "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-warehouse-"),
    })
    yield s
