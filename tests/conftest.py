from __future__ import annotations

import pytest

from creatorops_lakehouse_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark("creatorops-tests", master="local[4]", **{
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "false",
    })
    yield s
