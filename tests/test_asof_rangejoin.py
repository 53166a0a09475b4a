"""As-of join and interval-join semantics pins (the DuckDB oracle covers
the inner as-of path; these cover left-join nulls, ties, and bucket edges)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.asof import asof_join
from creatorops_lakehouse_spark.operators.rangejoin import event_pairs_within


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2026-01-01T10:00:00"), "p1"),
            (1, _ts("2026-01-01T12:00:00"), "p2"),
            (2, _ts("2026-01-01T09:00:00"), "p3"),  # before any right row
        ],
        ["user_id", "ts", "name"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2026-01-01T09:30:00"), 10.0),
            (1, _ts("2026-01-01T10:00:00"), 20.0),  # tie with p1
            (1, _ts("2026-01-01T11:00:00"), 30.0),
            (2, _ts("2026-01-01T09:30:00"), 40.0),
        ],
        ["user_id", "ts", "px"],
    )
    return left, right


def test_asof_inner_latest_and_ties(frames):
    left, right = frames
    out = {r.name: r for r in asof_join(left, right, on="user_id").collect()}
    assert out["p1"].asof_px == 20.0  # tie at 10:00 matches (>= semantics)
    assert out["p2"].asof_px == 30.0  # latest before 12:00
    assert "p3" not in out  # no prior right row → dropped (inner)


def test_asof_left_keeps_unmatched(frames):
    left, right = frames
    out = {r.name: r for r in asof_join(left, right, on="user_id", how="left").collect()}
    assert out["p3"].asof_ts is None
    assert out["p3"].asof_px is None
    assert len(out) == 3


def test_rangejoin_bucket_edges(spark):
    # gaps: 299s (in), 300s (in, == window), 301s (out), straddling buckets
    rows = [
        (1, 100, _ts("2026-01-01T10:00:00")),
        (1, 101, _ts("2026-01-01T10:04:59")),
        (1, 102, _ts("2026-01-01T10:05:00")),
        (1, 103, _ts("2026-01-01T10:10:01")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    pairs = {
        (r.a_id, r.b_id): r.gap_micros
        for r in event_pairs_within(df, window_seconds=300).collect()
    }
    assert (100, 101) in pairs
    assert (100, 102) in pairs and pairs[(100, 102)] == 300_000_000
    assert (100, 103) not in pairs
    assert (102, 103) not in pairs  # 301s > window
    assert (101, 102) in pairs
