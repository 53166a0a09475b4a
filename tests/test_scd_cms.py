"""SCD2 interval builder and count-min-sketch operator semantics."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from creatorops_lakehouse_spark.operators.scd import scd2_intervals


def _d(day):
    return dt.datetime(2024, 1, day)


def test_scd2_collapses_runs_and_builds_half_open_intervals(spark):
    rows = [
        # key 1: a,a,b,a -> three runs (a@1, b@3, a@4)
        (1, "a", _d(1), 10),
        (1, "a", _d(2), 11),
        (1, "b", _d(3), 12),
        (1, "a", _d(4), 13),
        # key 2: single run
        (2, "x", _d(5), 14),
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "tb"])
    got = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.version)
        for r in scd2_intervals(
            df, ["k"], "ts", ["attr"], tiebreak_cols=["tb"]
        ).collect()
    )
    assert got == [
        (1, "a", _d(1), _d(3), 1),
        (1, "a", _d(4), None, 3),
        (1, "b", _d(3), _d(4), 2),
        (2, "x", _d(5), None, 1),
    ]


def test_scd2_null_attr_is_a_value(spark):
    rows = [(1, None, _d(1), 1), (1, "a", _d(2), 2), (1, None, _d(3), 3)]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, tb int")
    got = [
        (r.attr, r.version)
        for r in scd2_intervals(df, ["k"], "ts", ["attr"], ["tb"])
        .orderBy("version")
        .collect()
    ]
    assert got == [(None, 1), ("a", 2), (None, 3)]


def test_scd2_requires_attrs(spark):
    df = spark.createDataFrame([(1, _d(1))], ["k", "ts"])
    with pytest.raises(ValueError, match="attribute"):
        scd2_intervals(df, ["k"], "ts", [])


def test_cms_never_undercounts_and_merges_exactly(spark):
    data = [(i % 7,) for i in range(200)] + [(99,)] * 50
    df = spark.range(0, 1).sparkSession.createDataFrame(data, ["k"]).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    full = cms_build(df, "k", depth=4, width=64)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(full, exact.select("k"), "k", depth=4, width=64)
    j = {r.k: (r.exact, r.est) for r in exact.join(est, "k").collect()}
    assert all(e >= x for x, e in j.values())
    # the planted heavy hitter is estimated within the eps*N envelope
    assert j[99][1] <= j[99][0] + (3 * 250) // 64
    # disjoint split merges counter-wise to the identical sketch
    a = cms_build(df.filter(F.col("rid") % 2 == 0), "k", depth=4, width=64)
    b = cms_build(df.filter(F.col("rid") % 2 == 1), "k", depth=4, width=64)
    merged = cms_merge(a, b)
    diff = (
        full.withColumnRenamed("cnt", "ca")
        .join(merged.withColumnRenamed("cnt", "cb"), ["row_i", "bucket"], "full_outer")
        .filter(~F.col("ca").eqNullSafe(F.col("cb")))
        .count()
    )
    assert diff == 0


def test_cms_guards(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "k", depth=0)
    with pytest.raises(ValueError, match="sketch"):
        cms_merge()


def test_profile_columns_stats(spark):
    from creatorops_lakehouse_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "ab", None), (2, "c", 1.5), (2, None, 2.5)],
        "id long, s string, v double",
    )
    got = {r.column: r.asDict() for r in profile_columns(df).collect()}
    assert got["id"]["n_rows"] == 3
    assert (got["id"]["n_nulls"], got["id"]["n_distinct"]) == (0, 2)
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["s"]["min_len"], got["s"]["max_len"]) == (1, 2)
    assert (got["v"]["n_nulls"], got["v"]["n_distinct"]) == (1, 2)
    with pytest.raises(ValueError, match="column"):
        profile_columns(df, cols=[])


def test_daily_fill_forward_carries_and_gaps(spark):
    from creatorops_lakehouse_spark.operators.timeseries import (
        daily_fill_forward,
    )

    rows = [
        # entity 1: obs day1 (two events, later wins), gap day2, obs day3
        (1, dt.datetime(2024, 1, 1, 8), 10, 100),
        (1, dt.datetime(2024, 1, 1, 9), 11, 200),
        (1, dt.datetime(2024, 1, 3, 8), 12, 300),
        # entity 2: first obs day2 -> day1 has NULL carried
        (2, dt.datetime(2024, 1, 2, 8), 13, 900),
    ]
    df = spark.createDataFrame(rows, ["e", "ts", "eid", "v"])
    got = {
        (r.entity, str(r.day)): (r.observed, r.carried)
        for r in daily_fill_forward(df, "e", "ts", "v", "eid").collect()
    }
    assert got[(1, "2024-01-01")] == (200, 200)  # later event wins
    assert got[(1, "2024-01-02")] == (None, 200)  # gap carries
    assert got[(1, "2024-01-03")] == (300, 300)
    assert got[(2, "2024-01-01")] == (None, None)  # before first obs
    assert got[(2, "2024-01-02")] == (900, 900)
    assert got[(2, "2024-01-03")] == (None, 900)
    assert len(got) == 6  # 2 entities x 3 spine days


def test_bloom_semi_join_parity_and_thinning(spark):
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.operators.bloom import (
        bloom_build,
        bloom_semi_join,
    )

    left = spark.range(0, 2000).select(F.col("id").alias("k"))
    right = spark.range(0, 2000).filter(F.col("id") % 97 == 0).select(
        F.col("id").alias("k")
    )
    got = {r.k for r in bloom_semi_join(left, right, "k", m_bits=4096).collect()}
    want = {r.k for r in left.join(right, "k", "left_semi").collect()}
    assert got == want and len(want) == 21
    # the bitset is compact regardless of build size
    assert bloom_build(right, "k", m_bits=4096).count() <= 4096 // 64
    with pytest.raises(ValueError, match="bloom"):
        bloom_build(right, "k", m_bits=32)
