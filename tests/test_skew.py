"""Skew utilities (operators/skew.py): salted aggregation and salted-join
parity with their unsalted equivalents, plus salt determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from creatorops_lakehouse_spark.operators.skew import (
    explode_salts,
    salt,
    salted_count,
)


def _skewed_df(spark):
    # one hot key (90%) + a long tail — the shape salting exists for
    rows = [("hot", i) for i in range(900)] + [
        (f"tail_{i % 23}", i) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_count_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    got = {r["k"]: r["n"] for r in salted_count(df, ["k"], n_salts=16).collect()}
    want = {
        r["k"]: r["cnt"]
        for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_salt_is_deterministic_and_bounded(spark):
    df = _skewed_df(spark)
    a = salt(df, 16).orderBy("k", "v").collect()
    b = salt(df, 16).orderBy("k", "v").collect()
    assert a == b  # xxhash64-derived, not rand(): stable across replays
    assert all(0 <= r["_salt"] < 16 for r in a)
    # the hot key actually spreads over many salts (that's the point)
    hot_salts = {r["_salt"] for r in a if r["k"] == "hot"}
    assert len(hot_salts) >= 8


def test_salted_join_matches_plain_join(spark):
    probe = salt(_skewed_df(spark), 8)
    build = spark.createDataFrame(
        [("hot", "H"), ("tail_1", "T1"), ("tail_7", "T7")], ["k", "label"]
    )
    build_x = explode_salts(build, 8)
    salted = (
        probe.join(build_x, ["k", "_salt"])
        .groupBy("k", "label")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        _skewed_df(spark)
        .join(build, "k")
        .groupBy("k", "label")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
