"""Bucketed-table co-located joins: the write-once-shuffle-never pattern."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.sources.tables import sort_for_skipping, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = spark.range(0, 10000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("o_custkey")
    )
    items = spark.range(0, 30000).select(
        (F.col("id") % 10000).alias("l_orderkey"), F.col("id").alias("l_id")
    )
    write_bucketed(orders, spark, "bktest.orders_b", ["o_orderkey"], 8)
    write_bucketed(items, spark, "bktest.items_b", ["l_orderkey"], 8)
    a = spark.table("bktest.orders_b")
    b = spark.table("bktest.items_b")
    joined = a.join(b, a.o_orderkey == b.l_orderkey)
    plan = _plan(joined)
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 0, f"bucketed join should not shuffle:\n{plan[:800]}"
    assert joined.count() == 30000


def test_sort_for_skipping_produces_disjoint_ranges(spark, tmp_path):
    df = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "skip")
    sort_for_skipping(df, ["k"], target_files=4).write.parquet(out)
    import pyarrow.parquet as pq
    import glob

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        stats = md.row_group(0).column(0).statistics
        ranges.append((stats.min, stats.max))
    ranges.sort()
    # file key ranges must not overlap → point queries prune to one file
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
