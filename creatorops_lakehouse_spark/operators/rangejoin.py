"""Interval / range self-join: pairs of events within a time window.

A naive non-equi join (b.ts BETWEEN a.ts AND a.ts + w) forces a broadcast
nested-loop or cartesian plan in Spark. The scalable formulation buckets
timestamps into window-width buckets and equi-joins on (key, bucket) and
(key, bucket+1) — every qualifying pair shares or straddles a bucket edge,
so the exact predicate only filters an already-bounded candidate set.

Scale: shuffle on (key, bucket) — candidate count per bucket is bounded by
local event density, never by total table size; hot buckets are ordinary
join skew (AQE / salting applies).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def event_pairs_within(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 300,
) -> DataFrame:
    """Ordered pairs (a, b) with same key, 0 < b.ts - a.ts <= window.

    Output: key, a_id, b_id, gap_micros.
    """
    w_us = window_seconds * 1_000_000
    base = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    ).withColumn("bucket", F.expr(f"us div {w_us}"))
    # each left row probes its own bucket and the next (pairs can straddle)
    a = base.select(
        "k",
        F.col("id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("jb"),
    )
    b = base.select(
        "k",
        F.col("id").alias("b_id"),
        F.col("us").alias("b_us"),
        F.col("bucket").alias("jb"),
    )
    return (
        a.join(b, on=["k", "jb"])
        .filter((F.col("b_us") > F.col("a_us")) & (F.col("b_us") - F.col("a_us") <= w_us))
        .select(
            F.col("k").alias(key),
            "a_id",
            "b_id",
            (F.col("b_us") - F.col("a_us")).alias("gap_micros"),
        )
        .dropDuplicates([key, "a_id", "b_id"])
    )
