"""Bucketed sessionizer vs the plain global-window sessionizer: identical
session assignment on adversarial boundary shapes — sessions chained
across 3+ buckets, events exactly at the gap, timestamp ties, empty
buckets between a user's activity."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from creatorops_lakehouse_spark.operators.sessionize import sessionize_bucketed

GAP = 1800


def _naive_sessions(df):
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros("ts")
    flagged = df.withColumn(
        "_new",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > GAP * 1_000_000),
            1,
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        (
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
        ).cast("long"),
    ).drop("_new")


def test_bucketed_matches_global_window_on_boundary_shapes(spark):
    rows = []
    eid = 0

    def ev(user, ts):
        nonlocal eid
        eid += 1
        return (user, eid, ts)

    # user A: one session crawling across THREE day buckets (25-min steps
    # through both midnights), then a fresh session after a 2h silence
    rows += [ev("A", f"2024-01-01 23:{m:02d}:00") for m in (0, 25, 50)]
    rows += [ev("A", "2024-01-02 00:15:00"), ev("A", "2024-01-02 00:40:00")]
    rows += [ev("A", "2024-01-02 23:55:00"), ev("A", "2024-01-03 00:20:00")]
    rows += [ev("A", "2024-01-03 02:30:00")]
    # user B: events EXACTLY gap apart (<= gap stays one session), and a
    # pair straddling midnight at exactly the gap
    rows += [ev("B", "2024-01-01 10:00:00"), ev("B", "2024-01-01 10:30:00")]
    rows += [ev("B", "2024-01-01 23:45:00"), ev("B", "2024-01-02 00:15:00")]
    # user C: timestamp ties (id tiebreak) + empty bucket between activity
    rows += [ev("C", "2024-01-01 05:00:00"), ev("C", "2024-01-01 05:00:00")]
    rows += [ev("C", "2024-01-03 05:00:00")]

    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts_s string"
    ).select("user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"))

    got = {
        (r.user_id, r.event_id, r.session_id)
        for r in sessionize_bucketed(df, gap_s=GAP).collect()
    }
    want = {
        (r.user_id, r.event_id, r.session_id)
        for r in _naive_sessions(df).collect()
    }
    assert got == want
    # events 1-5 crawl across the first midnight as ONE session; the ~23h
    # silence starts session 1 (events 6-7 straddle the second midnight);
    # the 2h10m silence starts session 2
    a = {r[1]: r[2] for r in got if r[0] == "A"}
    assert len({a[i] for i in range(1, 6)}) == 1
    assert a[6] == a[7] == a[1] + 1
    assert a[8] == a[1] + 2


def test_bucketed_sessionize_hot_user_partition_bound(spark):
    """600 events for one user across 3 buckets: no local window partition
    exceeds one (user, bucket) — asserted indirectly by parity (the global
    result is correct) and by construction (the operator never windows by
    user alone). Also checks dense 0-based ids per user."""
    df = spark.range(600).select(
        F.lit("hot").alias("user_id"),
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(SECOND, CAST(id * 1200 AS INT), "
            "TIMESTAMP'2024-01-01 00:00:00')"
        ).alias("ts"),  # 20-min steps: one giant session over ~8 days
    )
    out = sessionize_bucketed(df, gap_s=1800).select("session_id").distinct()
    assert [r.session_id for r in out.collect()] == [0]


def test_keyed_running_sum_bucketed_with_negatives(spark):
    """Bucket totals must be SUM, never max(running): negative values make
    the running series non-monotone. Parity vs the plain global window on
    a mixed-sign series spanning several buckets."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_running_sum_bucketed,
    )

    df = spark.range(200).select(
        (F.col("id") % 3).cast("string").alias("user_id"),
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(HOUR, CAST(id * 7 AS INT), "
            "TIMESTAMP'2024-01-01 00:00:00')"
        ).alias("ts"),
        (F.when(F.col("id") % 2 == 0, F.col("id")).otherwise(-2 * F.col("id")))
        .cast("long")
        .alias("v"),
    )
    got = {
        (r.user_id, r.event_id, r.run)
        for r in keyed_running_sum_bucketed(df, "v", out_col="run").collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.user_id, r.event_id, r.run)
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_keyed_lead_bucketed_matches_global_window_boundaries(spark):
    """keyed_lead_bucketed vs the plain per-key-lifetime LEAD window on
    adversarial boundary shapes: rows exactly ON the day-bucket boundary,
    a key whose next present bucket is several empty buckets away,
    single-row buckets, single-row keys, timestamp ties broken by id, and
    a non-timestamp lead column riding the same boundary exchange."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_lead_bucketed,
    )

    rows, eid = [], 0

    def ev(user, ts, tag):
        nonlocal eid
        rows.append((user, eid, ts, tag))
        eid += 1

    # u1: dense day, then last row exactly at 23:59:59.999999, next row
    # exactly at the next midnight (bucket boundary crossing)
    ev("u1", "2024-01-01 10:00:00", "a")
    ev("u1", "2024-01-01 23:59:59.999999", "b")
    ev("u1", "2024-01-02 00:00:00", "c")
    # u1: multi-bucket gap — next present bucket 5 days away
    ev("u1", "2024-01-07 08:00:00", "d")
    # u2: timestamp tie inside one bucket (order falls to event_id)
    ev("u2", "2024-01-03 12:00:00", "x")
    ev("u2", "2024-01-03 12:00:00", "y")
    # u2: single-row far bucket (is both bucket-first and bucket-last)
    ev("u2", "2024-02-01 00:00:00", "z")
    # u3: single-event key — lead must be NULL
    ev("u3", "2024-01-05 00:00:00", "only")
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts_s", "tag"]
    ).select(
        "user_id", "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"), "tag",
    )

    got = {
        (r.user_id, r.event_id, str(r.ts_next), r.tag_next)
        for r in keyed_lead_bucketed(df, ["ts", "tag"]).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    want = {
        (r.user_id, r.event_id, str(r.ts_next), r.tag_next)
        for r in df.withColumn("ts_next", F.lead("ts").over(w))
        .withColumn("tag_next", F.lead("tag").over(w))
        .collect()
    }
    assert got == want
    # and the single-event key really got a NULL lead
    assert ("u3", 7, "None", None) in got


def test_keyed_trailing_agg_bucketed_matches_range_window(spark):
    """Bounded trailing frame vs the plain RANGE window on adversarial
    shapes: timestamp peers (all must be in-frame together), rows exactly
    at the frame edge (inclusive), rows 1us past it (excluded), frames
    spanning a bucket boundary, empty-history rows, and the strict
    hi=-1us exclusive-current variant."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_trailing_agg_bucketed,
    )

    rows, eid = [], 0

    def ev(user, ts, v):
        nonlocal eid
        rows.append((user, eid, ts, v))
        eid += 1

    ev("u1", "2024-01-01 10:00:00", 5)
    ev("u1", "2024-01-01 10:29:59.999999", 7)   # 1us inside the 30min edge
    ev("u1", "2024-01-01 10:30:00", 11)          # exactly AT the edge
    ev("u1", "2024-01-01 10:30:00.000001", 13)   # first row past it
    ev("u1", "2024-01-01 11:30:00", 17)          # empty trailing history
    ev("u1", "2024-01-01 11:30:00", 19)          # timestamp PEER
    ev("u2", "2024-01-01 10:44:59", 1)           # frame straddles the
    ev("u2", "2024-01-01 11:01:00", 2)           # 30-min bucket boundary
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "ts_s", "v"]
    ).select(
        "user_id", "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.col("v").cast("long").alias("v"),
    )

    for lo, hi in ((-1800 * 1_000_000, 0), (-1800 * 1_000_000, -1)):
        got = {
            (r.user_id, r.event_id, r.n, r.s)
            for r in keyed_trailing_agg_bucketed(
                df, "v", lo_us=lo, hi_us=hi, count_col="n", sum_col="s"
            ).collect()
        }
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(lo, hi)
        )
        want = {
            (r.user_id, r.event_id, r.n, r.s)
            for r in df.select(
                "user_id", "event_id",
                F.count(F.lit(1)).over(w).cast("long").alias("n"),
                F.sum("v").over(w).alias("s"),
            ).collect()
        }
        assert got == want, f"frame ({lo},{hi}) diverged"
