"""Filter-over-session_window pushdown hazard (found by the dual-engine
harness, round 7): Spark's optimizer (observed on 4.1.2) pushes a
predicate on the merged session's end column THROUGH the merging
aggregate, rewriting it against each row's INITIAL [ts, ts+gap) window —
events whose initial window violates the pushed bound are dropped BEFORE
merging, so a session can come back truncated (its early member emitted
as a lone "closed" session). A lineage barrier (localCheckpoint) before
the filter forces post-merge evaluation. events_streaming_session_verdict
relies on this; this test pins the hazard and the workaround on a minimal
two-event session."""

from __future__ import annotations

import pyspark.sql.functions as F


def _sessions(df):
    return (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("st"),
            F.col("w.end").alias("en"),
            "n",
        )
    )


def test_filter_after_barrier_sees_merged_sessions(spark):
    # two events 10 min apart -> ONE session [00:00, 00:40); a filter
    # en <= 00:35 must exclude the whole merged session, never emit a
    # truncated single-event "session" [00:00, 00:30)
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00")],
        ["user_id", "ts_s"],
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))

    bound = F.lit("2024-01-01 00:35:00").cast("timestamp")
    safe = _sessions(df).localCheckpoint(eager=True).filter(F.col("en") <= bound)
    assert safe.count() == 0  # merged session ends 00:40 -> not closed

    # unfiltered aggregate: exactly one merged 2-event session
    full = _sessions(df).collect()
    assert len(full) == 1 and full[0]["n"] == 2

    # document the hazard: if the pushed-down form ever returns rows, they
    # are truncated sessions (n < 2). Tolerate upstream fixing it (0 rows)
    # but never accept a wrong row silently.
    pushed = _sessions(df).filter(F.col("en") <= bound).collect()
    for r in pushed:
        assert r["n"] == 1, "pushdown emitted a partially-merged session"
