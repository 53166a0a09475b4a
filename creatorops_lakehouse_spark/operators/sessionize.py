"""Hot-key-safe sessionization: two-phase bucketed gap sessions.

The classic sessionizer (lag-gap flags + running sum per user) needs ONE
window partition per user — correct, but the partition holds EVERY event
the user ever produced. The adversarial-skew rehearsal
(tools/skew_adversarial.py) pinned this as the suite's one path with no
in-semantics fix: a 600k-row hot user costs 2.5s on local[32]; a 60M-row
user (one bot account in a year of 100 TB telemetry) single-threads the
stage. AQE cannot split a window partition.

:func:`sessionize_bucketed` removes the ceiling with the same two-phase
shape as the packing prefix sum (operators/packing.py):

1. LOCAL pass — window over (user, time-bucket): lag-gap flags and local
   session indices. Partition size is bounded by events-per-user-per-
   bucket, not per-user; pick ``bucket_s`` (default 1 day) to taste.
2. SUMMARY pass — one tiny row per (user, present-bucket): local session
   count, first/last event time. A session straddles a bucket boundary
   iff first_ts(k) − last_ts(k−1) ≤ gap over PRESENT buckets (lag), so a
   cumulative sum of (sessions − merges) per user yields each bucket's
   global session OFFSET. This window's partitions hold
   #present-buckets rows per user (a 60M-event user over a year = 365
   rows), never events.
3. JOIN BACK on (user, bucket) — co-partitioned with pass 1's shuffle —
   and global_session = offset + local_index.

Semantics are EXACTLY the single-window sessionizer's (the DuckDB oracle
for events_sessionize_bucketed recomputes sessions with a plain global
window; boundary-chained sessions across many buckets merge through the
prefix arithmetic), with total order (ts, id) so ties are deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize_bucketed(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
    bucket_s: int = 86400,
) -> DataFrame:
    """``df`` + ``session_id`` (0-based, dense per user) under gap
    sessionization, without any per-user-sized window partition.

    ``id_col`` breaks timestamp ties (must be unique) so the session
    assignment is a pure function of the data.
    """
    us = F.unix_micros(F.col(ts_col))
    # floor (not `div`): `div` truncates toward zero, which would make
    # bucket 0 double-width for pre-1970 timestamps; floor keeps every
    # bucket the same width. Resolved-column arithmetic also keeps names
    # needing backticks (dots, hyphens) working.
    bucketed = df.withColumn("_us", us).withColumn(
        "_bkt", F.floor(us / F.lit(bucket_s * 1_000_000)).cast("long")
    )
    w_local = Window.partitionBy(user_col, "_bkt").orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    gap_us = gap_s * 1_000_000
    local = bucketed.withColumn(
        "_new",
        F.when(
            F.lag("_us").over(w_local).isNull()
            | (F.col("_us") - F.lag("_us").over(w_local) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_lidx",
        F.sum("_new").over(
            w_local.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )

    summary = local.groupBy(user_col, "_bkt").agg(
        (F.max("_lidx") + 1).alias("_n_sess"),
        F.min("_us").alias("_first_us"),
        F.max("_us").alias("_last_us"),
    )
    w_user = Window.partitionBy(user_col).orderBy(F.col("_bkt").asc())
    merged = summary.withColumn(
        "_merge",
        F.when(
            F.col("_first_us") - F.lag("_last_us").over(w_user) <= gap_us,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    offsets = merged.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n_sess").over(
                w_user.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        - F.sum("_merge").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    ).select(user_col, "_bkt", "_off")

    out = local.join(offsets, on=[user_col, "_bkt"]).withColumn(
        "session_id", (F.col("_off") + F.col("_lidx")).cast("long")
    )
    return out.drop("_us", "_bkt", "_new", "_lidx", "_off")


def keyed_running_sum_bucketed(
    df: DataFrame,
    value_col: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "running_sum",
    bucket_s: int = 86400,
) -> DataFrame:
    """``df`` + ``out_col`` = cumulative sum of ``value_col`` per key in
    (ts, id) order — the per-KEY twin of the global two-phase prefix sum
    in operators/packing.py, and the cumulative-window analogue of
    :func:`sessionize_bucketed`: no window partition ever holds more than
    one key-bucket of rows, so a hot key's LIFETIME volume never
    single-threads the stage (the classic
    ``SUM OVER (PARTITION BY key ORDER BY ...)`` puts every row the key
    ever produced in one partition).

    Phase 1: local running sum within (key, time-bucket). Phase 2: one
    tiny row per (key, present-bucket) carrying the bucket total; an
    exclusive prefix over buckets per key (window over #buckets rows)
    yields each bucket's offset. Phase 3: join back on (key, bucket) —
    co-partitioned with phase 1's shuffle — and add.

    ``value_col`` should be integral (exact addition is what makes the
    decomposition bit-equal to the global window — sum cents, not
    dollars)."""
    bucketed = df.withColumn(
        "_bkt",
        F.floor(
            F.unix_micros(F.col(ts_col)) / F.lit(bucket_s * 1_000_000)
        ).cast("long"),
    )
    w_local = Window.partitionBy(key_col, "_bkt").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    local = bucketed.withColumn(
        "_lrun",
        F.sum(value_col).over(
            w_local.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = bucketed.groupBy(key_col, "_bkt").agg(
        F.sum(value_col).alias("_btot")  # bucket total (sign-safe — never
        # max(running): negative values make the running series
        # non-monotone)
    )
    w_key = Window.partitionBy(key_col).orderBy(F.col("_bkt").asc())
    offsets = totals.withColumn(
        "_boff",
        F.coalesce(
            F.sum("_btot").over(w_key.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select(key_col, "_bkt", "_boff")
    out = local.join(offsets, on=[key_col, "_bkt"]).withColumn(
        out_col, F.col("_boff") + F.col("_lrun")
    )
    return out.drop("_bkt", "_lrun", "_boff")
