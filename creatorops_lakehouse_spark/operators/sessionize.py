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
    value_col: str | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "running_sum",
    bucket_s: int = 86400,
    values: dict[str, str] | None = None,
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
    dollars).

    ``values`` ({out_col: value_col}) computes SEVERAL running sums in
    ONE two-phase pass — one local window, one summary window, one
    join-back, instead of N of each plus N−1 re-join shuffles (the
    previous two-measure consumer paid the whole operator twice and a
    third shuffle to zip the results). ``value_col``/``out_col`` are the
    single-measure shorthand and are ignored when ``values`` is given.
    Per-measure arithmetic is unchanged, so each output column is
    bit-identical to its single-measure run."""
    measures = dict(values) if values is not None else {out_col: value_col}
    bucketed = df.withColumn(
        "_bkt",
        F.floor(
            F.unix_micros(F.col(ts_col)) / F.lit(bucket_s * 1_000_000)
        ).cast("long"),
    )
    w_local = Window.partitionBy(key_col, "_bkt").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    cum = w_local.rowsBetween(Window.unboundedPreceding, 0)
    local = bucketed
    for o, v in measures.items():
        local = local.withColumn(f"_lrun_{o}", F.sum(v).over(cum))
    totals = bucketed.groupBy(key_col, "_bkt").agg(
        *[
            F.sum(v).alias(f"_btot_{o}")  # bucket total (sign-safe — never
            # max(running): negative values make the running series
            # non-monotone)
            for o, v in measures.items()
        ]
    )
    w_key = Window.partitionBy(key_col).orderBy(F.col("_bkt").asc())
    excl = w_key.rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals
    for o in measures:
        offsets = offsets.withColumn(
            f"_boff_{o}",
            F.coalesce(F.sum(f"_btot_{o}").over(excl), F.lit(0)),
        )
    offsets = offsets.select(
        key_col, "_bkt", *[f"_boff_{o}" for o in measures]
    )
    out = local.join(offsets, on=[key_col, "_bkt"])
    for o in measures:
        out = out.withColumn(o, F.col(f"_boff_{o}") + F.col(f"_lrun_{o}"))
    return out.drop(
        "_bkt",
        *[f"_lrun_{o}" for o in measures],
        *[f"_boff_{o}" for o in measures],
    )


def keyed_lead_bucketed(
    df: DataFrame,
    cols: list[str],
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_s: int = 86400,
    suffix: str = "_next",
) -> DataFrame:
    """``df`` + ``<col><suffix>`` = LEAD(col) per key in (ts, id) order —
    the lead/lag member of the hot-key-safe family (with
    :func:`sessionize_bucketed` and :func:`keyed_running_sum_bucketed`).
    The classic ``LEAD OVER (PARTITION BY key ORDER BY ts)`` holds every
    row the key ever produced in ONE window partition; here no partition
    exceeds one key-bucket of rows, so a 60M-row bot account cannot
    single-thread the stage.

    Decomposition: lead is LOCAL everywhere except the last row of each
    (key, bucket), whose successor is the first row of the key's next
    PRESENT bucket — a 1-row boundary exchange per present bucket:

    1. LOCAL window over (key, time-bucket): lead within the bucket.
    2. SUMMARY: one row per (key, present-bucket) carrying the bucket's
       FIRST row's values (min of a (ts, id, cols...) struct — (ts, id)
       is a unique prefix, so struct-min IS the first row); a lead over
       the per-key bucket sequence (partitions hold #present-buckets
       rows, never events) yields each bucket's successor-first values.
    3. JOIN BACK on (key, bucket) — co-partitioned with phase 1's
       shuffle; bucket-last rows take the boundary values, the key's
       overall last row stays NULL.

    Ties across a bucket boundary cannot occur (equal timestamps share a
    bucket), so the decomposition is exactly the single-window LEAD for
    any data. ``id_col`` must be unique per row (total order)."""
    key_cols = list(key_cols or ["user_id"])
    us = F.unix_micros(F.col(ts_col))
    bucketed = df.withColumn("_us", us).withColumn(
        "_bkt", F.floor(us / F.lit(bucket_s * 1_000_000)).cast("long")
    )
    w_local = Window.partitionBy(*key_cols, "_bkt").orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    local = bucketed
    for c in cols:
        local = local.withColumn(f"_loc_{c}", F.lead(c).over(w_local))
    # bucket-last flag: lead of the id within the bucket is null
    local = local.withColumn("_last", F.lead(id_col).over(w_local).isNull())

    first_struct = F.min(
        F.struct(F.col("_us"), F.col(id_col), *[F.col(c) for c in cols])
    ).alias("_first")
    summary = bucketed.groupBy(*key_cols, "_bkt").agg(first_struct)
    w_key = Window.partitionBy(*key_cols).orderBy(F.col("_bkt").asc())
    boundary = summary.withColumn("_nb", F.lead("_first").over(w_key)).select(
        *key_cols,
        "_bkt",
        *[F.col("_nb").getField(c).alias(f"_nb_{c}") for c in cols],
    )

    out = local.join(boundary, on=[*key_cols, "_bkt"])
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(F.col("_last"), F.col(f"_nb_{c}")).otherwise(
                F.col(f"_loc_{c}")
            ),
        )
    drop = ["_us", "_bkt", "_last"] + [f"_loc_{c}" for c in cols] + [
        f"_nb_{c}" for c in cols
    ]
    return out.drop(*drop)


def keyed_trailing_agg_bucketed(
    df: DataFrame,
    value_col: str,
    lo_us: int,
    hi_us: int = 0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    count_col: str = "n_trailing",
    sum_col: str = "trailing_sum",
) -> DataFrame:
    """``df`` + (count, sum) of ``value_col`` over the trailing time frame
    ``[t + lo_us, t + hi_us]`` per key — the RANGE-frame member of the
    hot-key-safe window family, completing it (gap sessions, prefix sums,
    lead/lag, and now bounded trailing frames all have two-phase forms).

    The classic ``RANGE BETWEEN x PRECEDING AND CURRENT ROW`` window
    holds a key's LIFETIME rows in one partition even though each frame
    only ever looks back ``|lo_us|`` — a 60M-row bot account
    single-threads the stage for no semantic reason. Here time is cut
    into buckets of width B = |lo_us| (the lookback span): a data row at
    time d is visible only to probes in [d − hi, d − lo] ⊆ two
    consecutive B-buckets, so each data row is emitted to exactly 2
    bucket slots and the join's partitions are bounded by per-bucket
    volume, never lifetime volume. Exact-integer aggregates make the
    result bit-equal to the window form.

    ``hi_us <= 0`` (trailing frames only). Empty frames keep their row:
    count coalesces to 0, sum stays NULL (SQL window semantics). Cost:
    one co-partitioned join over 2× the data + the probes — the price of
    boundedness; the plain window is cheaper until one key's lifetime
    exceeds a task."""
    if hi_us > 0 or lo_us > hi_us:
        raise ValueError("trailing frame requires lo_us <= hi_us <= 0")
    b_us = max(-lo_us, 1)
    us = F.unix_micros(F.col(ts_col))
    probe = df.select(
        key_col, id_col, us.alias("_pus")
    ).withColumn("_bkt", F.floor(F.col("_pus") / F.lit(b_us)).cast("long"))
    data = df.select(
        key_col, us.alias("_dus"), F.col(value_col).alias("_dv")
    ).withColumn(
        # k0 = the FIRST probe bucket that can see this row: probes lie in
        # [d - hi, d - lo], an interval of width hi-lo <= B starting at
        # d - hi, hence spanning at most buckets {k0, k0 + 1}
        "_bkt",
        F.floor((F.col("_dus") - F.lit(hi_us)) / F.lit(b_us)).cast("long"),
    )
    dd = data.unionByName(data.withColumn("_bkt", F.col("_bkt") + 1))
    delta = F.col("_dus") - F.col("_pus")
    agg = (
        probe.join(dd, on=[key_col, "_bkt"])
        .filter((delta >= F.lit(lo_us)) & (delta <= F.lit(hi_us)))
        .groupBy(key_col, id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias(count_col),
            F.sum("_dv").alias(sum_col),
        )
    )
    out = df.join(agg, on=[key_col, id_col], how="left")
    return out.withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0).cast("long"))
    )
