"""As-of join: for each left row, the latest right row with
right.ts <= left.ts within the same key — the point-in-time lookup
(market-data style) the DataFrame API lacks as a built-in.

Spark-first implementation: union-tag + last_value(ignorenulls) window —
ONE shuffle on (key), no range explosion, no per-row subquery:

1. tag left rows (side=1) and right rows (side=0),
2. sort within key by (ts, side) — a right row at the same timestamp sorts
   before the left row, so ties match (>= semantics, like DuckDB ASOF),
3. last_value(right_payload, ignorenulls=True) over rows UNBOUNDED
   PRECEDING..CURRENT ROW carries the most recent right payload forward,
4. keep left rows; unmatched (no prior right row) are dropped (inner) or
   kept with nulls (left).

Scale: cost ≡ one hash-shuffle on key + in-partition sort — same shape as
any window; skewed keys salt like any window (operators/skew.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join (right.ts <= left.ts, latest wins, ties match).

    Returns all left columns plus ``asof_<payload>`` columns and
    ``asof_ts`` (the matched right timestamp).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("asof_ts"),
                    *[F.col(c).alias(f"asof_{c}") for c in right_payload],
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("_right"),
    )
    r_tag = right.select(
        F.col(on).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"]
            .dataType.simpleString()
        ).alias("_left"),
        F.struct(
            F.col(right_ts).alias("asof_ts"),
            *[F.col(c).alias(f"asof_{c}") for c in right_payload],
        ).alias("_right"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_key")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_matched", F.last("_right", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out = carried.select("_left.*", "_matched.*")
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out
