"""Slowly-changing-dimension (type 2) history from a change stream.

The reference's data model is an immutable event log with "corrections
arrive as new events" (/root/reference/docs/runbooks/silver-transform.md:18)
— the canonical input for SCD2 dimension building: given per-key rows
ordered in time, collapse consecutive runs of equal tracked attributes
into validity intervals (valid_from, valid_to, version). Downstream joins
then use ``valid_from <= ts < valid_to`` (the as-of join this repo already
ships, operators/asof.py) instead of snapshotting the dimension per day.

Scale design (100 TB change streams):
- One shuffle on the key; run detection and interval assembly are two
  window passes over the SAME (key, order) partitioning — Catalyst fuses
  them into a single sort + window stage, no re-shuffle, no self-join.
- Change rows are typically a tiny fraction of the stream, so the second
  (lead) window runs over the filtered change set only.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 validity intervals per key: one row per run of consecutive
    equal ``attr_cols`` values under the (``ts_col``, ``tiebreak_cols``)
    total order, with:

    (key_cols..., attr_cols..., valid_from, valid_to, version)

    - ``valid_from``: the run's first ``ts_col``
    - ``valid_to``: the next run's ``valid_from`` (NULL on the current run
      — half-open intervals, so an as-of probe at exactly a change ts
      lands on the NEW version)
    - ``version``: 1-based change ordinal per key

    Attribute comparison is null-safe (a NULL attr is a value, and a
    NULL→'x' transition is a change). ``tiebreak_cols`` must make the
    order total for deterministic results when one key changes twice at
    the same timestamp.
    """
    if not attr_cols:
        raise ValueError("scd2_intervals needs >= 1 tracked attribute column")
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    # First-row detection via lag over a constant (NULL only on the first
    # row) — avoids a separate row_number pass and is expressible
    # identically in the SQL oracle.
    is_first = F.lag(F.lit(1)).over(w).isNull()
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    marked = df.withColumn("_chg", is_first | changed).filter(F.col("_chg"))
    w_runs = Window.partitionBy(*keys).orderBy(*order)
    return marked.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w_runs).alias("valid_to"),
        F.row_number().over(w_runs).cast("int").alias("version"),
    )
