"""One-pass column profiling: the data-quality triage step before any
training-data curation decision (which columns are usable, how null, how
wide, how many distincts — the inputs to dedup-key choice, quality gates,
and contract drafting).

Scale design (100 TB):
- Everything rides ONE aggregation over one scan. Per-column null counts
  and length extrema are plain conditional aggregates (map-side partial);
  the exact distinct counts use Spark's grouping-expand: N count_distinct
  expressions in one agg become a single shuffle with an N-way expand —
  N× map output for the profiled columns only, not N scans. For
  hundreds-of-columns tables, profile in column batches or swap
  count_distinct → approx_count_distinct (HLL, no expand) via
  ``exact_distinct=False``.
- Output is long-form (one row per column), so downstream checks join it
  like any other table.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-form profile: one row per column with

    (column, n_rows, n_nulls, n_distinct, min_len, max_len)

    where lengths measure the column's STRING rendering (CAST AS STRING)
    — uniform across types and engine-portable, unlike min/max of raw
    doubles whose text formatting differs per engine. NULLs contribute to
    n_nulls only (length aggregates skip them); n_distinct excludes NULL
    (SQL COUNT DISTINCT semantics).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns needs >= 1 column")
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nn_{c}"),
            distinct(F.col(c)).cast("long").alias(f"_nd_{c}"),
            F.min(F.length(s)).cast("long").alias(f"_mn_{c}"),
            F.max(F.length(s)).cast("long").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into long form: one stack() projection
    stacked = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stacked}) AS "
        "(column, n_nulls, n_distinct, min_len, max_len)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_len", "max_len")
