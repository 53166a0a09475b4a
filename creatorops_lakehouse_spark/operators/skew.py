"""Skew-handling utilities: key salting for hot-key joins/aggregations.

AQE's skew-join splitting (enabled in session.py) handles moderate runtime
skew; deliberate salting is for the pathological cases known in advance —
e.g. a tenant with 100× the events of the median, or a stop-token in an
inverted-index join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salt(
    df: DataFrame,
    n_salts: int,
    salt_col: str = "_salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from a stable hash
    — not rand(), so retries/replays stay consistent.

    ``salt_cols`` defaults to all columns; pass a narrow high-cardinality
    subset (e.g. the row's id) when the DataFrame is wide — hashing every
    column would drag the full row width through the scan just to compute
    the salt, defeating column pruning."""
    cols = salt_cols if salt_cols is not None else df.columns
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.struct(*cols)), F.lit(n_salts))
    )


def explode_salts(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate the (small) build side once per salt value so a salted
    probe side still joins on (key, salt)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_count(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase count for hot grouping keys: partial count per (key, salt),
    then final sum per key — the partial shuffle spreads a hot key over
    n_salts reducers. Pass ``salt_cols`` (e.g. a row id) on wide tables so
    the salt doesn't force a full-width scan."""
    salted = salt(df, n_salts, salt_cols=salt_cols)
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("n"))
