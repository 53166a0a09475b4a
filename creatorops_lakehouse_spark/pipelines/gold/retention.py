"""KPI 3 engagement score bands + KPI 4 dropoff rate (daily grain).

Capability parity: pipelines/gold/retention_local.py:28-101; formulas at
docs/kpis.md:49-86. Band function: clamp score to [0,100], floor to decile,
null score → null band (retention_local.py:28-34). Dropoff rate: full outer
join of engagement vs dropoff daily counts, null-filled, zero-guarded ratio
(retention_local.py:91-99).

Scale notes: the full outer join shuffles both pre-aggregated (small) sides
on the 4-part key — the expensive scan/agg happens before the join, so the
join input is already reduced by the daily grain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

GRAIN = ("p_event_date", "tenant_id", "story_id", "series_id")


def band_10(score: Column) -> Column:
    """Decile band: 0-9→0, 10-19→10, …, 90-100→90; null→null."""
    clamped = F.least(F.greatest(score, F.lit(0.0)), F.lit(100.0))
    return F.when(score.isNull(), F.lit(None)).otherwise(
        F.floor(clamped / F.lit(10.0)) * F.lit(10.0)
    )


def _as_of(df: DataFrame, as_of_date: str | None) -> DataFrame:
    stamp = (
        F.current_date() if as_of_date is None else F.lit(as_of_date).cast("date")
    )
    return df.withColumn("as_of_date", stamp)


def engagement_bands_daily(silver: DataFrame, as_of_date: str | None = None) -> DataFrame:
    """engagement_events / avg_score_in_band per story-day-band."""
    return _as_of(
        silver.filter(F.col("event_type") == "reader_engagement")
        .withColumn("score_band", band_10(F.col("engagement_score")))
        .groupBy(*GRAIN, "score_band")
        .agg(
            F.count("*").alias("engagement_events"),
            F.avg("engagement_score").alias("avg_score_in_band"),
        ),
        as_of_date,
    )


def dropoff_rate_daily(silver: DataFrame, as_of_date: str | None = None) -> DataFrame:
    """dropoff_rate = dropoffs / (engagements + dropoffs) per story-day."""
    eng = (
        silver.filter(F.col("event_type") == "reader_engagement")
        .groupBy(*GRAIN)
        .agg(F.count("*").alias("engagement_events"))
    )
    drp = (
        silver.filter(F.col("event_type") == "reader_dropoff")
        .groupBy(*GRAIN)
        .agg(F.count("*").alias("dropoff_events"))
    )
    return _as_of(
        eng.join(drp, on=list(GRAIN), how="full")
        .na.fill(0, subset=["engagement_events", "dropoff_events"])
        .withColumn("total_events", F.col("engagement_events") + F.col("dropoff_events"))
        .withColumn(
            "dropoff_rate",
            F.when(F.col("total_events") == 0, F.lit(0.0)).otherwise(
                F.col("dropoff_events") / F.col("total_events")
            ),
        ),
        as_of_date,
    )
