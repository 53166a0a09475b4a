"""KPI 5 stage bottlenecks: time spent in each workflow stage.

Capability parity: pipelines/gold/bottlenecks_local.py:23-74; formula at
docs/kpis.md:89-113. Sessionize each (tenant, story) event sequence with
lead(), derive seconds-precision stage durations, aggregate count/avg/
p50/p90/max hours per stage.

``exact_percentiles=True`` swaps percentile_approx for exact percentile —
needed when an external oracle must match bit-for-bit (SURVEY.md §5);
the approx sketch (reference default) is the 100 TB-scale choice since the
exact variant buffers each group's values.

Scale notes: one exchange for the window (hash by tenant_id+story_id, sort
by occurred_at in partition), one for the aggregate; both partial-agg
map-side. Story timelines are naturally bounded (thousands of events, not
billions), so window partitions stay small — no skew salting needed here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def stage_bottlenecks(
    silver: DataFrame,
    as_of_date: str | None = None,
    exact_percentiles: bool = False,
) -> DataFrame:
    base = silver.filter(F.col("stage").isNotNull()).select(
        "tenant_id", "story_id", "series_id", "occurred_at", "stage"
    )
    w = Window.partitionBy("tenant_id", "story_id").orderBy(F.col("occurred_at").asc())
    transitions = (
        base.withColumn("next_occurred_at", F.lead("occurred_at").over(w))
        .withColumn(
            "duration_seconds",
            F.col("next_occurred_at").cast("long") - F.col("occurred_at").cast("long"),
        )
        .filter(F.col("next_occurred_at").isNotNull())
        .filter(F.col("duration_seconds") >= 0)
        .withColumn("duration_hours", F.col("duration_seconds") / F.lit(3600.0))
    )
    pct = "percentile" if exact_percentiles else "percentile_approx"
    out = (
        transitions.groupBy("tenant_id", "story_id", "series_id", "stage")
        .agg(
            F.count("*").alias("stage_hops"),
            F.avg("duration_hours").alias("avg_hours_in_stage"),
            F.expr(f"{pct}(duration_hours, 0.5)").alias("p50_hours_in_stage"),
            F.expr(f"{pct}(duration_hours, 0.9)").alias("p90_hours_in_stage"),
            F.max("duration_hours").alias("max_hours_in_stage"),
        )
    )
    stamp = F.current_date() if as_of_date is None else F.lit(as_of_date).cast("date")
    return out.withColumn("as_of_date", stamp)
