"""Gold KPI transforms — pure functions over the typed Silver event log.

One module per reference gold job: kpis (velocity, churn), retention
(bands, dropoff), bottlenecks (stage durations). All take an explicit
``as_of_date`` instead of current_date() so outputs are deterministic
(SURVEY.md §5); passing None restores the reference's wall-clock stamp.
"""

from creatorops_lakehouse_spark.pipelines.gold.bottlenecks import stage_bottlenecks
from creatorops_lakehouse_spark.pipelines.gold.kpis import (
    revision_churn_daily,
    writing_velocity_daily,
)
from creatorops_lakehouse_spark.pipelines.gold.retention import (
    dropoff_rate_daily,
    engagement_bands_daily,
)

__all__ = [
    "writing_velocity_daily",
    "revision_churn_daily",
    "engagement_bands_daily",
    "dropoff_rate_daily",
    "stage_bottlenecks",
]
