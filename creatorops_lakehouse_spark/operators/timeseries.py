"""Temporal resampling: date-spine densification + forward fill.

Event logs are sparse in time; downstream feature pipelines and BI marts
want a dense regular grid ("one row per entity per day, carrying the last
observed value"). The relational recipe, all JVM-side expressions:

1. spine: ``sequence(min_day, max_day, interval 1 day)`` exploded — one
   row per day, generated, never scanned;
2. grid: entities × spine — a broadcast cross join of two DIMENSION-sized
   tables (the big fact table is never crossed);
3. observations: per (entity, day) the LAST event's value under a total
   order (ts, tiebreak) — one hash aggregate via max_by on a struct key;
4. forward fill: ``last(value, ignoreNulls=True)`` over the entity's day
   order — one window pass on the grid (grid rows = |entities| × |days|,
   bounded and small relative to the fact table).

At 100 TB the fact table contributes one shuffle (step 3's aggregate);
the grid math never touches it again.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def daily_fill_forward(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Dense (entity, day) grid over the corpus's [min day, max day] with
    ``carried`` = the entity's last observed ``value_col`` on or before
    that day (last = max (ts, tiebreak) among the day's events; NULL
    before the entity's first observation) and ``observed`` = that day's
    own last value (NULL on gap days)."""
    ev = events.select(
        F.col(entity_col).alias("entity"),
        F.to_date(ts_col).alias("day"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).alias("_v"),
    )
    bounds = ev.agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")).alias("day")
    )
    entities = ev.select("entity").distinct()
    grid = entities.crossJoin(F.broadcast(spine))
    obs = ev.groupBy("entity", "day").agg(
        F.max_by("_v", F.struct("_ts", "_tb")).alias("observed")
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["entity", "day"], "left")
        .withColumn("carried", F.last("observed", ignorenulls=True).over(w))
        .select("entity", "day", "observed", "carried")
    )
