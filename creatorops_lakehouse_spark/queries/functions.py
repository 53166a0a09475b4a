"""Scalar/shape function coverage: pivot, distribution windows
(ntile/percent_rank), tumbling time windows in batch, regex extraction —
the §2.6/§2.7 long tail a reference user would expect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from creatorops_lakehouse_spark.queries import load, query

_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "events_pivot_daily_types",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date,
           {', '.join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _TYPES)}
    FROM events
    GROUP BY 1
    """,
)
def events_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event type (explicit value list, so the plan
    is a single aggregate — no second pass to discover pivot values; at
    scale always pass the values explicitly)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", list(_TYPES))
        .count()
        .na.fill(0)
        .select(
            "event_date", *[F.col(t).alias(f"n_{t}") for t in _TYPES]
        )
    )


@query(
    "orders_ntile_percentrank",
    oracle="""
    WITH ranked AS (
        SELECT o_orderkey, o_totalprice,
               NTILE(4) OVER w AS price_quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    )
    SELECT price_quartile,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MAX(pct_rank) AS max_pct_rank
    FROM ranked
    GROUP BY 1
    """,
)
def orders_ntile_percentrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: NTILE quartiles + PERCENT_RANK over a global
    order (unique tiebreak), computed WITHOUT a single-partition window:
    operators/sampling.py::distributed_global_rank range-partitions on
    the order key and assembles the exact global row_number from
    per-partition ranks + broadcast offsets; quartile and percent_rank
    are then pure arithmetic on (rank, n) — NTILE's uneven-split rule
    (first n mod k tiles get the extra row) and
    percent_rank = (rank-1)/(n-1) reproduce Spark's window semantics
    bit-for-bit, so the oracle's native NTILE/PERCENT_RANK agree."""
    from creatorops_lakehouse_spark.operators.sampling import (
        distributed_global_rank,
        ntile_from_rank,
    )

    ranked, n = distributed_global_rank(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        rank_col="_rk",
    )
    tile = ntile_from_rank("_rk", n, 4)
    pct = F.round((F.col("_rk") - 1).cast("double") / F.lit(max(n - 1, 1)), 6)
    ranked = ranked.select(
        "o_totalprice", tile.alias("price_quartile"), pct.alias("pct_rank")
    )
    return ranked.groupBy("price_quartile").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.max("pct_rank").alias("max_pct_rank"),
    )


@query(
    "events_tumbling_6h_windows",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def events_tumbling_6h_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time windows in batch (F.window — the same operator the
    streaming KPIs use; window start ≡ DuckDB time_bucket on epoch-aligned
    boundaries)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users",
        )
    )


@query(
    "part_type_regex_extract",
    oracle="""
    SELECT regexp_extract(p_type, '([A-Z]+)$', 1) AS finish,
           upper(substr(p_type, 1, 4)) AS prefix4,
           COUNT(*) AS n_parts,
           CAST(SUM(p_size) AS BIGINT) AS total_size
    FROM part
    WHERE p_type SIMILAR TO '[A-Z ]+'
    GROUP BY 1, 2
    """,
)
def part_type_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: regexp_extract (last word = finish), substring,
    upper, rlike anchor — all pushed through one projection."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type").rlike("^[A-Z ]+$"))
        .groupBy(
            F.regexp_extract("p_type", "([A-Z]+)$", 1).alias("finish"),
            F.upper(F.substring("p_type", 1, 4)).alias("prefix4"),
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("p_size").alias("total_size"),
        )
    )


@query(
    "events_user_journey_signatures",
    oracle="""
    WITH journeys AS (
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), '>') AS journey
        FROM events
        GROUP BY user_id
    )
    SELECT journey, COUNT(*) AS n_users
    FROM journeys
    GROUP BY 1
    """,
)
def events_user_journey_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-user distinct event-type set, canonicalized
    (sorted + joined) into a journey signature, then distributed over users
    — collect_set → array_sort keeps the aggregate order-insensitive, which
    is what makes a set-valued aggregation oracle-comparable at all."""
    journeys = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ">").alias(
                "journey"
            )
        )
    )
    return journeys.groupBy("journey").agg(F.count("*").alias("n_users"))


@query(
    "events_hourly_histogram",
    oracle="""
    SELECT CAST(extract(hour FROM ts) AS INTEGER) AS hour_of_day,
           CAST(extract(dow FROM ts) AS INTEGER) AS day_of_week,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction: hour-of-day × day-of-week activity histogram.

    Day-of-week numbering is pinned to DuckDB's extract(dow) (0=Sunday):
    Spark's dayofweek() is 1=Sunday, so shift by one.
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.hour("ts").alias("hour_of_day"),
            (F.dayofweek("ts") - 1).alias("day_of_week"),
        )
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS recency,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT custkey, frequency, monetary_cents,
               NTILE(4) OVER (ORDER BY recency, custkey) AS r_quartile,
               NTILE(4) OVER (ORDER BY frequency, custkey) AS f_quartile,
               NTILE(4) OVER (ORDER BY monetary_cents, custkey) AS m_quartile
        FROM a
    )
    SELECT CAST(100 * r_quartile + 10 * f_quartile + m_quartile AS INT)
               AS rfm_code,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM s GROUP BY 1
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (the classic customer-mart operator): per customer
    recency/frequency/monetary quartiles composed into a 3-digit segment
    code, rolled up to segment counts + exact cents mass. Each quartile
    assignment uses operators/sampling.py::distributed_global_ranks +
    ntile_from_rank — ONE melted range shuffle, ONE counts-collect and
    ONE window for all three dimensions (r14: the chained per-dimension
    distributed_global_rank form paid a range shuffle + driver
    round-trip + window EACH, sequentially), and NO single-partition
    windows (at a 10^8-customer dimension the naive NTILE window would
    be the scale-killer); the oracle runs native NTILE over the
    identical (value, custkey) total orders. recency is a timestamp —
    ``unix_micros`` is its exact monotone long image, so the melted
    (value, custkey) order matches the chained form's (recency, custkey)
    order bit-for-bit; monetary_cents rides the pivot back out, so the
    base table is never re-joined."""
    from creatorops_lakehouse_spark.operators.sampling import (
        distributed_global_ranks,
        ntile_from_rank,
    )

    a = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("recency"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            (F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    wide, n = distributed_global_ranks(
        a,
        "custkey",
        {
            "r": F.unix_micros(F.col("recency").cast("timestamp")),
            "f": F.col("frequency"),
            "m": F.col("monetary_cents"),
        },
        rank_suffix="_rk",
    )
    cur = wide.select(
        ntile_from_rank("r_rk", n, 4).alias("r_quartile"),
        ntile_from_rank("f_rk", n, 4).alias("f_quartile"),
        ntile_from_rank("m_rk", n, 4).alias("m_quartile"),
        F.col("m_value").alias("monetary_cents"),
    )
    return (
        cur.select(
            (
                100 * F.col("r_quartile")
                + 10 * F.col("f_quartile")
                + F.col("m_quartile")
            )
            .cast("int")
            .alias("rfm_code"),
            "monetary_cents",
        )
        .groupBy("rfm_code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("segment_cents"),
        )
    )


@query(
    "events_sliding_6h_3h_windows",
    oracle="""
    SELECT time_bucket(INTERVAL 3 HOURS, ts) - i * INTERVAL 3 HOURS
               AS window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i)
    GROUP BY 1
    """,
)
def events_sliding_6h_3h_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING (hopping) time windows in batch — 6-hour duration, 3-hour
    slide, so every event lands in exactly duration/slide = 2 windows
    (F.window's overlap expansion; completes the window family next to
    the tumbling and session queries). The oracle reconstructs the same
    assignment arithmetically: an event's windows start at its 3-hour
    bucket minus i*3h for i in 0..1, epoch-aligned on both engines."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )
