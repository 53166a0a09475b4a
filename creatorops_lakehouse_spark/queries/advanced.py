"""Advanced relational coverage: as-of join, interval self-join, correlated
scalar subqueries (through the spark.sql entry path), cube grouping sets,
running-window frames, and outer-join distributions.

These extend SURVEY.md §2's inventory with the operator classes a user of
the reference would reach for next (§2.3/§2.5/§2.6 notes + §7.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from creatorops_lakehouse_spark.operators.asof import asof_join
from creatorops_lakehouse_spark.operators.rangejoin import event_pairs_within
from creatorops_lakehouse_spark.operators.dedup import edit1_pairs
from creatorops_lakehouse_spark.queries import load, query


@query(
    "events_asof_join_purchase_click",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.ts AS last_click_ts,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_micros
    FROM purchases p
    ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it.

    Spark has no ASOF JOIN; operators/asof.py implements it as a union-tag
    + last_value window (one shuffle) — checked here against DuckDB's
    native ASOF JOIN.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases, clicks, on="user_id", right_payload=[], how="inner"
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("last_click_ts"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_micros"),
    )


@query(
    "events_pairs_within_30min",
    oracle="""
    SELECT a.user_id,
           COUNT(*) AS n_pairs,
           CAST(MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS min_gap_micros
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800 * 1000000
    GROUP BY 1
    """,
)
def events_pairs_within_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: ordered event pairs within 30 minutes per user,
    via bucketed equi-join (operators/rangejoin.py) — no cartesian plan."""
    pairs = event_pairs_within(
        load(spark, sf_dir, "events"), window_seconds=1800
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.min("gap_micros").alias("min_gap_micros"),
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100 AS small_qty_revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery, exercised through the
    spark.sql entry path so Catalyst's subquery decorrelation runs (it
    rewrites to an aggregate + join — the plan a hand-written DataFrame
    version would build)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                    AS DOUBLE) / 100 AS small_qty_revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13'
          AND l.l_quantity < (
              SELECT 0.5 * AVG(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@query(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with a join-side predicate, then a
    distribution over the grouped counts (two chained aggregations)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "lineitem_cube_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(l_quantity) AS BIGINT) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (§2.4 extension): all 4 grouping combinations in
    one shuffle via grouping-set expansion."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("l_quantity").cast("long").cast("double").alias("sum_qty"),
        )
    )


@query(
    "events_running_user_totals",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, event_id, rn AS event_seq,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS running_value
    FROM seq
    WHERE rn <= 20
    """,
)
def events_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative totals with an explicit ROWS frame (§2.5 frame
    specs). The accumulation runs in exact integer cents so both engines
    produce identical doubles at every prefix."""
    cents = F.round(F.col("value") * 100).cast("long")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_seq = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", cents.alias("cents"))
        .withColumn("event_seq", F.row_number().over(w_seq))
        .withColumn("running_value", F.sum("cents").over(w_run).cast("double") / 100)
        .filter(F.col("event_seq") <= 20)
        .select("user_id", "event_id", "event_seq", "running_value")
    )


#: SCD2 history CTE chain shared by the history query and its as-of
#: consumer (identical semantics in both oracles)
_SCD2_HIST_SQL = """
    s AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               LAG(1) OVER w IS NULL AS is_first,
               LAG(o_orderpriority) OVER w AS prev_p
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    c AS (
        SELECT * FROM s
        WHERE is_first OR prev_p IS DISTINCT FROM o_orderpriority
    ),
    hist AS (
        SELECT o_custkey AS custkey, o_orderpriority AS priority,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS version
        FROM c
    )
"""


@query(
    "lineitem_enrich_scd2_interval",
    oracle=f"""
    WITH {_SCD2_HIST_SQL}
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS custkey,
           h.priority AS priority_at_ship, h.version
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN hist h ON h.custkey = o.o_custkey
        AND h.valid_from <= l.l_shipdate
        AND (h.valid_to IS NULL OR l.l_shipdate < h.valid_to)
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    """,
)
def lineitem_enrich_scd2_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact enrichment via SCD2 interval membership: each 1998-shipped
    lineitem picks up the ordering customer's priority regime valid AT
    its ship date (valid_from <= ship < valid_to, open-ended current
    run) — the downstream consumption pattern the SCD2 operator exists
    for, probing MID-history (ship dates fall inside the 1995-2001
    change timeline, so different lineitems of one customer hit
    different versions). Interval membership (not a plain as-of) is
    deliberate: same-date double changes produce zero-length intervals
    that must match nothing (15 such pairs at sf0.01 — an as-of 'latest
    wins' would be ambiguous there). The history is fact-derived (one
    row per priority run), so it joins by shuffle on custkey — AQE may
    still broadcast at small scale; the year filter is pushed to the
    lineitem scan."""
    from creatorops_lakehouse_spark.operators.scd import scd2_intervals

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    hist = scd2_intervals(
        o,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderpriority"],
        tiebreak_cols=["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority_at_ship"),
        "valid_from",
        "valid_to",
        "version",
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )
    # orders is a FACT (not forced broadcast — AQE picks the strategy;
    # at 100 TB this is the one genuine shuffle join in the plan), the
    # SCD2 history is a dimension (forced broadcast below).
    with_cust = li.join(
        o.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_linenumber", "l_shipdate", F.col("o_custkey").alias("custkey"))
    # The SCD2 history is fact-DERIVED (one row per priority run — ~80%
    # of orders here), so it is NOT force-broadcast: the join shuffles on
    # custkey and AQE may still broadcast at bench scale. The interval
    # predicate rides the join as a post-join filter; per customer the
    # history rows are few, so the per-key expansion is bounded.
    return (
        with_cust.join(hist, "custkey")
        .filter(
            (F.col("valid_from") <= F.col("l_shipdate"))
            & (
                F.col("valid_to").isNull()
                | (F.col("l_shipdate") < F.col("valid_to"))
            )
        )
        .select("l_orderkey", "l_linenumber", "custkey", "priority_at_ship", "version")
    )


@query(
    "orders_scd2_priority_history",
    oracle="""
    WITH s AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               LAG(1) OVER w IS NULL AS is_first,
               LAG(o_orderpriority) OVER w AS prev_p
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    c AS (
        SELECT * FROM s
        WHERE is_first OR prev_p IS DISTINCT FROM o_orderpriority
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS version
    FROM c
    """,
)
def orders_scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history built from a change stream
    (operators/scd.py::scd2_intervals): each customer's order-priority
    regime as half-open validity intervals — consecutive same-priority
    orders collapse into one run, valid_to = the next run's valid_from
    (NULL on the current run), version = per-key change ordinal. The
    immutable-event-log data model's dimension-building step: one shuffle
    on the key, run detection + interval assembly fused into a single
    sort/window stage (no self-join). Downstream as-of joins consume the
    intervals instead of daily dimension snapshots."""
    from creatorops_lakehouse_spark.operators.scd import scd2_intervals

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    hist = scd2_intervals(
        o,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderpriority"],
        tiebreak_cols=["o_orderkey"],
    )
    return hist.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        "valid_from",
        "valid_to",
        "version",
    )


@query(
    "events_rolling_7d_user_cents",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_7d_cents,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_7d_events
    FROM events
    """,
)
def events_rolling_7d_user_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day time-RANGE window per user (§2.5 extension: a
    range-interval frame, not a ROWS frame — the frame boundary is a
    timestamp offset, so same-ts peers are always framed together and
    both engines agree row-for-row). The feature-engineering staple for
    training-data pipelines: per-entity trailing-window aggregates.

    The order key is epoch seconds (Spark's rangeBetween needs a numeric
    key); the value sums in exact integer cents. One shuffle on user_id;
    each partition's frame slide is O(n) two-pointer work inside the
    window exec — no self-join, which is how a naive SQL translation
    (events x events ON ts BETWEEN ...) would quadratically blow up at
    100 TB."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", cents.alias("cents"))
        .select(
            "user_id",
            "event_id",
            F.sum("cents").over(w).cast("long").alias("rolling_7d_cents"),
            F.count(F.lit(1)).over(w).cast("long").alias("rolling_7d_events"),
        )
    )


@query(
    "tpch_q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY 1
    """,
)
def tpch_q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table predicate →
    left-semi join on (orderkey) with the shipdate>orderdate condition in
    the join."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "events_session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, cents,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100 AS session_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's native session_window (30-min
    inactivity gap) — the stateful-session operator class (§2.8). The
    DuckDB oracle reconstructs identical sessions with the lag-marker +
    cumulative-sum idiom; boundary semantics pinned to [start, end): a gap
    of exactly 30 minutes starts a NEW session on both engines.

    Scale: one shuffle on user_id; session merging is streaming-capable
    (same expression under withWatermark in streaming mode).
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", cents.alias("cents"))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("cents").cast("double") / 100).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "events_daily_fill_forward",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    b AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
          FROM c),
    spine AS (
        SELECT CAST(unnest(generate_series(
            (SELECT d0 FROM b), (SELECT d1 FROM b), INTERVAL 1 DAY
        )) AS DATE) AS day
    ),
    u AS (SELECT DISTINCT user_id FROM c),
    grid AS (SELECT u.user_id, s.day FROM u CROSS JOIN spine s),
    obs AS (
        SELECT user_id, day, observed FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, cents AS observed,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM c
        ) WHERE rn = 1
    )
    SELECT g.user_id, g.day, o.observed,
           last_value(o.observed IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS carried
    FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.day = g.day
    """,
)
def events_daily_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal resampling (operators/timeseries.py::daily_fill_forward):
    densify each user onto the corpus's full day spine and carry the
    last observed value (exact cents) forward across gap days — the
    feature-mart/BI staple the sparse event log can't serve directly.
    The fact table contributes ONE hash aggregate (per-user-day last
    value via max_by on the (ts, event_id) total order); the spine is
    generated by sequence(), the user x day grid is a broadcast cross
    join of two dimension-sized tables, and the fill is one window pass
    over the grid."""
    from creatorops_lakehouse_spark.operators.timeseries import (
        daily_fill_forward,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return daily_fill_forward(
        ev, entity_col="user_id", ts_col="ts", value_col="cents",
        tiebreak_col="event_id",
    ).select(F.col("entity").alias("user_id"), "day", "observed", "carried")


@query(
    "supplier_revenue_rollup_region_nation",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100)
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def supplier_revenue_rollup_region_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROLLUP grouping sets (completes the family next to the CUBE query):
    supplier revenue at nation, region-subtotal, and grand-total grain in
    ONE shuffle via grouping-set expansion — the hierarchy-subtotal
    pattern a BI mart would otherwise compute as three queries. Revenue
    sums in exact cents (DECIMAL intermediate x 100 -> BIGINT); dims
    broadcast onto the fact scan."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .rollup("region", "nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)") * 100))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


@query(
    "customer_fuzzy_name_pairs",
    oracle="""
    SELECT a.c_custkey AS a_custkey,
           b.c_custkey AS b_custkey,
           a.c_nationkey AS nationkey,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def customer_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy matching: near-identical customer names
    (Levenshtein ≤ 1) inside a nation block — the blocked-similarity-join
    primitive record-linkage pipelines run before merging duplicate
    entities. Both engines implement classic unit-cost edit distance, so
    the distance (and the keep/drop decision) is integer-exact.

    Scale shape: NOT the per-block quadratic scan the oracle runs — the
    Spark plan is symmetric-delete candidate generation
    (operators/dedup.py::edit1_pairs): each name contributes its |s|+1
    one-char-deletion variants to an inverted index, candidates are the
    equi-join matches on (nationkey, variant), and every candidate is
    verified with the real levenshtein, so the result is hash-identical
    to the brute-force block scan while the work is linear in rows ×
    name length (measured 12.8 s → 1.4–1.9 s warm at sf0.1 when this replaced
    the blocked self-join). Quadratic cost only reappears inside genuine
    near-duplicate clusters — output-proportional, the same guarantee as
    the shingle-dedup posting join."""
    pairs = edit1_pairs(
        load(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey"
        ),
        name_col="c_name",
        id_col="c_custkey",
        block_cols=["c_nationkey"],
    )
    return pairs.select(
        F.col("a_id").alias("a_custkey"),
        F.col("b_id").alias("b_custkey"),
        F.col("c_nationkey").alias("nationkey"),
        "edit_distance",
    )


@query(
    "orders_snapshot_merge_verdict",
    oracle="""
    WITH k AS (SELECT MAX(o_orderkey) // 4 + 1 AS w FROM orders),
    b AS (
        SELECT LEAST(o_orderkey // (SELECT w FROM k), 3) AS band,
               o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    )
    SELECT (SELECT CAST(COUNT(DISTINCT band) AS BIGINT) FROM b) AS n_commits,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents + CASE WHEN band = 1 AND o_orderkey % 7 = 0
                                 THEN 11111 ELSE 0 END) AS BIGINT)
               AS sum_cents,
           TRUE AS untouched_ok, TRUE AS time_travel_ok
    FROM b
    """,
)
def orders_snapshot_merge_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO with stats-bounded rewrite under the driver hash gate:
    commit orders as one snapshot append per disjoint orderkey band, merge
    an update batch whose key envelope sits entirely inside band 1
    (+11111 cents on every 7th key), then pin:

    - untouched_ok: every band-≠1 commit dir carried into the post-merge
      manifest byte-identical (manifest stats bounded the rewrite to the
      one intersecting commit);
    - time_travel_ok: the pre-merge version still serves the original
      cents checksum (merge is a new version, not a mutation);
    - n_rows / sum_cents: the merged head's content hash-checked against
      the oracle's independent recomputation of the same update.

    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs,
        snapshot_merge,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    w = max_key // 4 + 1
    banded = scoped_persist(
        orders.withColumn(
            "band", F.least(F.expr(f"o_orderkey div {w}"), F.lit(3))
        )
    )
    bands = sorted(r[0] for r in banded.select("band").distinct().collect())
    root = _tempfile.mkdtemp(prefix="snap_merge_")
    try:
        spec = TableSpec("t.merge", root + "/t")
        for b in bands:
            snapshot_write(banded.filter(F.col("band") == b).drop("band"), spec)
        pre_v = len(bands) - 1
        pre_dirs = {b: snapshot_dirs(spec, pre_v)[b] for b in range(len(bands))}
        pre_sum = snapshot_read(spark, spec).agg(
            F.sum("cents").cast("long").alias("c")
        ).collect()[0]["c"]

        source = (
            banded.filter(
                (F.col("band") == 1) & (F.col("o_orderkey") % 7 == 0)
            )
            .select("o_orderkey", (F.col("cents") + 11111).alias("cents"))
        )
        v = snapshot_merge(spark, spec, source, keys=["o_orderkey"])
        post_dirs = set(snapshot_dirs(spec, v))
        untouched_ok = all(
            pre_dirs[b] in post_dirs for b in range(len(bands)) if b != 1
        ) and pre_dirs[1] not in post_dirs

        head = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        tt_sum = snapshot_read(spark, spec, version=pre_v).agg(
            F.sum("cents").cast("long").alias("c")
        ).collect()[0]["c"]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                len(bands),
                head["n"],
                head["c"],
                bool(untouched_ok),
                tt_sum == pre_sum,
            )
        ],
        "n_commits long, n_rows long, sum_cents long, "
        "untouched_ok boolean, time_travel_ok boolean",
    )


@query(
    "orders_snapshot_update_verdict",
    oracle="""
    WITH k AS (SELECT MAX(o_orderkey) // 4 + 1 AS w FROM orders),
    b AS (
        SELECT LEAST(o_orderkey // (SELECT w FROM k), 3) AS band,
               o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    )
    SELECT (SELECT CAST(COUNT(DISTINCT band) AS BIGINT) FROM b) AS n_commits,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN band = 2 THEN cents * 2 + 7
                         ELSE cents END) AS BIGINT) AS sum_cents,
           TRUE AS untouched_ok, TRUE AS time_travel_ok
    FROM b
    """,
)
def orders_snapshot_update_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... SET ... WHERE with stats-bounded rewrite under the
    driver hash gate — the third DML leg next to the merge and bloom
    verdicts: commit orders as one snapshot append per disjoint orderkey
    band, run ``snapshot_update_where`` over band 2's key range with an
    expression SET (``cents = cents * 2 + 7`` — evaluated per matched
    row, not a constant fill), then pin:

    - untouched_ok: every band-≠2 commit dir carried into the post-update
      manifest byte-identical (manifest stats bounded the rewrite to the
      one intersecting commit);
    - time_travel_ok: the pre-update version still serves the original
      cents checksum (UPDATE is a new version, not a mutation);
    - n_rows / sum_cents: the updated head hash-checked against the
      oracle's independent recomputation of the same UPDATE.

    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    w = max_key // 4 + 1
    banded = scoped_persist(
        orders.withColumn(
            "band", F.least(F.expr(f"o_orderkey div {w}"), F.lit(3))
        )
    )
    bands = sorted(r[0] for r in banded.select("band").distinct().collect())
    root = _tempfile.mkdtemp(prefix="snap_upd_")
    try:
        spec = TableSpec("t.upd", root + "/t")
        for b in bands:
            snapshot_write(banded.filter(F.col("band") == b).drop("band"), spec)
        pre_v = len(bands) - 1
        pre_dirs = {b: snapshot_dirs(spec, pre_v)[b] for b in range(len(bands))}
        pre_sum = snapshot_read(spark, spec).agg(
            F.sum("cents").cast("long").alias("c")
        ).collect()[0]["c"]

        # band 2's exact key range: [2w, 3w) clipped to the data
        v = snapshot_update_where(
            spark,
            spec,
            {"o_orderkey": (2 * w, 3 * w - 1)},
            {"cents": "cents * 2 + 7"},
        )
        post_dirs = set(snapshot_dirs(spec, v))
        untouched_ok = all(
            pre_dirs[b] in post_dirs for b in range(len(bands)) if b != 2
        ) and pre_dirs[2] not in post_dirs

        head = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        tt_sum = snapshot_read(spark, spec, version=pre_v).agg(
            F.sum("cents").cast("long").alias("c")
        ).collect()[0]["c"]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                len(bands),
                head["n"],
                head["c"],
                bool(untouched_ok),
                tt_sum == pre_sum,
            )
        ],
        "n_commits long, n_rows long, sum_cents long, "
        "untouched_ok boolean, time_travel_ok boolean",
    )


@query(
    "orders_merge_clauses_verdict",
    oracle="""
    WITH k AS (SELECT MAX(o_orderkey) // 4 + 1 AS w FROM orders),
    o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               LEAST(o_orderkey // (SELECT w FROM k), 3) AS band
        FROM orders
    ),
    ins AS (
        -- generate_series can't take subquery bounds in DuckDB: use a
        -- constant 0..200 range offset by w
        SELECT x AS key, CAST(x % 97 AS BIGINT) AS cents FROM (
            SELECT r + (SELECT w FROM k) AS x FROM range(0, 201) t(r)
        ) WHERE x NOT IN (SELECT key FROM o)
        ORDER BY x LIMIT 5
    ),
    kept AS (
        SELECT key,
               CASE WHEN band = 1 AND key % 3 = 1 THEN cents + 1000
                    ELSE cents END AS cents
        FROM o
        WHERE NOT (band = 1 AND key % 3 = 0)
    ),
    final AS (
        SELECT * FROM kept UNION ALL SELECT key, cents FROM ins
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST((SELECT COUNT(*) FROM o WHERE band = 1 AND key % 3 = 0)
                AS BIGINT) AS n_deleted,
           CAST((SELECT COUNT(*) FROM ins) AS BIGINT) AS n_inserted,
           TRUE AS untouched_ok, TRUE AS time_travel_ok
    FROM final
    """,
)
def orders_merge_clauses_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-clause MERGE INTO under the driver hash — Delta's
    matched-delete / matched-update / conditional-insert algebra
    (sources/snapshots.py::snapshot_merge_clauses), the CDC-apply shape:
    orders commit as four disjoint orderkey-band snapshots, then ONE
    merge applies a change batch scoped to band 1's key range —
    ``src_op='D'`` rows delete (keys ≡0 mod 3), ``src_op='U'`` rows take
    the source's cents (orig+1000, keys ≡1 mod 3), and five brand-new
    in-band keys insert under the ``op='I'`` condition (chosen by
    anti-join inside the band so the key ENVELOPE stays inside band 1 and
    manifest stats keep bands 0/2/3 byte-untouched — pinned by
    untouched_ok). time_travel_ok pins the pre-merge version intact; the
    oracle recomputes the post-merge table independently.

    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs,
        snapshot_merge_clauses,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    max_key = orders.agg(F.max("key")).collect()[0][0]
    w = max_key // 4 + 1
    banded = scoped_persist(
        orders.withColumn("band", F.least(F.expr(f"key div {w}"), F.lit(3)))
    )
    bands = sorted(r[0] for r in banded.select("band").distinct().collect())
    # change batch: D/U over existing band-1 keys + 5 new in-band keys
    b1 = banded.filter(F.col("band") == 1)
    deletes = b1.filter(F.col("key") % 3 == 0).select(
        "key", F.lit(None).cast("long").alias("cents"), F.lit("D").alias("op")
    )
    updates = b1.filter(F.col("key") % 3 == 1).select(
        "key", (F.col("cents") + 1000).alias("cents"), F.lit("U").alias("op")
    )
    inserts = (
        spark.range(w, w + 201)
        .select(F.col("id").alias("key"))
        .join(orders.select("key"), "key", "left_anti")
        .orderBy("key")
        .limit(5)
        .select("key", (F.col("key") % 97).cast("long").alias("cents"),
                F.lit("I").alias("op"))
    )
    source = deletes.unionByName(updates).unionByName(inserts)

    root = _tempfile.mkdtemp(prefix="snap_mrg_")
    try:
        spec = TableSpec("t.mrg", root + "/t")
        for b in bands:
            snapshot_write(banded.filter(F.col("band") == b).drop("band"), spec)
        pre_v = len(bands) - 1
        pre_dirs = {b: snapshot_dirs(spec, pre_v)[b] for b in range(len(bands))}
        pre_sum = snapshot_read(spark, spec).agg(
            F.sum("cents").cast("long").alias("c")
        ).collect()[0]["c"]
        pre_n = snapshot_read(spark, spec).count()

        v = snapshot_merge_clauses(
            spark,
            spec,
            source,
            keys=["key"],
            matched_delete="src_op = 'D'",
            matched_update={"cents": "src_cents"},
            insert="op = 'I'",
        )
        post_dirs = set(snapshot_dirs(spec, v))
        untouched_ok = all(
            pre_dirs[b] in post_dirs for b in range(len(bands)) if b != 1
        ) and pre_dirs[1] not in post_dirs

        head = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        n_deleted = deletes.count()
        n_inserted = inserts.count()
        tt = snapshot_read(spark, spec, version=pre_v).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                head["n"],
                head["c"],
                n_deleted,
                n_inserted,
                bool(untouched_ok),
                tt["n"] == pre_n and tt["c"] == pre_sum,
            )
        ],
        "n_rows long, sum_cents long, n_deleted long, n_inserted long, "
        "untouched_ok boolean, time_travel_ok boolean",
    )


@query(
    "orders_replace_where_verdict",
    oracle="""
    WITH k AS (SELECT MAX(o_orderkey) // 4 + 1 AS w FROM orders),
    o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               LEAST(o_orderkey // (SELECT w FROM k), 3) AS band
        FROM orders
    ),
    repl AS (
        SELECT key, CAST(key % 1000 AS BIGINT) AS cents
        FROM o WHERE band = 2 AND key % 2 = 0
    ),
    final AS (
        SELECT key, cents FROM o WHERE band <> 2
        UNION ALL SELECT key, cents FROM repl
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST((SELECT COUNT(*) FROM repl) AS BIGINT) AS n_replacement,
           TRUE AS untouched_ok, TRUE AS atomic_one_version,
           TRUE AS time_travel_ok
    FROM final
    """,
)
def orders_replace_where_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT OVERWRITE ... replaceWhere`` under the driver hash
    (sources/snapshots.py::snapshot_replace_where) — the backfill shape:
    orders commit as four disjoint orderkey-band snapshots, band 2 is
    atomically replaced by a recomputed, SMALLER row set (even keys only,
    cents = key mod 1000), and the verdict pins:

    - untouched_ok: bands 0/1/3 dirs carried byte-identical (stats
      bounded the rewrite to band 2's commits);
    - atomic_one_version: the delete+insert is ONE commit (exactly one
      version bump — no observable window where band 2 is missing);
    - time_travel_ok: the pre-replace version still serves the original
      contents;
    - n_rows / sum_cents / n_replacement hash-checked against the
      oracle's independent recompute.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs,
        snapshot_read,
        snapshot_replace_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    max_key = orders.agg(F.max("key")).collect()[0][0]
    w = max_key // 4 + 1
    banded = scoped_persist(
        orders.withColumn("band", F.least(F.expr(f"key div {w}"), F.lit(3)))
    )
    bands = sorted(r[0] for r in banded.select("band").distinct().collect())
    repl = banded.filter((F.col("band") == 2) & (F.col("key") % 2 == 0)).select(
        "key", (F.col("key") % 1000).cast("long").alias("cents")
    )

    root = _tempfile.mkdtemp(prefix="snap_rw_")
    try:
        spec = TableSpec("t.rw", root + "/t")
        for b in bands:
            snapshot_write(banded.filter(F.col("band") == b).drop("band"), spec)
        pre_v = len(bands) - 1
        pre_dirs = {b: snapshot_dirs(spec, pre_v)[b] for b in range(len(bands))}
        pre = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]

        v = snapshot_replace_where(
            spark, spec, repl, {"key": (2 * w, 3 * w - 1)}
        )
        post_dirs = set(snapshot_dirs(spec, v))
        untouched_ok = all(
            pre_dirs[b] in post_dirs for b in range(len(bands)) if b != 2
        ) and pre_dirs[2] not in post_dirs

        head = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        n_repl = repl.count()
        tt = snapshot_read(spark, spec, version=pre_v).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                head["n"],
                head["c"],
                n_repl,
                bool(untouched_ok),
                v == pre_v + 1,
                tt["n"] == pre["n"] and tt["c"] == pre["c"],
            )
        ],
        "n_rows long, sum_cents long, n_replacement long, "
        "untouched_ok boolean, atomic_one_version boolean, "
        "time_travel_ok boolean",
    )


@query(
    "orders_snapshot_lifecycle_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey % 4 AS band
        FROM orders
    ),
    v2 AS (SELECT key, cents FROM o WHERE band <= 2),
    merged AS (
        SELECT key,
               CASE WHEN band = 0 AND key % 3 = 1 THEN cents + 777
                    ELSE cents END AS cents
        FROM o WHERE band <= 2 AND NOT (band = 0 AND key % 3 = 0)
        UNION ALL
        SELECT key, cents FROM o WHERE band = 3
    ),
    v4 AS (SELECT key, cents FROM merged WHERE key > 500),
    cdf_ins AS (SELECT key FROM v4 WHERE key NOT IN (SELECT key FROM v2)),
    cdf_del AS (SELECT key FROM v2 WHERE key NOT IN (SELECT key FROM v4)),
    cdf_upd AS (
        SELECT a.key FROM v2 a JOIN v4 b USING (key) WHERE a.cents <> b.cents
    )
    SELECT CAST((SELECT COUNT(*) FROM v2) AS BIGINT) AS n_v2,
           CAST((SELECT SUM(cents) FROM v2) AS BIGINT) AS sum_cents_v2,
           CAST((SELECT COUNT(*) FROM v4) AS BIGINT) AS n_final,
           CAST((SELECT SUM(cents) FROM v4) AS BIGINT) AS sum_cents_final,
           CAST((SELECT COUNT(*) FROM cdf_ins) AS BIGINT) AS n_cdf_insert,
           CAST((SELECT COUNT(*) FROM cdf_del) AS BIGINT) AS n_cdf_delete,
           CAST((SELECT COUNT(*) FROM cdf_upd) AS BIGINT) AS n_cdf_update,
           TRUE AS travel_ok, TRUE AS optimize_ok, TRUE AS checkpoint_ok,
           TRUE AS vacuum_head_ok, TRUE AS vacuum_trimmed_ok
    """,
)
def orders_snapshot_lifecycle_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE table lifecycle composed under one oracle hash — the
    lakehouse twin of docs_curation_e2e_verdict (per-op verdicts exist for
    every step; THIS row pins their composition):

    write band0 → append band1 → append band2 (v0..v2) → full-clause
    MERGE (band-0 deletes at key≡0 mod 3, updates +777 at key≡1 mod 3,
    band-3 inserts under the op='I' condition) → DELETE WHERE key ≤ 500
    (copy-on-write, stats-pruned) → time-travel read of v2 THROUGH the
    rewrites → OPTIMIZE compaction (content-preserving) → checkpoint →
    key-level CDF v2→v4 with update detection → VACUUM keep_last=1
    (head still reads; travel past the horizon now REFUSES — retention
    trimming is part of the contract, not an afterthought).

    The oracle recomputes v2, the post-merge/post-delete final state, and
    all three CDF counts from raw ``orders`` in pure SQL; the five
    booleans are computed in-engine (travel equality, optimize
    count+sum preservation, checkpointed head planning, post-vacuum head
    equality, post-vacuum travel refusal) and pinned TRUE by the oracle —
    any lifecycle regression flips the hash. Eager verdict harness
    (excluded from bench); scratch tree deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        current_version,
        optimize_snapshots,
        snapshot_delete_where,
        snapshot_diff,
        snapshot_merge_clauses,
        snapshot_read,
        snapshot_write,
        vacuum_snapshots,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    exp_v2 = banded.filter(F.col("band") <= 2).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("c"),
    ).collect()[0]

    root = _tempfile.mkdtemp(prefix="snap_lifecycle_")
    try:
        spec = TableSpec("t.lc", root + "/t")
        for b in (0, 1, 2):
            snapshot_write(banded.filter(F.col("band") == b).drop("band"), spec)
        assert current_version(spec) == 2

        b0 = banded.filter(F.col("band") == 0)
        source = (
            b0.filter(F.col("key") % 3 == 0)
            .select("key", F.lit(None).cast("long").alias("cents"),
                    F.lit("D").alias("op"))
            .unionByName(
                b0.filter(F.col("key") % 3 == 1).select(
                    "key", (F.col("cents") + 777).alias("cents"),
                    F.lit("U").alias("op"))
            )
            .unionByName(
                banded.filter(F.col("band") == 3).select(
                    "key", "cents", F.lit("I").alias("op"))
            )
        )
        snapshot_merge_clauses(
            spark, spec, source, keys=["key"],
            matched_delete="src_op = 'D'",
            matched_update={"cents": "src_cents"},
            insert="op = 'I'",
        )
        v4 = snapshot_delete_where(spark, spec, {"key": (None, 500)})

        # time travel THROUGH the merge+delete rewrites
        t2 = snapshot_read(spark, spec, version=2).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        travel_ok = (t2["n"], t2["c"]) == (exp_v2["n"], exp_v2["c"])

        final_pre = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]

        optimize_snapshots(spark, spec)
        after_opt = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        optimize_ok = (after_opt["n"], after_opt["c"]) == (
            final_pre["n"], final_pre["c"]
        )

        checkpoint_manifest(spec)
        checkpoint_ok = snapshot_read(spark, spec).count() == final_pre["n"]

        cdf = snapshot_diff(spark, spec, 2, v4, keys=["key"],
                            detect_updates=True)
        cdf_counts = {
            r["_change_type"]: r["n"]
            for r in cdf.groupBy("_change_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }

        vacuum_snapshots(spec, keep_last=1)
        after_vac = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        vacuum_head_ok = (after_vac["n"], after_vac["c"]) == (
            final_pre["n"], final_pre["c"]
        )
        try:  # travel past the retention horizon must now refuse
            snapshot_read(spark, spec, version=2).count()
            vacuum_trimmed_ok = False
        except Exception:
            vacuum_trimmed_ok = True
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        [(
            int(exp_v2["n"]), int(exp_v2["c"]),
            int(final_pre["n"]), int(final_pre["c"]),
            int(cdf_counts.get("insert", 0)),
            int(cdf_counts.get("delete", 0)),
            int(cdf_counts.get("update_postimage", 0)),
            bool(travel_ok), bool(optimize_ok), bool(checkpoint_ok),
            bool(vacuum_head_ok), bool(vacuum_trimmed_ok),
        )],
        "n_v2 long, sum_cents_v2 long, n_final long, sum_cents_final long, "
        "n_cdf_insert long, n_cdf_delete long, n_cdf_update long, "
        "travel_ok boolean, optimize_ok boolean, checkpoint_ok boolean, "
        "vacuum_head_ok boolean, vacuum_trimmed_ok boolean",
    )


@query(
    "events_running_totals_bucketed",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, event_id, rn AS event_seq,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS running_value
    FROM seq
    WHERE rn <= 20
    """,
)
def events_running_totals_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same running cumulative totals as events_running_user_totals,
    computed through the HOT-KEY-SAFE two-phase prefix sum
    (operators/sessionize.py::keyed_running_sum_bucketed): local running
    sums per (user, day-bucket) + per-present-bucket offsets — no window
    partition ever holds a user's lifetime rows, so one 60M-row bot
    account cannot single-thread the cumulative stage. The oracle is the
    PLAIN global window — same hash means the decomposition is exactly
    the classic semantics. Exact integer cents keep every prefix
    bit-identical across engines."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_running_sum_bucketed,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # event_seq is the same two-phase trick with value 1 — both measures
    # ride ONE pass (one local window + one offsets window + one
    # join-back) instead of two operator runs zipped by a third shuffle;
    # per-measure arithmetic identical, so the output is bit-equal
    run = keyed_running_sum_bucketed(
        ev.withColumn("_one", F.lit(1)),
        key_col="user_id",
        values={"_run": "cents", "event_seq": "_one"},
    )
    return (
        run.filter(F.col("event_seq") <= 20)
        .select(
            "user_id", "event_id",
            F.col("event_seq").cast("long").alias("event_seq"),
            (F.col("_run").cast("double") / 100).alias("running_value"),
        )
    )


@query(
    "orders_matview_incremental_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    fin AS (
        SELECT key,
               CASE WHEN key BETWEEN 1000 AND 2000 THEN cents + 777
                    ELSE cents END AS cents
        FROM o WHERE key > 500
    )
    SELECT CAST(COUNT(DISTINCT key % 7) AS BIGINT) AS n_groups,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           TRUE AS append_path_ok, TRUE AS catchup_path_ok,
           TRUE AS diff_path_ok, TRUE AS equals_full_ok, TRUE AS noop_ok
    FROM fin
    """,
)
def orders_matview_incremental_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate view under one
    oracle hash (sources/matview.py — the upgrade path for the
    reference's full-recompute gold tables): SUM/COUNT per key%7 group
    maintained across the whole source lifecycle WITHOUT ever
    re-aggregating the table.

    write band0 → create view (full materialization, watermark v0) →
    append band1 → refresh (must take the INCREMENTAL-APPEND path: only
    the added dirs are scanned) → append band2 + band3 → one catch-up
    refresh spanning two versions (still the append fast path — the check
    is content-based on the two manifests) → copy-on-write DELETE
    key ≤ 500 → UPDATE cents += 777 on key ∈ [1000, 2000] → refresh
    (must fall back to the CDF DIFF path, folding delete/update
    pre/post images with ±1 weights) → replayed refresh (must no-op via
    the txn-map watermark). After EVERY refresh the view is compared to
    a from-scratch aggregate of the source head (equals_full_ok).

    The oracle recomputes the final state's group count, row count, and
    cents total from raw ``orders`` in pure SQL and pins all five path
    booleans TRUE — a wrong refresh mode, a lost delta, a double-applied
    replay, or any divergence from the full recompute flips the hash.
    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {"sum_cents": "cents"}, ["key"]

    def _full(src_spec):
        return {
            r.grp: (r.n, r.s)
            for r in snapshot_read(spark, src_spec)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("cents").cast("long").alias("s"))
            .collect()
        }

    def _mat(view_spec):
        return {
            r.grp: (r.n_rows, r.sum_cents)
            for r in snapshot_read(spark, view_spec).collect()
        }

    root = _tempfile.mkdtemp(prefix="snap_matview_")
    try:
        src = TableSpec("t.mvsrc", root + "/src")
        view = TableSpec("t.mview", root + "/view")
        cols = ("key", "cents", "grp")
        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums)
        equals = _mat(view) == _full(src)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        _, mode1 = refresh_agg_view(spark, src, view, keys, sums, row_key)
        append_path_ok = mode1 == "incremental-append"
        equals = equals and _mat(view) == _full(src)

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        _, mode2 = refresh_agg_view(spark, src, view, keys, sums, row_key)
        catchup_path_ok = mode2 == "incremental-append"
        equals = equals and _mat(view) == _full(src)

        snapshot_delete_where(spark, src, {"key": (None, 500)})
        snapshot_update_where(spark, src, {"key": (1000, 2000)},
                              {"cents": "cents + 777"})
        v3, mode3 = refresh_agg_view(spark, src, view, keys, sums, row_key)
        diff_path_ok = mode3 == "incremental-diff"
        equals = equals and _mat(view) == _full(src)

        v4, mode4 = refresh_agg_view(spark, src, view, keys, sums, row_key)
        noop_ok = (v4, mode4) == (v3, "noop")

        mat = snapshot_read(spark, view).agg(
            F.count(F.lit(1)).cast("long").alias("g"),
            F.sum("n_rows").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("c"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        [(
            int(mat["g"]), int(mat["n"]), int(mat["c"]),
            bool(append_path_ok), bool(catchup_path_ok),
            bool(diff_path_ok), bool(equals), bool(noop_ok),
        )],
        "n_groups long, total_rows long, total_cents long, "
        "append_path_ok boolean, catchup_path_ok boolean, "
        "diff_path_ok boolean, equals_full_ok boolean, noop_ok boolean",
    )


def _sql_matview_hll() -> str:
    from creatorops_lakehouse_spark.operators.hll import estimate_numerator

    num = estimate_numerator(7)
    return f"""
    WITH o AS (
        SELECT o_orderkey % 7 AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_custkey AS cust
        FROM orders
    ),
    h AS (
        SELECT grp,
               CAST('0x' || substr(md5(CAST(cust AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h60
        FROM o
    ),
    reg AS (
        SELECT grp, h60 % 128 AS bucket,
               MAX(CASE WHEN h60 // 128 = 0 THEN 54
                        ELSE 54 - length(bin(h60 // 128)) END) AS rho
        FROM h GROUP BY 1, 2
    ),
    s AS (
        -- integer shifts only (** is pow() -> DOUBLE in DuckDB and
        -- rounds past 53 mantissa bits); max sum 128 * 2^54 = 2^61
        SELECT grp,
               SUM(CAST(1 AS BIGINT) << (54 - rho))
                   + CAST((128 - COUNT(*)) AS BIGINT)
                     * (CAST(1 AS BIGINT) << 54) AS s54
        FROM reg GROUP BY 1
    ),
    est AS (
        SELECT grp,
               CAST(CAST('{num}' AS HUGEINT)
                    // (CAST(s54 AS HUGEINT) * 1000000) AS BIGINT) AS nd_cust
        FROM s
    ),
    base AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM o GROUP BY 1
    )
    SELECT b.grp, b.n_rows, b.sum_cents, e.nd_cust,
           TRUE AS append_path_ok, TRUE AS catchup_path_ok,
           TRUE AS regs_equal_full
    FROM base b JOIN est e USING (grp)
    """


@query("orders_matview_hll_verdict", oracle=_sql_matview_hll())
def orders_matview_hll_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) matview self-maintenance under one hash (VERDICT
    r10 item 2): the reason matviews classically can't increment is the
    distinct measure — this row pins the HLL answer. The view stores
    per-group (bucket, rho) register arrays (sources/matview.py
    ``hlls=``); the APPEND refresh path folds ONLY the new dirs'
    registers in by per-bucket MAX (O(new data) + O(groups · m), the
    mergeable-sketch property a 100 TB deployment ships sketches across
    partitions with), alongside the exact SUM/COUNT measures.

    Lifecycle: write band0 of orders → create view (grp = key%7;
    COUNT(*), SUM(cents), HLL(cust)) → append band1 → refresh (must be
    incremental-append) → append band2+band3 → one catch-up refresh →
    verdict. In-engine booleans: both refresh modes, plus
    regs_equal_full — the incrementally-folded registers equal a
    from-scratch sketch of the source head BUCKET FOR BUCKET (full-outer
    anti-comparison), which is strictly stronger than estimate equality.

    The oracle recomputes per-group n_rows, sum_cents, and the HLL
    estimate from raw ``orders`` in pure SQL (same md5 register
    construction, same exact-integer 88-bit-constant division as
    operators/hll.py — integer shifts, never pow()) and pins the
    booleans TRUE: a lost register, a double-folded append, or any
    estimate drift flips the hash at any SF. DML-between-refreshes is
    REFUSED for HLL views (registers are MAX-folded, not subtractable) —
    that contract is pytest-pinned (tests/test_matview.py::
    test_matview_hll_dml_refused), keeping this row append-only by
    construction. Eager verdict harness (excluded from bench); scratch
    tree deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.hll import hll_registers
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("o_custkey").alias("cust"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {"sum_cents": "cents"}, ["key"]
    hlls = {"nd_cust": "cust"}

    root = _tempfile.mkdtemp(prefix="snap_mv_hll_")
    try:
        src = TableSpec("t.mvhsrc", root + "/src")
        view = TableSpec("t.mvhview", root + "/view")
        cols = ("key", "cents", "cust", "grp")
        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, hlls=hlls)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        _, mode1 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hlls=hlls
        )
        append_path_ok = mode1 == "incremental-append"

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        _, mode2 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hlls=hlls
        )
        catchup_path_ok = mode2 == "incremental-append"

        mat = snapshot_read(spark, view)
        stored_long = mat.select(
            "grp", F.explode("nd_cust_regs").alias("_r")
        ).select(
            "grp",
            F.col("_r.bucket").alias("bucket"),
            F.col("_r.rho").alias("_rs"),
        )
        full_long = hll_registers(
            snapshot_read(spark, src), "cust", 7, ("grp",)
        ).withColumnRenamed("rho", "_rf")
        n_mismatch = (
            stored_long.join(full_long, on=["grp", "bucket"], how="full_outer")
            .filter(
                F.col("_rs").isNull()
                | F.col("_rf").isNull()
                | (F.col("_rs") != F.col("_rf"))
            )
            .count()
        )
        out = mat.select(
            "grp",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("nd_cust").cast("long").alias("nd_cust"),
            F.lit(bool(append_path_ok)).alias("append_path_ok"),
            F.lit(bool(catchup_path_ok)).alias("catchup_path_ok"),
            F.lit(n_mismatch == 0).alias("regs_equal_full"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, n_rows long, sum_cents long, nd_cust long, "
        "append_path_ok boolean, catchup_path_ok boolean, "
        "regs_equal_full boolean",
    )


@query(
    "orders_matview_cms_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey % 7 AS grp
        FROM orders
    ),
    fin AS (
        SELECT key, grp,
               CASE WHEN key BETWEEN 1000 AND 2000 THEN cents + 777
                    ELSE cents END AS cents
        FROM o WHERE key > 500
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           TRUE AS append_path_ok, TRUE AS diff_path_ok,
           TRUE AS catchup_path_ok, TRUE AS cms_equals_full,
           TRUE AS probe_overest_ok
    FROM fin GROUP BY grp
    """,
)
def orders_matview_cms_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Count-Min frequency sketches as matview measures,
    maintained through DML (sources/matview.py ``cmss=``) — the LINEAR
    complement to the HLL row: CMS cells add AND subtract, so the CDF
    fallback folds delete/update ±1 cells straight through the sketch
    where HLL must refuse. The pair pins the full sketch-measure story:
    HLL for COUNT(DISTINCT) (append-only, refusal-guarded), CMS for
    heavy-hitter frequency (every path).

    Lifecycle: write band0 → create view (grp = key%7; COUNT(*),
    SUM(cents), CMS(cust)) → append band1 → refresh (incremental-append:
    new cells ADD) → append band2+band3 → one catch-up refresh → then
    copy-on-write DELETE key ≤ 500 + UPDATE on key ∈ [1000, 2000] that
    moves BOTH a sum measure (cents += 777) and the sketched key
    (cust += 7) → refresh (incremental-diff: preimage cells decrement,
    postimage cells increment). In-engine booleans: all three
    refresh modes, cms_equals_full (stored cells == a from-scratch
    sketch of the head CELL FOR CELL — the linear-fold exactness), and
    probe_overest_ok (matview_cms_estimate never undercounts the exact
    per-(grp, cust) frequency — the classic CMS guarantee).

    The oracle recomputes per-group n_rows and sum_cents from raw
    ``orders`` with the DML replayed in SQL and pins the booleans TRUE —
    a lost cell, a double-folded delta, or a broken ± weight flips the
    hash at any SF. Eager verdict harness (excluded from bench);
    scratch tree deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        _cms_long,
        create_agg_view,
        matview_cms_estimate,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("o_custkey").alias("cust"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {"sum_cents": "cents"}, ["key"]
    cmss = {"f_cust": "cust"}

    root = _tempfile.mkdtemp(prefix="snap_mv_cms_")
    try:
        src = TableSpec("t.mvcsrc", root + "/src")
        view = TableSpec("t.mvcview", root + "/view")
        cols = ("key", "cents", "cust", "grp")
        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, cmss=cmss)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        _, mode1 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, cmss=cmss
        )
        append_path_ok = mode1 == "incremental-append"

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        _, mode3 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, cmss=cmss
        )
        catchup_path_ok = mode3 == "incremental-append"

        # DML last so the oracle can replay it over the whole table
        snapshot_delete_where(spark, src, {"key": (None, 500)})
        snapshot_update_where(
            spark, src, {"key": (1000, 2000)},
            {"cents": "cents + 777", "cust": "cust + 7"},
        )
        _, mode2 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, cmss=cmss
        )
        diff_path_ok = mode2 == "incremental-diff"

        mat = scoped_persist(snapshot_read(spark, view))
        head = scoped_persist(snapshot_read(spark, src))
        stored_long = mat.select(
            "grp", F.explode("f_cust_cms").alias("_c")
        ).select(
            "grp",
            F.col("_c.row_i").alias("row_i"),
            F.col("_c.bucket").alias("bucket"),
            F.col("_c.cnt").alias("_cs"),
        )
        full_long = _cms_long(head, ["grp"], "cust").withColumnRenamed(
            "cnt", "_cf"
        )
        n_mismatch = (
            stored_long.join(
                full_long, on=["grp", "row_i", "bucket"], how="full_outer"
            )
            .filter(~F.col("_cs").eqNullSafe(F.col("_cf")))
            .count()
        )
        exact = head.groupBy("grp", "cust").agg(
            F.count(F.lit(1)).cast("long").alias("_exact")
        )
        est = matview_cms_estimate(
            mat, "f_cust", ["grp"], exact.select("grp", "cust"), "cust"
        )
        n_under = (
            exact.join(est, on=["grp", "cust"])
            .filter(F.col("est") < F.col("_exact"))
            .count()
        )
        out = mat.select(
            "grp",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.lit(bool(append_path_ok)).alias("append_path_ok"),
            F.lit(bool(diff_path_ok)).alias("diff_path_ok"),
            F.lit(bool(catchup_path_ok)).alias("catchup_path_ok"),
            F.lit(n_mismatch == 0).alias("cms_equals_full"),
            F.lit(n_under == 0).alias("probe_overest_ok"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, n_rows long, sum_cents long, "
        "append_path_ok boolean, diff_path_ok boolean, "
        "catchup_path_ok boolean, cms_equals_full boolean, "
        "probe_overest_ok boolean",
    )


@query(
    "orders_matview_hist_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey % 7 AS grp
        FROM orders
    ),
    fin AS (
        SELECT key, grp,
               CASE WHEN key BETWEEN 1000 AND 2000 THEN cents + 777
                    ELSE cents END AS cents
        FROM o WHERE key > 500
    ),
    cells AS (
        SELECT grp, (cents % 10000) // 100 AS bin, COUNT(*) AS cnt
        FROM fin GROUP BY 1, 2
    ),
    cum AS (
        SELECT grp, bin,
               SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS c,
               SUM(cnt) OVER (PARTITION BY grp) AS t
        FROM cells
    ),
    q AS (
        SELECT grp,
               CAST(MIN(CASE WHEN c * 10000 >= 5000 * t THEN bin END)
                    AS INTEGER) AS p50_bin,
               CAST(MIN(CASE WHEN c * 10000 >= 9000 * t THEN bin END)
                    AS INTEGER) AS p90_bin,
               CAST(COUNT(*) AS BIGINT) AS n_bins
        FROM cum GROUP BY 1
    ),
    base AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM fin GROUP BY 1
    )
    SELECT base.grp, n_rows, sum_cents, q.p50_bin, q.p90_bin, q.n_bins,
           TRUE AS append_path_ok, TRUE AS diff_path_ok,
           TRUE AS hist_equals_full
    FROM base JOIN q USING (grp)
    """,
)
def orders_matview_hist_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group QUANTILE matview measures via equi-width histograms
    (sources/matview.py ``hists=``), maintained through DML — and unlike
    the CMS/HLL rows, the sketch VALUES themselves sit under the oracle
    hash: histogram bins are pure integer arithmetic (no hash function),
    so the oracle recomputes the per-group p50/p90 BIN and the non-zero
    bin count from raw ``orders`` (DML replayed in SQL) and they must
    match the view's incrementally-folded state EXACTLY.

    Lifecycle: band0 create (grp = key%7; measure = cents%10000 in 100
    bins of width 100) → append band1 → refresh (cells ADD) → append
    band2+3 → catch-up → copy-on-write DELETE key ≤ 500 + UPDATE
    cents += 777 on key ∈ [1000, 2000] (moves the binned value) →
    refresh (cells fold ±). hist_equals_full pins the stored bins
    cell-for-cell against a from-scratch build in-engine; p50_bin /
    p90_bin / n_bins are the cross-engine-checked outputs. The
    percentile-dashboard-under-DML story at 100 TB: refresh cost is the
    delta plus O(groups · nbins) cells, never a history re-scan, and a
    dashboard quantile is one tiny scan of the view."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        _hist_long,
        create_agg_view,
        matview_hist_quantile,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {"sum_cents": "cents"}, ["key"]
    SPEC = ("pct", 0, 10000, 100)
    hists = {"h_pct": SPEC}

    def with_pct(df):
        return df.withColumn("pct", F.col("cents") % 10000)

    root = _tempfile.mkdtemp(prefix="snap_mv_hist_")
    try:
        src = TableSpec("t.mvhsrc2", root + "/src")
        view = TableSpec("t.mvhview2", root + "/view")
        cols = ("key", "cents", "pct", "grp")

        snapshot_write(
            with_pct(banded.filter(F.col("band") == 0)).select(*cols), src
        )
        create_agg_view(spark, src, view, keys, sums, hists=hists)

        snapshot_write(
            with_pct(banded.filter(F.col("band") == 1)).select(*cols), src
        )
        _, mode1 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hists=hists
        )
        append_path_ok = mode1 == "incremental-append"

        snapshot_write(
            with_pct(banded.filter(F.col("band") == 2)).select(*cols), src
        )
        snapshot_write(
            with_pct(banded.filter(F.col("band") == 3)).select(*cols), src
        )
        refresh_agg_view(spark, src, view, keys, sums, row_key, hists=hists)

        # DML last so the oracle can replay it over the whole table;
        # the update moves BOTH the sum measure and the binned value
        snapshot_delete_where(spark, src, {"key": (None, 500)})
        snapshot_update_where(
            spark, src, {"key": (1000, 2000)},
            {"cents": "cents + 777", "pct": "(cents + 777) % 10000"},
        )
        _, mode2 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hists=hists
        )
        diff_path_ok = mode2 == "incremental-diff"

        mat = scoped_persist(snapshot_read(spark, view))
        head = scoped_persist(snapshot_read(spark, src))
        stored_long = mat.select(
            "grp", F.explode("h_pct_hist").alias("_c")
        ).select(
            "grp",
            F.col("_c.bin").alias("bin"),
            F.col("_c.cnt").alias("_cs"),
        )
        full_long = _hist_long(head, ["grp"], SPEC).withColumnRenamed(
            "cnt", "_cf"
        )
        n_mismatch = (
            stored_long.join(full_long, on=["grp", "bin"], how="full_outer")
            .filter(~F.col("_cs").eqNullSafe(F.col("_cf")))
            .count()
        )
        p50 = matview_hist_quantile(mat, "h_pct", ["grp"], 5000).withColumnRenamed(
            "q_bin", "p50_bin"
        )
        p90 = matview_hist_quantile(mat, "h_pct", ["grp"], 9000).withColumnRenamed(
            "q_bin", "p90_bin"
        )
        out = (
            mat.select(
                "grp",
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("sum_cents").cast("long").alias("sum_cents"),
                F.size("h_pct_hist").cast("long").alias("n_bins"),
            )
            .join(p50, "grp")
            .join(p90, "grp")
            .select(
                "grp", "n_rows", "sum_cents", "p50_bin", "p90_bin", "n_bins",
                F.lit(bool(append_path_ok)).alias("append_path_ok"),
                F.lit(bool(diff_path_ok)).alias("diff_path_ok"),
                F.lit(n_mismatch == 0).alias("hist_equals_full"),
            )
            .collect()
        )
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, n_rows long, sum_cents long, p50_bin int, p90_bin int, "
        "n_bins long, append_path_ok boolean, diff_path_ok boolean, "
        "hist_equals_full boolean",
    )


@query(
    "orders_matview_join_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_custkey AS cust
        FROM orders
    ),
    fin AS (
        SELECT key, cust,
               CASE WHEN key BETWEEN 1000 AND 2000 THEN cents + 777
                    ELSE cents END AS cents
        FROM o WHERE key > 500
    ),
    j AS (
        SELECT f.cents, CAST(c.c_nationkey AS BIGINT) AS nation
        FROM fin f LEFT JOIN customer c ON c.c_custkey = f.cust
    )
    SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           TRUE AS append_path_ok, TRUE AS diff_path_ok,
           TRUE AS equals_full_ok
    FROM j GROUP BY 1
    """,
)
def orders_matview_join_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMENSION-ENRICHED matview under one hash — the gold-layer
    fact⋈dim view shape (the reference's gold tables aggregate enriched
    facts; this is that workload maintained incrementally). The view's
    ``enrich`` hook broadcast-joins each orders row to its customer's
    nation BEFORE aggregation on every refresh path, so the maintained
    state is ``SELECT nation, COUNT(*), SUM(cents) FROM orders ⋈
    customer GROUP BY nation`` — refreshed in O(new data) on appends
    and through the ±1 CDF fold on DML, never by re-joining history.

    Lifecycle: band0 create → append band1 → refresh (append path; new
    rows enrich against the broadcast dim) → append band2+3 → catch-up
    → copy-on-write DELETE key ≤ 500 + UPDATE cents += 777 on
    key ∈ [1000, 2000] → refresh (diff path; pre/post images re-enrich
    under the static-dim contract). In-engine boolean equals_full_ok
    pins the view against a from-scratch enriched aggregate of the
    head; the oracle replays the DML AND the join in SQL for per-nation
    n_rows/sum_cents — a mis-enriched delta or double-folded span flips
    the hash at any SF. The enrich contract (row-local, static dim) is
    documented at sources/matview.py module docstring; the
    changing-dim-key DML case is pytest-pinned
    (test_matview_enriched_with_broadcast_dim)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("o_custkey").alias("cust"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    dim = scoped_persist(
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust"),
            F.col("c_nationkey").cast("long").alias("nation"),
        )
    )

    def enrich(df):
        return df.join(F.broadcast(dim), on="cust", how="left")

    keys, sums, row_key = ["nation"], {"sum_cents": "cents"}, ["key"]

    root = _tempfile.mkdtemp(prefix="snap_mv_join_")
    try:
        src = TableSpec("t.mvjsrc", root + "/src")
        view = TableSpec("t.mvjview", root + "/view")
        cols = ("key", "cents", "cust")

        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, enrich=enrich)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        _, mode1 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, enrich=enrich
        )
        append_path_ok = mode1 == "incremental-append"

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        refresh_agg_view(spark, src, view, keys, sums, row_key, enrich=enrich)

        snapshot_delete_where(spark, src, {"key": (None, 500)})
        snapshot_update_where(
            spark, src, {"key": (1000, 2000)}, {"cents": "cents + 777"}
        )
        _, mode2 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, enrich=enrich
        )
        diff_path_ok = mode2 == "incremental-diff"

        full = {
            r.nation: (r.n, r.s)
            for r in enrich(snapshot_read(spark, src))
            .groupBy("nation")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").cast("long").alias("s"),
            )
            .collect()
        }
        mat = snapshot_read(spark, view)
        got = {
            r.nation: (r.n_rows, r.sum_cents) for r in mat.collect()
        }
        out = mat.select(
            F.col("nation").cast("long").alias("nation"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.lit(bool(append_path_ok)).alias("append_path_ok"),
            F.lit(bool(diff_path_ok)).alias("diff_path_ok"),
            F.lit(got == full).alias("equals_full_ok"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "nation long, n_rows long, sum_cents long, "
        "append_path_ok boolean, diff_path_ok boolean, "
        "equals_full_ok boolean",
    )


@query(
    "orders_matview_minmax_verdict",
    oracle="""
    SELECT o_orderkey % 7 AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS max_cents,
           TRUE AS append_path_ok, TRUE AS catchup_path_ok,
           TRUE AS dml_refused_ok
    FROM orders GROUP BY 1
    """,
)
def orders_matview_minmax_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-ONLY MIN/MAX matview measures under one hash
    (sources/matview.py ``mins``/``maxs``): a new row can only TIGHTEN a
    group's extreme, so appends fold by least/greatest against the
    stored scalar — O(new data), never a rescan — while DML between
    refreshes is REFUSED loudly (a deleted extreme needs a group rescan;
    same contract class as HLL). This completes the measure taxonomy:
    exact ± (SUM/COUNT), append-only fold (MIN/MAX, HLL), linear ±
    sketches (CMS, histogram).

    Lifecycle: band0 create (grp = key%7; COUNT(*), MIN/MAX cents) →
    append band1 → refresh (append path) → append band2+3 → catch-up →
    then a copy-on-write DELETE and a refresh ATTEMPT that must raise
    (dml_refused_ok — caught in-engine; the view stays at its all-bands
    watermark, which is exactly what the oracle recomputes from raw
    ``orders``). Per-group n_rows/min_cents/max_cents are
    SQL-recomputed; the booleans pin the two modes and the refusal —
    a silently-folded delete or a lost extreme flips the hash at any
    SF. Eager verdict harness (excluded from bench); scratch tree
    deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {}, ["key"]
    mm = dict(mins={"min_cents": "cents"}, maxs={"max_cents": "cents"})

    root = _tempfile.mkdtemp(prefix="snap_mv_mm_")
    try:
        src = TableSpec("t.mvmsrc", root + "/src")
        view = TableSpec("t.mvmview", root + "/view")
        cols = ("key", "cents", "grp")

        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, **mm)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        _, mode1 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, **mm
        )
        append_path_ok = mode1 == "incremental-append"

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        _, mode2 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, **mm
        )
        catchup_path_ok = mode2 == "incremental-append"

        # DML then a refresh attempt: MUST refuse; the view stays at
        # the all-bands watermark (= raw orders, what the oracle sees)
        snapshot_delete_where(spark, src, {"key": (None, 500)})
        dml_refused = False
        try:
            refresh_agg_view(spark, src, view, keys, sums, row_key, **mm)
        except ValueError as e:
            dml_refused = "append-only" in str(e)

        out = snapshot_read(spark, view).select(
            "grp",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("min_cents").cast("long").alias("min_cents"),
            F.col("max_cents").cast("long").alias("max_cents"),
            F.lit(bool(append_path_ok)).alias("append_path_ok"),
            F.lit(bool(catchup_path_ok)).alias("catchup_path_ok"),
            F.lit(bool(dml_refused)).alias("dml_refused_ok"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, n_rows long, min_cents long, max_cents long, "
        "append_path_ok boolean, catchup_path_ok boolean, "
        "dml_refused_ok boolean",
    )


def _sql_matview_rescan() -> str:
    from creatorops_lakehouse_spark.operators.hll import estimate_numerator

    num = estimate_numerator(7)
    return f"""
    WITH o AS (
        SELECT o_orderkey AS key,
               o_orderkey % 7 AS grp,
               o_orderkey % 4 AS band,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_custkey AS cust
        FROM orders
    ),
    -- the delete hits bands 0+1 (already in the table) at key <= 1000;
    -- bands 2+3 are appended AFTER it, so their low keys survive
    surv AS (
        SELECT * FROM o WHERE NOT (band <= 1 AND key <= 1000)
    ),
    h AS (
        SELECT grp,
               CAST('0x' || substr(md5(CAST(cust AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h60
        FROM surv
    ),
    reg AS (
        SELECT grp, h60 % 128 AS bucket,
               MAX(CASE WHEN h60 // 128 = 0 THEN 54
                        ELSE 54 - length(bin(h60 // 128)) END) AS rho
        FROM h GROUP BY 1, 2
    ),
    s AS (
        SELECT grp,
               SUM(CAST(1 AS BIGINT) << (54 - rho))
                   + CAST((128 - COUNT(*)) AS BIGINT)
                     * (CAST(1 AS BIGINT) << 54) AS s54
        FROM reg GROUP BY 1
    ),
    est AS (
        SELECT grp,
               CAST(CAST('{num}' AS HUGEINT)
                    // (CAST(s54 AS HUGEINT) * 1000000) AS BIGINT) AS nd_cust
        FROM s
    ),
    base AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(MIN(key) AS BIGINT) AS min_key,
               CAST(MAX(key) AS BIGINT) AS max_key
        FROM surv GROUP BY 1
    )
    SELECT b.grp, b.n_rows, b.sum_cents, e.nd_cust, b.min_key, b.max_key,
           TRUE AS rescan_path_ok, TRUE AS postdml_append_ok,
           TRUE AS regs_equal_full, TRUE AS mins_loosened_ok
    FROM base b JOIN est e USING (grp)
    """


@query("orders_matview_rescan_verdict", oracle=_sql_matview_rescan())
def orders_matview_rescan_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical DML repair of APPEND-ONLY matview measures under one hash
    (VERDICT r11 item 2, sources/matview.py ``on_dml='rescan_groups'``):
    HLL registers and MIN/MAX extremes are not subtractable, so a delete
    classically forces recreate — this row pins the upgrade where the
    CDF's distinct group keys pick the affected groups, ONLY their head
    rows are rescanned (IN-list pushdown under 1000 keys, semi-join
    above — O(touched groups' rows), never a re-aggregation), and the
    re-sketched registers/extremes splice next to the untouched groups'
    stored state.

    Lifecycle: band0 create (grp = key%7; COUNT(*), SUM(cents),
    HLL(cust), MIN/MAX(key)) → append band1 → refresh (append path) →
    copy-on-write DELETE of key <= 1000 → refresh with
    on_dml='rescan_groups' (must take 'incremental-diff-rescan') →
    append band2+3 → catch-up refresh (must take the append fast path
    again). In-engine booleans: the two modes, regs_equal_full (the
    repaired registers equal a from-scratch sketch of the final head
    BUCKET FOR BUCKET, full-outer anti-comparison), and
    mins_loosened_ok — after the repair EVERY group's min_key rose
    above its pre-delete value (TPC-H orderkeys 1..8 mod 32 guarantee
    every grp×band cell has keys below 1000, so the delete removes
    every group's minimum; a fold could never raise a stored MIN, only
    the rescan can). The oracle recomputes the final per-group state
    from raw ``orders`` with the delete's exact predicate — bands 0+1
    lose key <= 1000, the later-appended bands 2+3 keep theirs — so a
    double-folded CDF, a stale register, or an unloosened extreme flips
    the hash at any SF. Eager verdict harness (excluded from bench);
    scratch tree deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.hll import hll_registers
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("o_custkey").alias("cust"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {"sum_cents": "cents"}, ["key"]
    hlls = {"nd_cust": "cust"}
    mm = dict(mins={"min_key": "key"}, maxs={"max_key": "key"})

    root = _tempfile.mkdtemp(prefix="snap_mv_rescan_")
    try:
        src = TableSpec("t.mvrsrc", root + "/src")
        view = TableSpec("t.mvrview", root + "/view")
        cols = ("key", "cents", "cust", "grp")

        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, hlls=hlls, **mm)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        refresh_agg_view(
            spark, src, view, keys, sums, row_key, hlls=hlls, **mm
        )
        pre_min = {
            r.grp: r.min_key for r in snapshot_read(spark, view).collect()
        }

        snapshot_delete_where(spark, src, {"key": (None, 1000)})
        _, mode_r = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hlls=hlls,
            on_dml="rescan_groups", **mm
        )
        rescan_path_ok = mode_r == "incremental-diff-rescan"
        post = {
            r.grp: r.min_key for r in snapshot_read(spark, view).collect()
        }
        mins_loosened = bool(post) and all(
            post[g] > pre_min[g] for g in post
        )

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        _, mode_a = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hlls=hlls, **mm
        )
        postdml_append_ok = mode_a == "incremental-append"

        mat = snapshot_read(spark, view)
        stored_long = mat.select(
            "grp", F.explode("nd_cust_regs").alias("_r")
        ).select(
            "grp",
            F.col("_r.bucket").alias("bucket"),
            F.col("_r.rho").alias("_rs"),
        )
        full_long = hll_registers(
            snapshot_read(spark, src), "cust", 7, ("grp",)
        ).withColumnRenamed("rho", "_rf")
        n_mismatch = (
            stored_long.join(full_long, on=["grp", "bucket"], how="full_outer")
            .filter(
                F.col("_rs").isNull()
                | F.col("_rf").isNull()
                | (F.col("_rs") != F.col("_rf"))
            )
            .count()
        )
        out = mat.select(
            "grp",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("nd_cust").cast("long").alias("nd_cust"),
            F.col("min_key").cast("long").alias("min_key"),
            F.col("max_key").cast("long").alias("max_key"),
            F.lit(bool(rescan_path_ok)).alias("rescan_path_ok"),
            F.lit(bool(postdml_append_ok)).alias("postdml_append_ok"),
            F.lit(n_mismatch == 0).alias("regs_equal_full"),
            F.lit(bool(mins_loosened)).alias("mins_loosened_ok"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, n_rows long, sum_cents long, nd_cust long, "
        "min_key long, max_key long, rescan_path_ok boolean, "
        "postdml_append_ok boolean, regs_equal_full boolean, "
        "mins_loosened_ok boolean",
    )


@query(
    "orders_matview_cascade_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               o_orderkey % 21 AS grp21,
               o_orderkey % 7 AS grp7,
               o_orderkey % 4 AS band,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    -- the delete hits bands 0+1 at key <= 1000; bands 2+3 are appended
    -- after it, so their low keys survive (same shape as the rescan row)
    surv AS (
        SELECT * FROM o WHERE NOT (band <= 1 AND key <= 1000)
    )
    SELECT grp7,
           CAST(COUNT(DISTINCT grp21) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS silver_rows,
           TRUE AS silver_append_ok, TRUE AS gold_diff_ok,
           TRUE AS dml_diff_ok, TRUE AS chain_noop_ok
    FROM surv GROUP BY 1
    """,
)
def orders_matview_cascade_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matview CASCADE — a gold view whose SOURCE is the silver view
    (VERDICT r11 item 5, sources/matview.py ``refresh_cascade``) — under
    one hash. The medallion's serving shape: silver aggregates the fact
    table (grp21 = key%21; SUM cents), gold rolls silver up to grp7 =
    grp21%7 with an enrich hook deriving the coarse key, and the child's
    watermark chains on the PARENT's version. Parent refreshes commit as
    overwrites, so the child folds the parent's key-level CDF —
    O(changed parent groups) = O(changed silver groups), never a fact
    scan; ``snapshot_diff`` emits nothing for silver groups that
    rewrote verbatim.

    Lifecycle: band0 → create silver+gold → append band1 → cascade
    (silver must take 'incremental-append', gold 'incremental-diff') →
    copy-on-write DELETE of key <= 1000 → cascade (both levels
    'incremental-diff') → append bands 2+3 → cascade → a final cascade
    that must all-noop (the chain is settled). Gold's measures:
    COUNT(*) of silver rows = surviving distinct grp21 per grp7
    (n_rows), SUM of silver sums = SUM(cents) (sum_cents), and SUM of
    silver n_rows = surviving fact rows per grp7 (silver_rows) — three
    numbers the oracle recomputes straight off raw ``orders`` with the
    delete's exact predicate, because grp21 % 7 == key % 7 (21 is a
    multiple of 7). A double-folded parent CDF, a missed group death,
    or a stale child watermark flips the hash at any SF. The
    parent/child refresher RACE is pytest-pinned
    (tests/test_matview.py::test_matview_cascade_racing_refreshers) —
    every commit in the chain carries the same expected_version CAS.
    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_cascade,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderkey") % 21).alias("grp21"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    g_enrich = lambda df: df.withColumn(  # noqa: E731
        "grp7", F.col("grp21") % 7
    )

    root = _tempfile.mkdtemp(prefix="snap_mv_cascade_")
    try:
        src = TableSpec("t.mvcsrc", root + "/src")
        silver = TableSpec("t.mvcsilver", root + "/silver")
        gold = TableSpec("t.mvcgold", root + "/gold")
        cols = ("key", "cents", "grp21")
        S = dict(src=src, view=silver, keys=["grp21"],
                 sums={"sum_cents": "cents"}, row_key=["key"])
        G = dict(src=silver, view=gold, keys=["grp7"],
                 sums={"sum_cents": "sum_cents", "silver_rows": "n_rows"},
                 row_key=["grp21"], enrich=g_enrich)

        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, silver, S["keys"], S["sums"])
        create_agg_view(spark, silver, gold, G["keys"], G["sums"],
                        enrich=g_enrich)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        modes1 = refresh_cascade(spark, [S, G])
        silver_append_ok = modes1[0][1] == "incremental-append"
        gold_diff_ok = modes1[1][1] == "incremental-diff"

        snapshot_delete_where(spark, src, {"key": (None, 1000)})
        modes2 = refresh_cascade(spark, [S, G])
        dml_diff_ok = [m for _, m in modes2] == [
            "incremental-diff", "incremental-diff",
        ]

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        refresh_cascade(spark, [S, G])
        modes3 = refresh_cascade(spark, [S, G])
        chain_noop_ok = [m for _, m in modes3] == ["noop", "noop"]

        out = snapshot_read(spark, gold).select(
            "grp7",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("silver_rows").cast("long").alias("silver_rows"),
            F.lit(bool(silver_append_ok)).alias("silver_append_ok"),
            F.lit(bool(gold_diff_ok)).alias("gold_diff_ok"),
            F.lit(bool(dml_diff_ok)).alias("dml_diff_ok"),
            F.lit(bool(chain_noop_ok)).alias("chain_noop_ok"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp7 long, n_rows long, sum_cents long, silver_rows long, "
        "silver_append_ok boolean, gold_diff_ok boolean, "
        "dml_diff_ok boolean, chain_noop_ok boolean",
    )


@query(
    "orders_matview_var_verdict",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS key,
               o_orderkey % 7 AS grp,
               o_orderkey % 4 AS band,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    surv AS (
        SELECT * FROM o WHERE NOT (band <= 1 AND key <= 1000)
    ),
    agg AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               SUM(CAST(cents AS HUGEINT) * cents) AS s2
        FROM surv GROUP BY 1
    )
    SELECT grp, n_rows, sum_cents,
           CAST(s2 AS VARCHAR) AS sq_cents,
           CAST(CAST(n_rows AS HUGEINT) * s2
                - CAST(sum_cents AS HUGEINT) * sum_cents AS VARCHAR)
               AS var_num,
           TRUE AS append_ok, TRUE AS dml_diff_ok
    FROM agg
    """,
)
def orders_matview_var_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE-class matview measures under one hash
    (sources/matview.py ``sqsums``): exact per-group sums of squares,
    DECIMAL(38,0) with the square computed through DECIMAL(19,0) (a
    cents column squares past 2^63 — the long path would silently
    wrap). x² is linear in row multiplicity exactly like x, so the
    measure folds through the append fast path AND the ±1 CDF fallback
    — no append-only refusal — and (n, Σx, Σx²) derive the exact
    population-variance numerator n·Σx² − (Σx)², emitted here as an
    arbitrary-precision string so Spark DECIMAL and DuckDB HUGEINT hash
    identically.

    Lifecycle: band0 create (grp = key%7; COUNT(*), SUM(cents),
    SQSUM(cents)) → append band1 → refresh (must take
    incremental-append) → copy-on-write DELETE of key <= 1000 → refresh
    (must take incremental-diff: deleted rows' squares subtract
    exactly) → append bands 2+3 → catch-up. The oracle recomputes the
    final (n, s1, s2, variance numerator) from raw ``orders`` with the
    delete's exact predicate in HUGEINT arithmetic — a wrapped square,
    a double-folded delete, or a drifted merge flips the hash at any
    SF. Eager verdict harness (excluded from bench); scratch tree
    deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    banded = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_orderkey") % 4).alias("band"),
        )
    )
    keys, sums, row_key = ["grp"], {"sum_cents": "cents"}, ["key"]
    sqs = {"sq_cents": "cents"}

    root = _tempfile.mkdtemp(prefix="snap_mv_var_")
    try:
        src = TableSpec("t.mvvsrc", root + "/src")
        view = TableSpec("t.mvvview", root + "/view")
        cols = ("key", "cents", "grp")

        snapshot_write(banded.filter(F.col("band") == 0).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, sqsums=sqs)

        snapshot_write(banded.filter(F.col("band") == 1).select(*cols), src)
        _, mode1 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, sqsums=sqs
        )
        append_ok = mode1 == "incremental-append"

        snapshot_delete_where(spark, src, {"key": (None, 1000)})
        _, mode2 = refresh_agg_view(
            spark, src, view, keys, sums, row_key, sqsums=sqs
        )
        dml_diff_ok = mode2 == "incremental-diff"

        snapshot_write(banded.filter(F.col("band") == 2).select(*cols), src)
        snapshot_write(banded.filter(F.col("band") == 3).select(*cols), src)
        refresh_agg_view(spark, src, view, keys, sums, row_key, sqsums=sqs)

        out = snapshot_read(spark, view).select(
            "grp",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("sq_cents").cast("string").alias("sq_cents"),
            (
                F.col("n_rows").cast("decimal(20,0)") * F.col("sq_cents")
                - F.col("sum_cents").cast("decimal(19,0)")
                * F.col("sum_cents").cast("decimal(19,0)")
            ).cast("decimal(38,0)").cast("string").alias("var_num"),
            F.lit(bool(append_ok)).alias("append_ok"),
            F.lit(bool(dml_diff_ok)).alias("dml_diff_ok"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, n_rows long, sum_cents long, sq_cents string, "
        "var_num string, append_ok boolean, dml_diff_ok boolean",
    )


_SQL_CDF_SIDECAR = """
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey % 3 AS band
        FROM orders
    ),
    b01 AS (SELECT key, cents FROM o WHERE band <= 1),
    b2  AS (SELECT key, cents FROM o WHERE band = 2)
    SELECT key, cents, change_type,
           TRUE AS sidecar_used, TRUE AS feeds_equal
    FROM (
        SELECT key, cents, 'insert' AS change_type FROM b2
        UNION ALL
        SELECT key, cents, 'delete' FROM b01
        WHERE key BETWEEN 1200 AND 1800 OR key BETWEEN 1050 AND 1150
        UNION ALL
        SELECT key, cents, 'update_preimage' FROM b01 WHERE key <= 1000
        UNION ALL
        SELECT key, cents + 11, 'update_postimage' FROM b01 WHERE key <= 1000
    )
    """


@query("orders_cdf_sidecar_verdict", oracle=_SQL_CDF_SIDECAR)
def orders_cdf_sidecar_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-AT-WRITE under one hash (VERDICT r12 item 1,
    sources/snapshots.py::_write_cdf_sidecar / _sidecar_span_diff): every
    DML rewrite persists its removed/added rows as a per-commit change
    sidecar — Delta's change-data files — and ``snapshot_diff`` assembles
    a span's four-type feed from sidecars + appended dirs in O(changed
    rows), with NO endpoint-version reads (pre-r13 every DML-touched
    span paid an O(2×table) anti-join recompute; matview diff folds,
    rescan repairs, and cascade stages all inherited it).

    Lifecycle on an orders-derived snapshot table (row key = orderkey):
    write band0 (key%3=0) → append band1 → v_from; then UPDATE
    (key<=1000: cents+=11) → copy-on-write DELETE (1200<=key<=1800) →
    merge-on-read DV DELETE (1050<=key<=1150) → append band2 → head.
    The emitted feed is ``snapshot_diff(v_from, head,
    detect_updates=True)``; in-engine booleans pin that the sidecar fast
    path actually answered (``_sidecar_span_diff`` is not None — every
    commit in the span is covered) and that it equals the anti-join
    recompute row-for-row (exceptAll both ways). The oracle derives the
    exact expected feed from raw ``orders`` and the DML predicates:
    update pre/post images for every band0/1 key <= 1000, deletes for
    both delete bands, inserts for band2 — a missed sidecar, a
    mis-netted row, or a wrong image flips the hash at any SF. Eager
    verdict harness (excluded from bench); scratch tree deleted."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.sources.snapshots import (
        _sidecar_span_diff,
        current_version,
        snapshot_delete_where,
        snapshot_diff,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    rows = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("o_orderkey") % 3).alias("band"),
    )
    root = _tempfile.mkdtemp(prefix="snap_cdf_side_")
    try:
        spec = TableSpec("t.cdfsrc", root + "/t")
        cols = ("key", "cents")
        snapshot_write(rows.filter(F.col("band") == 0).select(*cols), spec)
        snapshot_write(rows.filter(F.col("band") == 1).select(*cols), spec)
        v_from = current_version(spec)
        snapshot_update_where(
            spark, spec, {"key": (None, 1000)}, {"cents": "cents + 11"}
        )
        snapshot_delete_where(spark, spec, {"key": (1200, 1800)})
        snapshot_delete_where(spark, spec, {"key": (1050, 1150)}, rewrite=False)
        snapshot_write(rows.filter(F.col("band") == 2).select(*cols), spec)
        v_to = current_version(spec)

        fast = _sidecar_span_diff(spark, spec, v_from, v_to, ["key"], True)
        sidecar_used = fast is not None
        slow = snapshot_diff(
            spark, spec, v_from, v_to, ["key"],
            detect_updates=True, use_sidecars=False,
        )
        feeds_equal = (
            sidecar_used
            and fast.exceptAll(slow).count() == 0
            and slow.exceptAll(fast).count() == 0
        )
        feed = fast if sidecar_used else slow
        out = feed.select(
            F.col("key").cast("long").alias("key"),
            F.col("cents").cast("long").alias("cents"),
            F.col("_change_type").alias("change_type"),
            F.lit(bool(sidecar_used)).alias("sidecar_used"),
            F.lit(bool(feeds_equal)).alias("feeds_equal"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "key long, cents long, change_type string, "
        "sidecar_used boolean, feeds_equal boolean",
    )


def _sql_matview_rescan2() -> str:
    from creatorops_lakehouse_spark.operators.hll import estimate_numerator

    num = estimate_numerator(7)
    return f"""
    WITH o AS (
        SELECT o_orderkey AS key,
               o_orderkey % 7 AS grp,
               o_custkey % 3 AS sub,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_custkey AS cust
        FROM orders
    ),
    surv AS (
        SELECT * FROM o WHERE NOT (grp = 2 AND key <= 2000)
    ),
    h AS (
        SELECT grp, sub,
               CAST('0x' || substr(md5(CAST(cust AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h60
        FROM surv
    ),
    reg AS (
        SELECT grp, sub, h60 % 128 AS bucket,
               MAX(CASE WHEN h60 // 128 = 0 THEN 54
                        ELSE 54 - length(bin(h60 // 128)) END) AS rho
        FROM h GROUP BY 1, 2, 3
    ),
    s AS (
        SELECT grp, sub,
               SUM(CAST(1 AS BIGINT) << (54 - rho))
                   + CAST((128 - COUNT(*)) AS BIGINT)
                     * (CAST(1 AS BIGINT) << 54) AS s54
        FROM reg GROUP BY 1, 2
    ),
    est AS (
        SELECT grp, sub,
               CAST(CAST('{num}' AS HUGEINT)
                    // (CAST(s54 AS HUGEINT) * 1000000) AS BIGINT) AS nd_cust
        FROM s
    ),
    base AS (
        SELECT grp, sub, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(MIN(key) AS BIGINT) AS min_key,
               CAST(MAX(key) AS BIGINT) AS max_key
        FROM surv GROUP BY 1, 2
    )
    SELECT b.grp, b.sub, b.n_rows, b.sum_cents, e.nd_cust,
           b.min_key, b.max_key,
           TRUE AS rescan_path_ok, TRUE AS pruned_ok,
           TRUE AS regs_equal_full
    FROM base b JOIN est e USING (grp, sub)
    """


@query("orders_matview_rescan2_verdict", oracle=_sql_matview_rescan2())
def orders_matview_rescan2_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPOSITE-KEY rescan repair with a PRUNED read under one hash
    (VERDICT r12 item 3, sources/matview.py): pre-r13 the IN-set pruned
    head read fired only for single-column group keys — any gold view on
    the reference's real multi-key KPI grain (kpis_local.py:40-45) paid
    a full head scan per repair. Now the refresh picks the MOST-PRUNING
    physical key column (measured as planned commit dirs via the
    manifest-stats probe, metadata-only) for the IN-set read and keeps
    the exact multi-key null-safe semi-join as the residual.

    Lifecycle: orders split into SEVEN per-grp commits (grp = key%7 — a
    grp-clustered layout, so grp stats prune; sub = custkey%3 spans
    every commit, the deliberately-wrong prune choice) → create the
    (grp, sub) view with COUNT/SUM/HLL(cust)/MIN/MAX(key) → DELETE
    grp=2 ∧ key<=2000 → refresh with on_dml='rescan_groups'. In-engine
    booleans: the rescan mode fired; ``pruned_ok`` — the grp∈{{2}}
    metadata probe plans a STRICT subset of the head's dirs (the prune
    was available, so the repair read ∝ the touched band); and
    ``regs_equal_full`` — repaired registers equal a from-scratch
    sketch of the head bucket-for-bucket on the composite grain. The
    oracle recomputes every (grp, sub) cell's state from raw orders
    minus the delete predicate, HLL via the md5 register replay — a
    wrong affected-set, an unpruned-but-wrong read, or a stale spliced
    register flips the hash at any SF. Eager verdict harness (excluded
    from bench); scratch tree deleted."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.hll import hll_registers
    from creatorops_lakehouse_spark.sources.matview import (
        create_agg_view,
        refresh_agg_view,
    )
    from creatorops_lakehouse_spark.sources.snapshots import (
        _read_manifest,
        current_version,
        pruned_dirs,
        snapshot_delete_where,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    rows = scoped_persist(
        load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.col("o_custkey").alias("cust"),
            (F.col("o_orderkey") % 7).alias("grp"),
            (F.col("o_custkey") % 3).alias("sub"),
        )
    )
    keys, sums, row_key = ["grp", "sub"], {"sum_cents": "cents"}, ["key"]
    hlls = {"nd_cust": "cust"}
    mm = dict(mins={"min_key": "key"}, maxs={"max_key": "key"})

    root = _tempfile.mkdtemp(prefix="snap_mv_rescan2_")
    try:
        src = TableSpec("t.mvr2src", root + "/src")
        view = TableSpec("t.mvr2view", root + "/view")
        cols = ("key", "cents", "cust", "grp", "sub")
        for g in range(7):  # grp-clustered commits: grp stats prune
            snapshot_write(rows.filter(F.col("grp") == g).select(*cols), src)
        create_agg_view(spark, src, view, keys, sums, hlls=hlls, **mm)

        snapshot_delete_where(
            spark, src, {"grp": (2, 2), "key": (None, 2000)}
        )
        _, mode_r = refresh_agg_view(
            spark, src, view, keys, sums, row_key, hlls=hlls,
            on_dml="rescan_groups", **mm
        )
        rescan_path_ok = mode_r == "incremental-diff-rescan"

        head_v = current_version(src)
        kept, _ = pruned_dirs(src, {}, head_v, eq_in={"grp": [2]})
        total = len(_read_manifest(src, head_v)["dirs"])
        pruned_ok = len(kept) < total

        mat = snapshot_read(spark, view)
        stored_long = mat.select(
            "grp", "sub", F.explode("nd_cust_regs").alias("_r")
        ).select(
            "grp", "sub",
            F.col("_r.bucket").alias("bucket"),
            F.col("_r.rho").alias("_rs"),
        )
        full_long = hll_registers(
            snapshot_read(spark, src), "cust", 7, ("grp", "sub")
        ).withColumnRenamed("rho", "_rf")
        n_mismatch = (
            stored_long.join(
                full_long, on=["grp", "sub", "bucket"], how="full_outer"
            )
            .filter(
                F.col("_rs").isNull()
                | F.col("_rf").isNull()
                | (F.col("_rs") != F.col("_rf"))
            )
            .count()
        )
        out = mat.select(
            "grp", "sub",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
            F.col("nd_cust").cast("long").alias("nd_cust"),
            F.col("min_key").cast("long").alias("min_key"),
            F.col("max_key").cast("long").alias("max_key"),
            F.lit(bool(rescan_path_ok)).alias("rescan_path_ok"),
            F.lit(bool(pruned_ok)).alias("pruned_ok"),
            F.lit(n_mismatch == 0).alias("regs_equal_full"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "grp long, sub long, n_rows long, sum_cents long, nd_cust long, "
        "min_key long, max_key long, rescan_path_ok boolean, "
        "pruned_ok boolean, regs_equal_full boolean",
    )


_SQL_TABLE_CHANGES = """
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey % 3 AS band
        FROM orders
    ),
    b01 AS (SELECT key, cents FROM o WHERE band <= 1),
    b2  AS (SELECT key, cents FROM o WHERE band = 2)
    SELECT key, cents, change_type, commit_version,
           TRUE AS feed_is_rowlevel
    FROM (
        SELECT key, cents, 'delete' AS change_type,
               CAST(2 AS BIGINT) AS commit_version
        FROM b01 WHERE key <= 1000
        UNION ALL
        SELECT key, cents + 11, 'insert', 2 FROM b01 WHERE key <= 1000
        UNION ALL
        SELECT key, cents, 'delete', 3 FROM b01
        WHERE key BETWEEN 1200 AND 1800
        UNION ALL
        SELECT key, cents, 'delete', 4 FROM b01
        WHERE key BETWEEN 1050 AND 1150
        UNION ALL
        SELECT key, cents, 'insert', 5 FROM b2
    )
    """


@query("orders_table_changes_verdict", oracle=_SQL_TABLE_CHANGES)
def orders_table_changes_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta ``table_changes`` parity under one hash
    (sources/snapshots.py::snapshot_changes): the PER-COMMIT change
    feed, each row stamped with ``_commit_version``, read VERBATIM from
    the CDF-at-write sidecars with no version-pair recompute and no key
    semantics — the shape CDC consumers page through. Same lifecycle as
    ``orders_cdf_sidecar_verdict`` (append band0/1 → UPDATE key<=1000 →
    COW DELETE 1200..1800 → DV DELETE 1050..1150 → append band2), but
    the emission is the keyless row-level feed: an UPDATE surfaces as
    its commit's verbatim pre-image 'delete' + post-image 'insert'
    rows (Delta's change-data-file content), appends as 'insert' rows
    from the appended dirs, with content-noop commits contributing
    nothing. The oracle enumerates each commit's expected rows with its
    exact version number — a row attributed to the wrong commit, a
    missed sidecar, or a leaked noop commit flips the hash at any SF.
    Eager verdict harness (excluded from bench); scratch tree
    deleted."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.sources.snapshots import (
        current_version,
        snapshot_changes,
        snapshot_delete_where,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    rows = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("o_orderkey") % 3).alias("band"),
    )
    root = _tempfile.mkdtemp(prefix="snap_tchanges_")
    try:
        spec = TableSpec("t.tchsrc", root + "/t")
        cols = ("key", "cents")
        snapshot_write(rows.filter(F.col("band") == 0).select(*cols), spec)
        snapshot_write(rows.filter(F.col("band") == 1).select(*cols), spec)
        v_from = current_version(spec)
        snapshot_update_where(
            spark, spec, {"key": (None, 1000)}, {"cents": "cents + 11"}
        )
        snapshot_delete_where(spark, spec, {"key": (1200, 1800)})
        snapshot_delete_where(spark, spec, {"key": (1050, 1150)}, rewrite=False)
        snapshot_write(rows.filter(F.col("band") == 2).select(*cols), spec)

        out = snapshot_changes(spark, spec, v_from).select(
            F.col("key").cast("long").alias("key"),
            F.col("cents").cast("long").alias("cents"),
            F.col("_change_type").alias("change_type"),
            F.col("_commit_version").alias("commit_version"),
            F.lit(True).alias("feed_is_rowlevel"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "key long, cents long, change_type string, commit_version long, "
        "feed_is_rowlevel boolean",
    )


_SQL_CDC_CONSUMER = """
    WITH o AS (
        SELECT o_orderkey AS key,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
               o_orderkey % 3 AS band
        FROM orders
    ),
    b0 AS (SELECT key, cents FROM o WHERE band = 0),
    b1 AS (SELECT key, cents FROM o WHERE band = 1)
    SELECT key, cents, change_type, commit_version,
           TRUE AS caught_up_noop, TRUE AS replay_noop
    FROM (
        -- initial snapshot: the head (band0) as inserts at v0
        SELECT key, cents, 'insert' AS change_type,
               CAST(0 AS BIGINT) AS commit_version
        FROM b0
        UNION ALL
        -- v1 append of band1
        SELECT key, cents, 'insert', 1 FROM b1
        UNION ALL
        -- v2 update of key <= 1000 across both bands (pre/post images)
        SELECT key, cents, 'delete', 2
        FROM o WHERE band <= 1 AND key <= 1000
        UNION ALL
        SELECT key, cents + 11, 'insert', 2
        FROM o WHERE band <= 1 AND key <= 1000
        UNION ALL
        -- v3 copy-on-write delete of 1200..1800 (cents untouched there)
        SELECT key, cents, 'delete', 3
        FROM o WHERE band <= 1 AND key BETWEEN 1200 AND 1800
    )
    """


@query("orders_cdc_consumer_verdict", oracle=_SQL_CDC_CONSUMER)
def orders_cdc_consumer_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once PULL-BASED CDC under one hash
    (sources/snapshots.py::consume_changes): a consumer drains the
    source's per-commit change feed into a SINK audit table, with the
    watermark carried by the sink's own txn map — processed rows and
    the watermark land in one commit, so redelivery no-ops and two
    incremental drains compose to exactly the full span's feed.

    Lifecycle: write band0 → consume (initial snapshot: head rows as
    'insert' at v0) → append band1 AND update key<=1000 (cents+=11) →
    consume (drains v1's appended rows + v2's verbatim pre/post sidecar
    rows in ONE call) → copy-on-write DELETE 1200..1800 → consume →
    final sink content hashed. In-engine booleans: ``caught_up_noop``
    (a fourth consume returns None — watermark == head) and
    ``replay_noop`` (the sink row count is unchanged by it). The oracle
    enumerates every expected audit row with its exact commit version
    from raw orders — a dropped span, a double-drained commit, or a
    watermark that advanced without its rows flips the hash at any SF.
    Eager verdict harness (excluded from bench); scratch tree
    deleted."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.sources.snapshots import (
        consume_changes,
        snapshot_delete_where,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    rows = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("o_orderkey") % 3).alias("band"),
    )
    root = _tempfile.mkdtemp(prefix="snap_cdc_cons_")
    try:
        src = TableSpec("t.cdcsrc", root + "/src")
        sink = TableSpec("t.cdcsink", root + "/sink")
        cols = ("key", "cents")

        def audit(feed):
            return feed.select(
                "key", "cents",
                F.col("_change_type").alias("change_type"),
                F.col("_commit_version").alias("commit_version"),
            )

        snapshot_write(rows.filter(F.col("band") == 0).select(*cols), src)
        assert consume_changes(spark, src, sink, audit) == (-1, 0)
        snapshot_write(rows.filter(F.col("band") == 1).select(*cols), src)
        snapshot_update_where(
            spark, src, {"key": (None, 1000)}, {"cents": "cents + 11"}
        )
        assert consume_changes(spark, src, sink, audit) == (0, 2)
        snapshot_delete_where(spark, src, {"key": (1200, 1800)})
        assert consume_changes(spark, src, sink, audit) == (2, 3)

        n_before = snapshot_read(spark, sink).count()
        caught_up_noop = consume_changes(spark, src, sink, audit) is None
        replay_noop = snapshot_read(spark, sink).count() == n_before

        out = snapshot_read(spark, sink).select(
            F.col("key").cast("long").alias("key"),
            F.col("cents").cast("long").alias("cents"),
            "change_type",
            F.col("commit_version").cast("long").alias("commit_version"),
            F.lit(bool(caught_up_noop)).alias("caught_up_noop"),
            F.lit(bool(replay_noop)).alias("replay_noop"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)

    return spark.createDataFrame(
        out,
        "key long, cents long, change_type string, commit_version long, "
        "caught_up_noop boolean, replay_noop boolean",
    )
