"""Event-log queries over the driver ``events`` table.

These realize the reference's silver/gold query semantics (SURVEY.md §2) over
the driver's generic event stream (event_id, ts, user_id, event_type, value,
props-json): contract-style JSON extraction, daily KPI aggregation,
engagement/dropoff full-outer join, lead()-window sessionization, and
row_number dedup — the same operator classes as
pipelines/gold/kpis_local.py:36-83, retention_local.py:40-109 and
bottlenecks_local.py:23-74 in the reference.

Oracle-parity rule: every floating output is derived from an EXACT integer
intermediate (decimal-cents sums, microsecond sums, counts) and any final
rounding happens in integer arithmetic via exact_avg_expr/exact_avg_sql —
double summation order and round-tie behavior differ between Spark and
DuckDB otherwise (see queries/__init__.py).

Scale notes: every aggregation here is a single hash-shuffle on its group
keys with map-side partial aggregation; the window queries shuffle once on
the partition key (user_id) and sort within partitions — at 100 TB both are
embarrassingly parallel provided user_id/event-date keys are not
pathologically skewed (AQE handles moderate skew; deliberate salting lives in
operators/skew.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from creatorops_lakehouse_spark.queries import exact_avg_expr, exact_avg_sql, load, query

#: value is 2-decimal money-like → exact integer cents for oracle parity.
_CENTS = "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)"

#: streaming-verdict staging ceiling: those verdicts collect the events
#: table once to CREATE micro-batch source files; refuse a big corpus
#: outright (the staging-guard pattern, queries/dedup.py) rather than
#: OOM the driver if someone points a verdict at real data.
MAX_STAGE_EVENTS = 2_000_000


def _guard_stage_events(df: DataFrame, verdict: str) -> None:
    n = df.count()
    if n > MAX_STAGE_EVENTS:
        raise ValueError(
            f"{verdict} stages micro-batch files via a driver collect and "
            f"refuses corpora above {MAX_STAGE_EVENTS:,} events (got "
            f"{n:,}); it is a correctness AUDIT for small SFs — run the "
            "streaming operators directly at scale"
        )


def _cents(col: str = "value") -> F.Column:
    return (F.sum(F.col(col).cast("decimal(18,2)")) * 100).cast("long")


@query(
    "events_daily_type_counts",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS event_date,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST({_CENTS} AS DOUBLE) / 100 AS sum_value,
           {exact_avg_sql(_CENTS, "100 * COUNT(*)", 4)} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: daily event counts/values by type (scan → project → agg).

    Parity: gold KPI daily-grain aggregations (kpis_local.py:36-47).
    """
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("event_date"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _cents().alias("_sum_cents"),
        )
        .select(
            "event_date",
            "event_type",
            "n_events",
            "n_users",
            (F.col("_sum_cents").cast("double") / 100).alias("sum_value"),
            exact_avg_expr("_sum_cents", "100 * n_events", 4).alias("avg_value"),
        )
    )


@query(
    "events_json_extract_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           {exact_avg_sql(
               "CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)",
               "COUNT(json_extract_string(props, '$.k'))",
               4,
           )} AS avg_k
    FROM events
    GROUP BY 1
    """,
)
def events_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction + typed cast + aggregate.

    Parity: silver from_json + gold getItem().cast() metric typing
    (transform_local.py:73, kpis_local.py:24-26). get_json_object stays
    JVM-side (no Python UDF), matching the reference's native-function rule.
    """
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        load(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count("k").alias("_n_k"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_k",
            exact_avg_expr("sum_k", "_n_k", 4).alias("avg_k"),
        )
    )


@query(
    "events_engagement_dropoff_fullouter",
    oracle=f"""
    WITH eng AS (
        SELECT CAST(ts AS DATE) AS event_date, user_id,
               COUNT(*) AS engagement_events
        FROM events WHERE event_type IN ('click', 'view', 'purchase')
        GROUP BY 1, 2
    ),
    drp AS (
        SELECT CAST(ts AS DATE) AS event_date, user_id,
               COUNT(*) AS dropoff_events
        FROM events WHERE event_type = 'error'
        GROUP BY 1, 2
    )
    SELECT COALESCE(eng.event_date, drp.event_date) AS event_date,
           COALESCE(eng.user_id, drp.user_id) AS user_id,
           COALESCE(engagement_events, 0) AS engagement_events,
           COALESCE(dropoff_events, 0) AS dropoff_events,
           COALESCE(engagement_events, 0) + COALESCE(dropoff_events, 0) AS total_events,
           {exact_avg_sql(
               "COALESCE(dropoff_events, 0)",
               "COALESCE(engagement_events, 0) + COALESCE(dropoff_events, 0)",
               6,
           )} AS dropoff_rate
    FROM eng FULL OUTER JOIN drp
      ON eng.event_date = drp.event_date AND eng.user_id = drp.user_id
    """,
)
def events_engagement_dropoff_fullouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI-4 dropoff-rate shape: two filtered aggregates full-outer joined.

    Parity: retention_local.py:81-101 (full outer multi-key join J1 +
    na.fill + zero-guarded ratio). Both sides derive from one scan; Spark
    plans a sort-merge full outer on the two join keys.
    """
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("event_date"), "user_id", "event_type"
    )
    eng = (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_date", "user_id")
        .agg(F.count("*").alias("engagement_events"))
    )
    drp = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("event_date", "user_id")
        .agg(F.count("*").alias("dropoff_events"))
    )
    return (
        eng.join(drp, on=["event_date", "user_id"], how="full")
        .na.fill(0, subset=["engagement_events", "dropoff_events"])
        .withColumn("total_events", F.col("engagement_events") + F.col("dropoff_events"))
        .select(
            "event_date",
            "user_id",
            "engagement_events",
            "dropoff_events",
            "total_events",
            exact_avg_expr("dropoff_events", "total_events", 6).alias("dropoff_rate"),
        )
    )


@query(
    "events_sessionize_lead_stats",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        FROM events
    ),
    durations AS (
        SELECT event_type,
               epoch_us(next_ts) - epoch_us(ts) AS micros_to_next
        FROM seq
        WHERE next_ts IS NOT NULL AND epoch_us(next_ts) >= epoch_us(ts)
    )
    SELECT event_type,
           COUNT(*) AS hops,
           ROUND(CAST(SUM(micros_to_next) AS DOUBLE) / COUNT(*) / 3600000000.0, 4)
               AS avg_hours,
           ROUND(quantile_cont(micros_to_next, 0.5) / 3600000000.0, 4) AS p50_hours,
           ROUND(quantile_cont(micros_to_next, 0.9) / 3600000000.0, 4) AS p90_hours,
           ROUND(CAST(MAX(micros_to_next) AS DOUBLE) / 3600000000.0, 4) AS max_hours
    FROM durations
    GROUP BY 1
    """,
)
def events_sessionize_lead_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI-5 stage-bottleneck shape: lead() sessionization → duration stats.

    Parity: bottlenecks_local.py:38-61 (W1 lead window + A6 percentile agg).
    Uses exact ``percentile`` over integer microseconds (not
    percentile_approx over floats) so the DuckDB quantile_cont oracle
    matches; ties on ts are broken by event_id so the window is
    deterministic. Duration stats stay in integer micros until the final
    double division (identical on both engines; micros/3.6e9 round-ties are
    measure-zero for organic timestamps).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    )
    micros = (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("micros_to_next")
    durations = (
        seq.filter(F.col("next_ts").isNotNull())
        .select("event_type", micros)
        .filter(F.col("micros_to_next") >= 0)
    )
    hours = F.lit(3600000000.0)
    return durations.groupBy("event_type").agg(
        F.count("*").alias("hops"),
        F.round(F.sum("micros_to_next").cast("double") / F.count("*") / hours, 4).alias(
            "avg_hours"
        ),
        F.round(F.expr("percentile(micros_to_next, 0.5)") / hours, 4).alias("p50_hours"),
        F.round(F.expr("percentile(micros_to_next, 0.9)") / hours, 4).alias("p90_hours"),
        F.round(F.max("micros_to_next").cast("double") / hours, 4).alias("max_hours"),
    )


@query(
    "events_dedup_rownumber",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_type, ts AS latest_ts, value AS latest_value
    FROM ranked WHERE rn = 1
    """,
)
def events_dedup_rownumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documented dedup semantics D1: keep latest record per logical key.

    Parity: docs/runbooks/silver-transform.md:114-122 ("keep record with
    max(ingested_at)") via row_number() over a desc-ordered window. The
    carried-through value needs no rounding (same stored double on both
    engines).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )


@query(
    "events_value_band_distribution",
    oracle=f"""
    SELECT CAST(FLOOR(LEAST(GREATEST(value, 0), 100) / 10) * 10 AS INTEGER) AS score_band,
           COUNT(*) AS band_events,
           {exact_avg_sql(
               "CAST(SUM(CAST(LEAST(GREATEST(value, 0), 100) AS DECIMAL(18,2))) * 100"
               " AS BIGINT)",
               "100 * COUNT(*)",
               4,
           )} AS avg_score_in_band
    FROM events
    GROUP BY 1
    """,
)
def events_value_band_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI-3 engagement-band shape: clamp + decile bucketize + agg.

    Parity: retention_local.py:28-34,60-67 (F13 floor/least/greatest band
    derivation used as a grouping key).
    """
    clamped = F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(100.0))
    band = (F.floor(clamped / 10) * 10).cast("int")
    return (
        load(spark, sf_dir, "events")
        .select(band.alias("score_band"), clamped.alias("clamped"))
        .groupBy("score_band")
        .agg(
            F.count("*").alias("band_events"),
            _cents("clamped").alias("_sum_cents"),
        )
        .select(
            "score_band",
            "band_events",
            exact_avg_expr("_sum_cents", "100 * band_events", 4).alias(
                "avg_score_in_band"
            ),
        )
    )


@query(
    "events_late_flag_counts",
    oracle="""
    SELECT event_type,
           COUNT(*) FILTER (WHERE CAST(ts AS DATE) < DATE '2024-01-08') AS late_events,
           COUNT(*) FILTER (WHERE CAST(ts AS DATE) >= DATE '2024-01-08') AS on_time_events,
           COUNT(*) AS total_events
    FROM events
    GROUP BY 1
    """,
)
def events_late_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-event flagging as conditional aggregation.

    Parity: transform_local.py:109 (datediff-based is_late_event flag, F8,
    F12) with the as-of date parameterized (2024-01-08) instead of
    current_date() for determinism.
    """
    is_late = F.to_date("ts") < F.lit("2024-01-08").cast("date")
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.when(is_late, 1)).alias("late_events"),
            F.count(F.when(~is_late, 1)).alias("on_time_events"),
            F.count("*").alias("total_events"),
        )
    )


@query(
    "events_hash_idempotency",
    oracle="""
    SELECT SUBSTR(sha256(CAST(event_id AS VARCHAR) || '||' || event_type
                          || '||' || CAST(user_id AS VARCHAR)), 1, 8) AS hash_prefix,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY n DESC, hash_prefix
    LIMIT 20
    """,
)
def events_hash_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-field idempotency hash (D6): sha2(concat_ws('||', ...), 256).

    Parity: docs/runbooks/silver-transform.md:100-112 hash recipe /
    transform_local.py:112 (F10).
    """
    h = F.sha2(
        F.concat_ws(
            "||",
            F.col("event_id").cast("string"),
            F.col("event_type"),
            F.col("user_id").cast("string"),
        ),
        256,
    )
    return (
        load(spark, sf_dir, "events")
        .select(F.substring(h, 1, 8).alias("hash_prefix"))
        .groupBy("hash_prefix")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("hash_prefix"))
        .limit(20)
    )


@query(
    "events_sketch_aggregates",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_rtol,
           TRUE AS p50_rank_ok,
           TRUE AS p99_rank_ok
    FROM events
    GROUP BY 1
    """,
)
def events_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the constant-memory cardinality/quantile path at
    100 TB: HyperLogLog++ approx_count_distinct and the percentile_approx
    sketch the reference uses for stage bottlenecks
    (bottlenecks_local.py:58-59).

    Sketch values are engine-specific, so the query emits the EXACT
    cardinality (hash-comparable) plus in-engine verdicts that the oracle
    pins as literal TRUEs — a sketch regression flips a hash-checked value.
    The verdicts check each sketch's ACTUAL guarantee:
    - HLL: |approx − exact| ≤ 3×rsd (6%) of the exact cardinality.
    - percentile_approx guarantees a RANK window, not a value window (it
      returns a real data element; at q=0.99 and small n that element can
      sit far from the interpolated exact percentile in value space while
      being rank-perfect). So the query joins the sketch output back and
      verifies rank(result) ∈ [(q−ε)·n, (q+ε)·n] with ε = 0.001 (sketch
      accuracy 10000 ⇒ guaranteed ε = 1e-4; 10× slack for ties).
    Fine-grained accuracy is additionally pinned in tests/test_sketches.py.
    """
    hll_rtol, rank_eps = 0.06, 0.001
    ev = load(spark, sf_dir, "events").select("event_type", "user_id", "value")
    approx = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll_users"),
        F.count("value").alias("_n"),
        F.expr("percentile_approx(value, 0.5D, 10000)").alias("_p50_approx"),
        F.expr("percentile_approx(value, 0.99D, 10000)").alias("_p99_approx"),
    )
    # rank audit: one more pass over events with the (tiny) sketch results
    # broadcast — counts how many values fall strictly below / at-or-below
    # each sketch output
    ranked = ev.join(F.broadcast(approx), on="event_type").groupBy("event_type").agg(
        F.first("exact_users").alias("exact_users"),
        F.first("_hll_users").alias("_hll_users"),
        F.first("_n").alias("_n"),
        F.count(F.when(F.col("value") < F.col("_p50_approx"), 1)).alias("_p50_lt"),
        F.count(F.when(F.col("value") <= F.col("_p50_approx"), 1)).alias("_p50_le"),
        F.count(F.when(F.col("value") < F.col("_p99_approx"), 1)).alias("_p99_lt"),
        F.count(F.when(F.col("value") <= F.col("_p99_approx"), 1)).alias("_p99_le"),
    )

    def rank_ok(lt, le, q):
        lo = (F.lit(q) - F.lit(rank_eps)) * F.col("_n")
        hi = (F.lit(q) + F.lit(rank_eps)) * F.col("_n")
        return (F.col(le) >= lo) & (F.col(lt) <= hi)

    return ranked.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_hll_users") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(hll_rtol)
        ).alias("hll_within_rtol"),
        rank_ok("_p50_lt", "_p50_le", 0.5).alias("p50_rank_ok"),
        rank_ok("_p99_lt", "_p99_le", 0.99).alias("p99_rank_ok"),
    )


@query(
    "events_value_variance",
    oracle="""
    WITH moments AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                        * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s2
        FROM events
        GROUP BY 1
    )
    SELECT event_type, n,
           ROUND((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                 / (CAST(n AS DOUBLE) * (n - 1)) / 10000.0, 4) AS var_samp_value,
           ROUND(sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                 / (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 4) AS stddev_value
    FROM moments
    """,
)
def events_value_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev via exact integer moments: Σcents and Σcents² are
    exact BIGINTs, and both engines evaluate the identical
    (n·S2 − S1²)/(n(n−1)) double expression — built-in var_samp uses
    Welford-style accumulation whose result depends on partition order, so
    the moments formulation is the oracle-comparable (and
    partial-aggregatable) form."""
    cents = F.round(F.col("value") * 100).cast("long")
    moments = (
        load(spark, sf_dir, "events")
        .select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
    )
    n_d = F.col("n").cast("double")
    var_cents = (n_d * F.col("s2") - F.col("s1").cast("double") * F.col("s1")) / (
        n_d * (F.col("n") - 1)
    )
    return moments.select(
        "event_type",
        "n",
        F.round(var_cents / 10000.0, 4).alias("var_samp_value"),
        F.round(F.sqrt(var_cents) / 100.0, 4).alias("stddev_value"),
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH tv AS (
        SELECT user_id, MIN(ts) AS t_v FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    tc AS (
        SELECT e.user_id, MIN(e.ts) AS t_c
        FROM events e JOIN tv ON e.user_id = tv.user_id AND e.ts > tv.t_v
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    tp AS (
        SELECT e.user_id, MIN(e.ts) AS t_p
        FROM events e JOIN tc ON e.user_id = tc.user_id AND e.ts > tc.t_c
        WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM tv) AS n_viewed,
           (SELECT COUNT(*) FROM tc) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM tp) AS n_purchased_after_click,
           (10000 * (SELECT COUNT(*) FROM tp))
               // GREATEST((SELECT COUNT(*) FROM tv), 1) AS conversion_bp
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel (view → later click → later purchase,
    first-match semantics): t_view = the user's first view; t_click = the
    first click strictly after it; t_purchase = the first purchase
    strictly after that. Runs on the general n-stage funnel operator
    (operators/sequence.py): each stage is one semi-join + min-aggregate
    shuffling once on user_id with the time predicate applied join-side,
    stages scoped-persisted, all counts assembled in ONE plan via
    cross-joined one-row aggregates. Conversion in exact basis points."""
    from creatorops_lakehouse_spark.operators.sequence import funnel

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel(
        ev,
        [
            ("viewed", F.col("event_type") == "view"),
            ("clicked_after_view", F.col("event_type") == "click"),
            ("purchased_after_click", F.col("event_type") == "purchase"),
        ],
    )


@query(
    "events_funnel_4stage",
    oracle="""
    WITH t0 AS (
        SELECT user_id, MIN(ts) AS t_0 FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ),
    t1 AS (
        SELECT e.user_id, MIN(e.ts) AS t_1
        FROM events e JOIN t0 ON e.user_id = t0.user_id AND e.ts > t0.t_0
        WHERE e.event_type = 'view' GROUP BY 1
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_2
        FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t_1
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    t3 AS (
        SELECT e.user_id, MIN(e.ts) AS t_3
        FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t_2
        WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM t0) AS n_signed_up,
           (SELECT COUNT(*) FROM t1) AS n_viewed_after_signup,
           (SELECT COUNT(*) FROM t2) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM t3) AS n_purchased_after_click,
           (10000 * (SELECT COUNT(*) FROM t3))
               // GREATEST((SELECT COUNT(*) FROM t0), 1) AS conversion_bp
    """,
)
def events_funnel_4stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-stage ordered funnel (signup → view → click → purchase, each
    strictly after the previous stage's first match) on the SAME n-stage
    operator as events_funnel_conversion — the oracle recomputes the chain
    as nested min-join CTEs, pinning the operator's first-match semantics
    at a depth the fixed 3-stage query never exercises."""
    from creatorops_lakehouse_spark.operators.sequence import funnel

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel(
        ev,
        [
            ("signed_up", F.col("event_type") == "signup"),
            ("viewed_after_signup", F.col("event_type") == "view"),
            ("clicked_after_view", F.col("event_type") == "click"),
            ("purchased_after_click", F.col("event_type") == "purchase"),
        ],
    )


@query(
    "events_funnel_windowed",
    oracle="""
    WITH t0 AS (
        SELECT user_id, MIN(ts) AS t_0 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    t1 AS (
        SELECT e.user_id, MIN(e.ts) AS t_1
        FROM events e JOIN t0 ON e.user_id = t0.user_id
            AND e.ts > t0.t_0 AND e.ts <= t0.t_0 + INTERVAL 1800 SECOND
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_2
        FROM events e JOIN t1 ON e.user_id = t1.user_id
            AND e.ts > t1.t_1 AND e.ts <= t1.t_1 + INTERVAL 86400 SECOND
        WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM t0) AS n_viewed,
           (SELECT COUNT(*) FROM t1) AS n_clicked_30m,
           (SELECT COUNT(*) FROM t2) AS n_purchased_24h,
           (10000 * (SELECT COUNT(*) FROM t2))
               // GREATEST((SELECT COUNT(*) FROM t0), 1) AS conversion_bp
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (view → click WITHIN 30 MINUTES → purchase
    WITHIN 24 HOURS of that click): the ``within`` deadlines of the
    n-stage funnel operator, INTERVAL arithmetic on both engines so the
    boundary comparison (``<=`` at exactly t_prev + window) is
    engine-exact. The unwindowed 4-stage query pins ordering; this one
    pins the deadline filter's join-side placement."""
    from creatorops_lakehouse_spark.operators.sequence import funnel

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel(
        ev,
        [
            ("viewed", F.col("event_type") == "view"),
            ("clicked_30m", F.col("event_type") == "click"),
            ("purchased_24h", F.col("event_type") == "purchase"),
        ],
        within=[1800, 86400],
    )


@query(
    "events_funnel_by_region",
    oracle="""
    WITH ev AS (
        SELECT r.r_name AS region, e.user_id, e.event_type, e.ts
        FROM events e
        JOIN customer c ON c.c_custkey = e.user_id
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    t0 AS (
        SELECT region, user_id, MIN(ts) AS t_0 FROM ev
        WHERE event_type = 'view' GROUP BY 1, 2
    ),
    t1 AS (
        SELECT e.region, e.user_id, MIN(e.ts) AS t_1
        FROM ev e JOIN t0 ON e.region = t0.region
            AND e.user_id = t0.user_id AND e.ts > t0.t_0
        WHERE e.event_type = 'click' GROUP BY 1, 2
    ),
    t2 AS (
        SELECT e.region, e.user_id, MIN(e.ts) AS t_2
        FROM ev e JOIN t1 ON e.region = t1.region
            AND e.user_id = t1.user_id AND e.ts > t1.t_1
        WHERE e.event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT b.region, b.n_users,
           COALESCE(v.n, 0) AS n_viewed,
           COALESCE(k.n, 0) AS n_clicked_after_view,
           COALESCE(p.n, 0) AS n_purchased_after_click,
           (10000 * COALESCE(p.n, 0)) // GREATEST(COALESCE(v.n, 0), 1)
               AS conversion_bp
    FROM (SELECT region, COUNT(DISTINCT user_id) AS n_users
          FROM ev GROUP BY 1) b
    LEFT JOIN (SELECT region, COUNT(*) AS n FROM t0 GROUP BY 1) v
        ON v.region = b.region
    LEFT JOIN (SELECT region, COUNT(*) AS n FROM t1 GROUP BY 1) k
        ON k.region = b.region
    LEFT JOIN (SELECT region, COUNT(*) AS n FROM t2 GROUP BY 1) p
        ON p.region = b.region
    """,
)
def events_funnel_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort funnel (VERDICT r5 item 8): the 3-stage view → click →
    purchase chain grouped by the user's customer region (events.user_id
    → customer → nation → region, dims broadcast onto the fact scan).
    Runs on operators/sequence.py::funnel_by_group — the region key rides
    each stage's semi-join, per-region counts left-join onto the
    user-universe base so regions with no completions report zeros, and
    conversion_bp stays exact integer basis points per region."""
    from creatorops_lakehouse_spark.operators.sequence import funnel_by_group

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("c_custkey").alias("user_id"), F.col("r_name").alias("region"))
    )
    # customer-cardinality map: NOT force-broadcast (a 10^8-customer dim
    # outgrows broadcast; AQE picks broadcast at bench scale anyway —
    # same unforced-cohort discipline as the retention queries)
    evr = ev.join(dim, "user_id")
    return funnel_by_group(
        evr,
        [
            ("viewed", F.col("event_type") == "view"),
            ("clicked_after_view", F.col("event_type") == "click"),
            ("purchased_after_click", F.col("event_type") == "purchase"),
        ],
        group_cols=["region"],
    )


@query(
    "events_salted_hot_key_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    ORDER BY event_type
    """,
)
def events_salted_hot_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through explicit salting (operators/skew.py).

    ``event_type`` has single-digit cardinality — the worst case for a
    direct groupBy at cluster scale (a handful of reducers own the whole
    table while the rest idle). ``salted_count`` spreads each hot key
    over 16 salt reducers in a partial count, then sums the partials —
    the same two-phase shape Spark's own partial aggregation applies to
    ALGEBRAIC aggregates, made explicit so it also covers composed
    per-key pipelines where a single reducer would otherwise be the
    straggler. n_users rides a distinct-aggregate beside it; the oracle
    pins both against the plain one-phase answer.
    """
    from creatorops_lakehouse_spark.operators.skew import salted_count

    ev = load(spark, sf_dir, "events")
    counts = salted_count(ev, ["event_type"], n_salts=16, salt_cols=["event_id"])
    users = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    return (
        counts.join(users, "event_type")
        .select("event_type", F.col("n").alias("n_events"), "n_users")
        .orderBy("event_type")
    )


@query(
    "events_trailing_30min_spend",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
           CAST(SUM(CAST(CAST(value AS DECIMAL(14,4)) * 10000 AS BIGINT))
                OVER w AS BIGINT) AS trailing_value_units
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW
    )
    ORDER BY user_id, event_id
    """,
)
def events_trailing_30min_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame (§2.5 gap): per event, the count and
    exact-decimal value sum of the user's events in the trailing 30
    minutes INCLUDING timestamp peers — semantics a ROWS frame can't
    express (peers at the same ts must all be in-frame regardless of
    row order, and gaps wider than the interval exclude rows a fixed
    ROWS count would include).

    Both engines order by integer epoch-micros with a numeric RANGE
    bound, so frame membership is integer-exact; the summed value goes
    through scaled-BIGINT units. One shuffle on user_id; within a
    partition the running frame is O(n) two-pointer work in both
    engines.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-1800 * 1_000_000, Window.currentRow)
    )
    units = (F.col("value").cast("decimal(14,4)") * 10000).cast("long")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            F.sum(units).over(w).alias("trailing_value_units"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "events_value_outliers_3sigma",
    oracle="""
    WITH cents AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM events
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS sq
        FROM cents
        GROUP BY 1
    )
    SELECT c.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN
               CAST(c.c * st.n - st.s AS HUGEINT)
                 * CAST(c.c * st.n - st.s AS HUGEINT)
               > 9 * (CAST(st.n AS HUGEINT) * CAST(st.sq AS HUGEINT)
                      - CAST(st.s AS HUGEINT) * CAST(st.s AS HUGEINT))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN
               CAST(c.c * st.n - st.s AS HUGEINT)
                 * CAST(c.c * st.n - st.s AS HUGEINT)
               > 9 * (CAST(st.n AS HUGEINT) * CAST(st.sq AS HUGEINT)
                      - CAST(st.s AS HUGEINT) * CAST(st.s AS HUGEINT))
               THEN c.c ELSE 0 END) AS DOUBLE) / 100 AS outlier_value_sum
    FROM cents c
    JOIN stats st ON st.event_type = c.event_type
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_value_outliers_3sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier detection per event type, decided in EXACT integer
    arithmetic so both engines flag the identical rows.

    |v - mean| > 3*sigma (population) is squared and cross-multiplied to
    clear the divisions:  (v*n - s)^2 > 9*(n*sq - s^2)  over integer
    cents — no float mean/stddev, so there is no boundary row that one
    engine keeps and the other drops. The squares exceed int64 at large
    n, so they evaluate in DECIMAL (Spark) / HUGEINT (DuckDB): different
    containers, identical integers. Plan: one aggregate for per-type
    stats (5 rows, broadcast back), one scan to flag — no window, no
    second shuffle of the fact table.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        # sum of squares in DECIMAL: a long SUM(c*c) wraps near 9.2e18
        # (reachable at sf >= 10 with large values) while DuckDB's
        # HUGEINT keeps going — exactness envelope must match.
        F.sum(F.col("c").cast("decimal(18,0)") * F.col("c")).alias("sq"),
    )
    # Exactness envelope (documented, matches the HUGEINT oracle up to
    # DECIMAL(38)): with cents <= 1e8 ($1M events) and n <= 1e9 rows per
    # group, |d| <= 1e17 -> DECIMAL(18,0); d^2 <= 1e34 -> DECIMAL(37,0);
    # n*sq <= 1e34 and s^2 <= 1e34 stay inside DECIMAL(38,0). Beyond that
    # envelope Spark's decimal overflows to NULL (flagged row dropped)
    # rather than silently wrapping a long.
    d = F.expr("CAST(CAST(c AS DECIMAL(18,0)) * n - s AS DECIMAL(18,0))")
    rhs = F.expr(
        "CAST(9 AS DECIMAL(1,0)) * (CAST(n AS DECIMAL(10,0)) * sq"
        " - CAST(s AS DECIMAL(18,0)) * CAST(s AS DECIMAL(18,0)))"
    )
    is_outlier = (d * d) > rhs
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(is_outlier, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.sum(F.when(is_outlier, F.col("c")).otherwise(0)).alias("_oc"),
        )
        .select(
            "event_type",
            "n_events",
            "n_outliers",
            (F.col("_oc").cast("double") / 100).alias("outlier_value_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events
        GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_week,
               CAST((CAST(date_trunc('week', e.ts) AS DATE)
                     - CAST(f.cohort_week AS DATE)) // 7 AS BIGINT) AS week_offset
        FROM events e
        JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           week_offset,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    distinct active users per (cohort, week-offset) cell — the classic
    product-analytics triangle.

    Week arithmetic stays integral (date_trunc to Monday, day-difference
    div 7) so cell membership is exact on both engines. Plan: one
    aggregate for first-weeks (one row per USER — AQE decides broadcast
    vs shuffle from its actual size; forcing broadcast would OOM at
    sf10+ user counts), distinct per (user, cell), then the cell
    count — the fact table shuffles twice (first-week agg, cell
    distinct), both with map-side partials.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("active_week").alias("cohort_week"))
    activity = (
        # no broadcast hint: firsts is one row per USER (millions at
        # sf10+) — let AQE pick broadcast vs shuffle from actual size
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.to_date("cohort_week").alias("cohort_week"), "week_offset"
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_partial_agg_merge",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100 AS sum_value,
           TRUE AS merge_matches_direct,
           TRUE AS hll_estimate_sane
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial aggregation — the pre-aggregation pattern that
    makes incremental rollup maintenance work at 100 TB: store per-day
    partials (count, exact cents sum, DataSketches HLL user sketch),
    answer coarser queries by MERGING partials instead of rescanning
    facts.

    The query materializes daily partials, merges them up to event_type,
    and pins two contracts as hash-checked literal TRUEs:
    - ``merge_matches_direct``: merged counts/sums/HLL estimate equal
      the direct single-pass computation (HLL union is lossless at equal
      precision, so even the sketch estimate matches EXACTLY — that is
      the property that makes sketch partials storable);
    - ``hll_estimate_sane``: merged estimate within 5% of the exact
      distinct-user count.
    A regression in either flips a hash-checked value. The exact columns
    (count, decimal cents) are checked against DuckDB directly.
    """
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("event_date"),
        "event_type",
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    daily = ev.groupBy("event_date", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    )
    merged = daily.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("m_n"),
        F.sum("s").cast("long").alias("m_s"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("m_users"),
    )
    direct = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d_n"),
        F.sum("c").cast("long").alias("d_s"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("d_users"),
        F.count_distinct("user_id").cast("long").alias("exact_users"),
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            F.col("m_n").alias("n_events"),
            (F.col("m_s").cast("double") / 100).alias("sum_value"),
            (
                (F.col("m_n") == F.col("d_n"))
                & (F.col("m_s") == F.col("d_s"))
                & (F.col("m_users") == F.col("d_users"))
            ).alias("merge_matches_direct"),
            (
                F.abs(F.col("m_users") - F.col("exact_users")) * 100
                <= F.col("exact_users") * 5
            ).alias("hll_estimate_sane"),
        )
        .orderBy("event_type")
    )


@query(
    "events_audience_overlap_theta",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    per_type AS (
        SELECT event_type, COUNT(*) AS n_users FROM ut GROUP BY 1
    ),
    both_counts AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT bc.type_a, bc.type_b,
           pa.n_users AS n_users_a,
           pb.n_users AS n_users_b,
           bc.n_both AS n_both_exact,
           pa.n_users + pb.n_users - bc.n_both AS n_union_exact,
           TRUE AS inter_estimate_sane,
           TRUE AS union_estimate_sane
    FROM both_counts bc
    JOIN per_type pa ON pa.event_type = bc.type_a
    JOIN per_type pb ON pb.event_type = bc.type_b
    ORDER BY 1, 2
    """,
)
def events_audience_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via DataSketches Theta set algebra: for every
    event-type pair, the distinct-user intersection/union estimated from
    per-type sketches — the mergeable-sketch answer to "how many users
    did BOTH" that at 100 TB replaces a user-level self-join with a
    5-row sketch table.

    Exact columns (per-type users, exact intersection/union via
    inclusion-exclusion) are DuckDB-checked; the sketch estimates are
    pinned as hash-checked TRUEs at a 5% + 2-user tolerance (theta
    relative error at default lgK is ~1.6%; the absolute slack covers
    near-empty intersections).
    """
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    # ut feeds both sides of the pair self-join AND the sketch table;
    # per_type is branched into the a/b roles — persist both or the
    # events scan+distinct runs up to 4x and the theta aggregation 2x.
    ut = scoped_persist(
        load(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    )
    per_type = scoped_persist(
        ut.groupBy("event_type").agg(
            F.expr("theta_sketch_agg(user_id)").alias("sk"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_users").alias("n_users_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_users").alias("n_users_b"),
    )
    both = (
        ut.alias("x")
        .join(ut.alias("y"), (F.col("x.user_id") == F.col("y.user_id"))
              & (F.col("x.event_type") < F.col("y.event_type")))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both_exact"))
    )
    est_i = F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
    est_u = F.expr("theta_sketch_estimate(theta_union(sk_a, sk_b))")
    tol = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) * 100 <= exact * 5 + 200
    )
    return (
        both.join(F.broadcast(a), "type_a")
        .join(F.broadcast(b), "type_b")
        .withColumn("n_union_exact",
                    F.col("n_users_a") + F.col("n_users_b") - F.col("n_both_exact"))
        .select(
            "type_a",
            "type_b",
            "n_users_a",
            "n_users_b",
            "n_both_exact",
            "n_union_exact",
            tol(est_i, F.col("n_both_exact")).alias("inter_estimate_sane"),
            tol(est_u, F.col("n_union_exact")).alias("union_estimate_sane"),
        )
        .orderBy("type_a", "type_b")
    )


CMS_DEPTH, CMS_WIDTH = 5, 272


@query(
    "events_cms_frequency_verdict",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS overest_ok, TRUE AS bound_ok, TRUE AS merge_ok
    FROM events
    """,
)
def events_cms_frequency_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency contract (operators/cms.py), hash-checked
    the same way as the HLL/Theta rows: per distinct user_id the CMS
    estimate must never undercount (overest_ok — counters only add), the
    worst overcount must stay within the 3N/width bound (bound_ok — the
    classic eN/w tail at depth {CMS_DEPTH}, deterministic on the fixed
    seeds + driver corpus), and the counter-wise merge of two disjoint
    half-sketches (event_id parity split) must equal the full-corpus
    sketch EXACTLY (merge_ok — the mergeability that makes the sketch a
    partition/day/stream rollup primitive). n_keys/n_events are
    SQL-recomputed by the oracle; the booleans pin against literal TRUE,
    so any geometry or merge regression flips the value hash."""
    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.cms import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    full = scoped_persist(cms_build(ev, "user_id", CMS_DEPTH, CMS_WIDTH))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("exact"))
    est = cms_estimate(
        full, exact.select("user_id"), "user_id", CMS_DEPTH, CMS_WIDTH
    )
    freq = exact.join(est, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("exact").cast("long").alias("n_events"),
        F.sum(F.when(F.col("est") < F.col("exact"), 1).otherwise(0)).alias(
            "_n_under"
        ),
        F.max(F.col("est") - F.col("exact")).alias("_max_over"),
    )
    halves = cms_merge(
        cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id", CMS_DEPTH, CMS_WIDTH),
        cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id", CMS_DEPTH, CMS_WIDTH),
    )
    n_diff = (
        full.withColumnRenamed("cnt", "cnt_a")
        .join(halves.withColumnRenamed("cnt", "cnt_b"), ["row_i", "bucket"], "full_outer")
        .agg(
            F.sum(
                F.when(~F.col("cnt_a").eqNullSafe(F.col("cnt_b")), 1).otherwise(0)
            ).alias("_n_diff")
        )
    )
    return freq.crossJoin(F.broadcast(n_diff)).select(
        "n_keys",
        "n_events",
        (F.col("_n_under") == 0).alias("overest_ok"),
        (F.col("_max_over") <= F.expr(f"(3 * n_events) div {CMS_WIDTH}")).alias(
            "bound_ok"
        ),
        (F.col("_n_diff") == 0).alias("merge_ok"),
    )


@query(
    "events_streaming_window_verdict",
    oracle="""
    WITH wm1 AS (SELECT MAX(ts) AS wm FROM events WHERE event_id % 2 = 0),
    w AS (SELECT CAST(ts AS DATE) AS day FROM events GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_windows_total,
           CAST((SELECT COUNT(*) FROM w, wm1
                 WHERE day + INTERVAL 1 DAY <= wm) AS BIGINT)
               AS n_windows_closed,
           TRUE AS complete_matches_batch,
           TRUE AS append_emits_once,
           TRUE AS append_contents_ok
    """,
)
def events_streaming_window_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable contract for STREAMING tumbling-window aggregation
    with watermarks (§2.8), same harness pattern as
    docs_streaming_admission_verdict: the events table is staged as three
    JSON files (mtime-ordered: even-parity rows; odd-parity rows after
    the corpus's 10th day; odd-parity STRAGGLERS from the first 10 days)
    and replayed through real Structured Streaming (readStream json →
    maxFilesPerTrigger=1 → availableNow → memory sink). Five hash-checked
    facts:

    - n_windows_total / n_windows_closed: SQL-recomputed by the oracle —
      closed means window_end <= the even-parity max event time (the
      watermark in force at the close, 0s delay), pinning the close
      boundary exactly;
    - complete_matches_batch: the complete-mode streaming aggregate's
      final snapshot equals the batch groupBy(window) aggregate
      row-for-row (counts and exact cents);
    - append_emits_once: append mode emits every closed window EXACTLY
      once and the open last window never — and batch 3's post-eviction
      stragglers do not resurrect an already-emitted window (which would
      duplicate rows downstream);
    - append_contents_ok: each emitted window carries exactly the rows
      that were in state at its close — full contents for windows whose
      late-but-pre-close rows merged into live state (no premature
      loss), even-parity-only contents for the first-10-days windows
      whose odd rows arrived only after eviction (the watermark drop
      discipline).
    """
    import datetime as _dt
    import json as _json
    import os as _os
    import tempfile as _tempfile
    import uuid as _uuid

    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    _guard_stage_events(ev, "events_streaming_window_verdict")
    rows = ev.collect()  # bounded staging to CREATE a stream source
    split_day = min(r.ts.date() for r in rows) + _dt.timedelta(days=9)
    root = _tempfile.mkdtemp(prefix="stream_window_")
    src = _os.path.join(root, "src")
    _os.makedirs(src)
    batches = (
        ("b0", lambda r: r.event_id % 2 == 0),
        ("b1", lambda r: r.event_id % 2 == 1 and r.ts.date() > split_day),
        ("b2", lambda r: r.event_id % 2 == 1 and r.ts.date() <= split_day),
    )
    for i, (name, pred) in enumerate(batches):
        path = _os.path.join(src, f"{name}.json")
        with open(path, "w") as f:
            for r in rows:
                if pred(r):
                    f.write(
                        _json.dumps(
                            {
                                "event_id": r.event_id,
                                "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                                "cents": r.cents,
                            }
                        )
                        + "\n"
                    )
        _os.utime(path, (1700000000 + i, 1700000000 + i))

    schema = "event_id long, ts timestamp, cents long"

    def windowed(df):
        return (
            df.groupBy(F.window("ts", "1 day").alias("w"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").cast("long").alias("c"),
            )
            .select(F.to_date(F.col("w.start")).alias("day"), "n", "c")
        )

    def run_stream(mode: str, name: str):
        reader = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        agg = windowed(reader.withWatermark("ts", "0 seconds"))
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{root}/ckpt_{name}")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):  # hang backstop only
            q.stop()
            raise TimeoutError(f"streaming window query {name} did not finish")
        return spark.table(name)

    tag = _uuid.uuid4().hex[:8]
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    complete = scoped_persist(run_stream("complete", f"win_c_{tag}"))
    append = scoped_persist(run_stream("append", f"win_a_{tag}"))

    batch_full = scoped_persist(windowed(ev))
    wm_e = ev.filter(F.col("event_id") % 2 == 0).agg(F.max("ts").alias("wm"))
    sd = F.lit(split_day.strftime("%Y-%m-%d")).cast("date")
    # In-engine expected emission: even-only contents for first-10-days
    # windows (their odd rows arrived post-eviction and were dropped),
    # full contents for later windows (late-but-pre-close merge), only
    # windows closed by the even-parity max watermark.
    expected = (
        windowed(ev.filter(F.col("event_id") % 2 == 0))
        .filter(F.col("day") <= sd)
        .unionByName(batch_full.filter(F.col("day") > sd))
        .crossJoin(F.broadcast(wm_e))
        .filter(
            F.col("day").cast("timestamp") + F.expr("INTERVAL 1 DAY")
            <= F.col("wm")
        )
        .select("day", "n", "c")
    )

    def n_mismatch(a, b):
        return (
            a.withColumnRenamed("n", "n_a")
            .withColumnRenamed("c", "c_a")
            .join(
                b.withColumnRenamed("n", "n_b").withColumnRenamed("c", "c_b"),
                "day",
                "full_outer",
            )
            .agg(
                F.sum(
                    F.when(
                        F.col("n_a").eqNullSafe(F.col("n_b"))
                        & F.col("c_a").eqNullSafe(F.col("c_b")),
                        0,
                    ).otherwise(1)
                ).alias("m")
            )
        )

    totals = batch_full.agg(F.count(F.lit(1)).cast("long").alias("n_windows_total"))
    emit_stats = append.agg(
        F.count(F.lit(1)).cast("long").alias("_n_emitted"),
        F.count_distinct("day").cast("long").alias("n_windows_closed"),
    )
    n_expected = expected.agg(F.count(F.lit(1)).cast("long").alias("_n_expected"))
    mc = n_mismatch(complete, batch_full).withColumnRenamed("m", "m_c")
    ma = n_mismatch(append, expected).withColumnRenamed("m", "m_a")
    return (
        totals.crossJoin(F.broadcast(emit_stats))
        .crossJoin(F.broadcast(n_expected))
        .crossJoin(F.broadcast(mc))
        .crossJoin(F.broadcast(ma))
        .select(
            "n_windows_total",
            "n_windows_closed",
            (F.coalesce(F.col("m_c"), F.lit(0)) == 0).alias(
                "complete_matches_batch"
            ),
            (
                (F.col("_n_emitted") == F.col("n_windows_closed"))
                & (F.col("_n_emitted") == F.col("_n_expected"))
            ).alias("append_emits_once"),
            (F.coalesce(F.col("m_a"), F.lit(0)) == 0).alias("append_contents_ok"),
        )
    )


@query(
    "events_value_mad_by_type",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS median_half_cents
        FROM c GROUP BY 1
    ),
    d AS (
        SELECT c.event_type, m.median_half_cents,
               ABS(2 * c.cents - m.median_half_cents) AS d2
        FROM c JOIN m USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ANY_VALUE(median_half_cents) AS median_half_cents,
           CAST(quantile_cont(d2, 0.5) * 2 AS BIGINT) AS mad_quarter_cents
    FROM d GROUP BY 1
    """,
)
def events_value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust dispersion
    statistic (outlier-insensitive, unlike the 3-sigma query's variance).
    Exactness trick: medians of integers are k or k+0.5, so carrying
    2x-scaled units (half-cents, then quarter-cents for the MAD of
    absolute deviations) keeps every number an exact BIGINT on both
    engines — no float rounding at interpolation boundaries. Two grouped
    percentile passes; the per-type median table is 5 rows → broadcast
    back onto the event scan."""
    c = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    m = c.groupBy("event_type").agg(
        (F.percentile("cents", F.lit(0.5)) * 2)
        .cast("long")
        .alias("median_half_cents")
    )
    d = c.join(F.broadcast(m), "event_type").withColumn(
        "d2", F.abs(2 * F.col("cents") - F.col("median_half_cents"))
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.first("median_half_cents").alias("median_half_cents"),
        (F.percentile("d2", F.lit(0.5)) * 2).cast("long").alias("mad_quarter_cents"),
    )


@query(
    "events_value_trend_ols",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS y,
               epoch_us(ts) AS es
        FROM events
    ),
    x AS (
        SELECT event_type, y,
               CAST((es - MIN(es) OVER (PARTITION BY event_type))
                    // 3600000000 AS BIGINT) AS xh
        FROM c
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xh) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(xh * y) AS BIGINT) AS sxy,
               CAST(SUM(xh * xh) AS BIGINT) AS sxx
        FROM x GROUP BY 1
    )
    SELECT event_type, n AS n_events,
           CAST(CASE
               WHEN n * sxx - sx * sx = 0 THEN 0
               WHEN n * sxy - sx * sy < 0 THEN
                   -((CAST(-(n * sxy - sx * sy) AS HUGEINT) * 24000)
                     // (n * sxx - sx * sx))
               ELSE
                   (CAST(n * sxy - sx * sy AS HUGEINT) * 24000)
                     // (n * sxx - sx * sx)
           END AS BIGINT) AS slope_milli_cents_per_day
    FROM s
    """,
)
def events_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS value trend in EXACT integer arithmetic: regress cents
    on hours-since-first-event (hour-bucketed x keeps every moment sum in
    int64 through sf1; see envelope note) and report the slope in milli-
    cents per day via cross-multiplied integer division — no float means,
    so both engines emit the identical BIGINT at every group.

    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), scaled ×24,000
    (cents/hour → milli-cents/day). Negative slopes split into
    sign × magnitude before the integer division: Spark's div truncates
    toward zero while DuckDB's // floors, and the two agree only on
    non-negative operands. The ×24,000 product can exceed int64, so the
    magnitude multiplies in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
    same container split as events_value_outliers_3sigma. Plan: one
    min-window pass per type + one hash aggregate (x is recentred per
    group, which is what keeps Σxy small — raw epoch seconds would
    overflow immediately)."""
    c = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.unix_micros("ts").alias("es"),
    )
    x = c.select(
        "event_type",
        "y",
        F.expr(
            "(es - min(es) OVER (PARTITION BY event_type)) div 3600000000"
        )
        .cast("long")
        .alias("xh"),
    )
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xh").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("xh") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("xh") * F.col("xh")).cast("long").alias("sxx"),
    )
    num = "(n * sxy - sx * sy)"
    den = "(n * sxx - sx * sx)"
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        F.expr(
            f"CAST(CASE WHEN {den} = 0 THEN 0 "
            f"WHEN {num} < 0 THEN "
            f"-((CAST(-{num} AS DECIMAL(38,0)) * 24000) div {den}) "
            f"ELSE (CAST({num} AS DECIMAL(38,0)) * 24000) div {den} "
            f"END AS BIGINT)"
        ).alias("slope_milli_cents_per_day"),
    )


@query(
    "events_dow_anomaly",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               dayofweek(CAST(ts AS DATE)) AS dow,
               event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    daily AS (
        SELECT day, dow, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS c
        FROM d GROUP BY 1, 2, 3
    ),
    base AS (
        SELECT dow, event_type,
               CAST(SUM(n) AS BIGINT) AS bn,
               CAST(SUM(c) AS BIGINT) AS bc,
               CAST(COUNT(*) AS BIGINT) AS bdays
        FROM daily GROUP BY 1, 2
    )
    SELECT daily.day, daily.event_type, daily.n, daily.c,
           CASE WHEN 5 * bdays * daily.c > 6 * bc THEN 'high'
                WHEN 5 * bdays * daily.c < 4 * bc THEN 'low'
                ELSE 'normal' END AS anomaly
    FROM daily JOIN base
      ON base.dow = daily.dow AND base.event_type = daily.event_type
    """,
)
def events_dow_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (day, type)'s spend is
    compared against the SAME-WEEKDAY baseline (total cents over all
    same-dow days), flagged high/low when outside ±20% of the per-day
    baseline mean. The ±20% test is cross-multiplied to integers
    (5·bdays·c vs 6·bc / 4·bc) so the keep/flag boundary is exact on
    both engines — no float division. Two hash aggregates (daily grain,
    then dow baseline — 7×5 rows, broadcast back); the weekday seasonal
    profile every ops dashboard needs."""
    d = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.dayofweek(F.to_date("ts")).alias("dow"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = d.groupBy("day", "dow", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("c"),
    )
    base = daily.groupBy("dow", "event_type").agg(
        F.sum("n").cast("long").alias("bn"),
        F.sum("c").cast("long").alias("bc"),
        F.count(F.lit(1)).cast("long").alias("bdays"),
    )
    return (
        daily.join(F.broadcast(base), ["dow", "event_type"])
        .select(
            "day",
            "event_type",
            "n",
            "c",
            F.expr(
                "CASE WHEN 5 * bdays * c > 6 * bc THEN 'high' "
                "WHEN 5 * bdays * c < 4 * bc THEN 'low' "
                "ELSE 'normal' END"
            ).alias("anomaly"),
        )
    )


@query(
    "events_incremental_rollup_verdict",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS incremental_matches_full
    FROM events
    """,
)
def events_incremental_rollup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance via the snapshot change-data feed
    (sources/snapshots.py + mergeable aggregation): commit the first ~20
    days of events as v0, append the rest as v1, then maintain the daily
    (day, type) rollup INCREMENTALLY — old rollup ⊎ rollup(CDF inserts),
    merged counter-wise — and pin it equal, row-for-row in exact cents,
    to a full recompute over v1. This is the composition a 100 TB gold
    tier runs nightly: the fact table is touched only for the delta, and
    additive aggregates merge losslessly (the same mergeability contract
    the HLL/CMS rows pin for sketches). n_days/n_events SQL-recomputed;
    the boolean pins against literal TRUE."""
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_diff,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    split = ev.agg(F.date_add(F.min("day"), 19).alias("s")).collect()[0].s
    spec = TableSpec("t.evsnap", _tempfile.mkdtemp(prefix="snap_ivm_") + "/t")
    snapshot_write(ev.filter(F.col("day") <= F.lit(split)), spec)
    snapshot_write(ev.filter(F.col("day") > F.lit(split)), spec, mode="append")

    def rollup(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        )

    old = rollup(snapshot_read(spark, spec, version=0))
    delta = rollup(
        snapshot_diff(spark, spec, 0, 1, keys=["event_id"]).filter(
            F.col("_change_type") == "insert"
        )
    )
    incr = (
        old.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("c").cast("long").alias("c"))
    )
    full = rollup(snapshot_read(spark, spec))
    mismatch = (
        incr.withColumnRenamed("n", "n_a")
        .withColumnRenamed("c", "c_a")
        .join(
            full.withColumnRenamed("n", "n_b").withColumnRenamed("c", "c_b"),
            ["day", "event_type"],
            "full_outer",
        )
        .agg(
            F.sum(
                F.when(
                    F.col("n_a").eqNullSafe(F.col("n_b"))
                    & F.col("c_a").eqNullSafe(F.col("c_b")),
                    0,
                ).otherwise(1)
            ).alias("m")
        )
    )
    totals = ev.agg(
        F.count_distinct("day").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return totals.crossJoin(F.broadcast(mismatch)).select(
        "n_days",
        "n_events",
        (F.coalesce(F.col("m"), F.lit(0)) == 0).alias("incremental_matches_full"),
    )


@query(
    "events_attribution_first_last",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    f AS (SELECT user_id, MIN(ts) AS first_ts FROM c GROUP BY 1),
    l AS (
        SELECT p.event_id, MAX(c.ts) AS last_ts
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
        GROUP BY 1
    )
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN f.first_ts <= p.ts THEN f.first_ts END AS first_click_ts,
           l.last_ts AS last_click_ts
    FROM p
    LEFT JOIN f ON f.user_id = p.user_id
    LEFT JOIN l ON l.event_id = p.event_id
    """,
)
def events_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution per purchase (the marketing-
    analytics staple): the user's earliest click overall (nulled when it
    postdates the purchase) and the latest click at-or-before the
    purchase. Last-touch rides the as-of operator in LEFT mode (one
    union-tag window shuffle on user_id — no per-purchase scan of the
    click history); first-touch is one per-user min aggregate joined
    back. Purchases with no prior click keep NULLs instead of dropping —
    unattributed conversions are a number analysts need."""
    from creatorops_lakehouse_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    last = asof_join(p, c, on="user_id", right_payload=[], how="left")
    f = c.groupBy("user_id").agg(F.min("ts").alias("_first_ts"))
    return (
        last.join(f, "user_id", "left")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(F.col("_first_ts") <= F.col("ts"), F.col("_first_ts")).alias(
                "first_click_ts"
            ),
            F.col("asof_ts").alias("last_click_ts"),
        )
    )


@query(
    "events_streaming_join_verdict",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.event_id
        FROM p JOIN c ON c.user_id = p.user_id
            AND c.ts <= p.ts
            AND c.ts >= p.ts - INTERVAL 30 MINUTE
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_purchases_matched,
           TRUE AS stream_matches_batch
    FROM j
    """,
)
def events_streaming_join_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join contract (§2.8's last uncovered slice): clicks
    and purchases replay as two independent file streams (each its own
    micro-batch cadence), inner-joined on user with an event-time bound
    (click within 30 minutes before the purchase) under watermarks on
    BOTH sides — Spark buffers each side's state until the watermark
    proves no more matches can arrive. The verdict pins the streamed
    match set equal to the batch interval join (match count + distinct
    purchases, SQL-recomputed by the oracle; boolean pinned TRUE).
    Inner stream-stream matches emit eagerly, so parity holds for any
    batching; the watermark governs state eviction, not emission."""
    import json as _json
    import os as _os
    import tempfile as _tempfile
    import uuid as _uuid

    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    ev = scoped_persist(
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_id", "user_id", "ts", "event_type")
    )
    _guard_stage_events(ev, "events_streaming_join_verdict")
    rows = ev.collect()  # bounded staging to CREATE the stream sources
    root = _tempfile.mkdtemp(prefix="stream_join_")
    dirs = {}
    for kind in ("purchase", "click"):
        d = _os.path.join(root, kind)
        _os.makedirs(d)
        dirs[kind] = d
        # two files per side -> multiple micro-batches on each stream
        for parity in (0, 1):
            path = _os.path.join(d, f"b{parity}.json")
            with open(path, "w") as f:
                for r in rows:
                    if r.event_type == kind and r.event_id % 2 == parity:
                        f.write(
                            _json.dumps(
                                {
                                    "event_id": r.event_id,
                                    "user_id": r.user_id,
                                    "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                                }
                            )
                            + "\n"
                        )
            _os.utime(path, (1700000000 + parity,) * 2)

    schema = "event_id long, user_id long, ts timestamp"

    def stream(kind, alias):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(dirs[kind])
            .withWatermark("ts", "1 hour")
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
            )
        )

    p, c = stream("purchase", "p"), stream("click", "c")
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("p_id", "c_id")
    name = f"sj_{_uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("stream-stream join did not finish")
    streamed = scoped_persist(spark.table(name))

    pb = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("u"), F.col("ts").alias("pt")
    )
    cb = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("u"), F.col("ts").alias("ct")
    )
    batch = pb.join(cb, "u").filter(
        (F.col("ct") <= F.col("pt"))
        & (F.col("ct") >= F.col("pt") - F.expr("INTERVAL 30 MINUTES"))
    ).select("p_id", "c_id")
    mismatch = (
        streamed.withColumn("_s", F.lit(1))
        .join(batch.withColumn("_b", F.lit(1)), ["p_id", "c_id"], "full_outer")
        .agg(
            F.sum(
                F.when(F.col("_s").isNull() | F.col("_b").isNull(), 1).otherwise(0)
            ).alias("m")
        )
    )
    totals = batch.agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.count_distinct("p_id").cast("long").alias("n_purchases_matched"),
    )
    return totals.crossJoin(F.broadcast(mismatch)).select(
        "n_matches",
        "n_purchases_matched",
        (F.coalesce(F.col("m"), F.lit(0)) == 0).alias("stream_matches_batch"),
    )


@query(
    "events_type_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    t AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_n FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type, t.n,
           CAST((1000000 * t.n) // r.row_n AS BIGINT) AS p_ppm
    FROM t JOIN r ON r.from_type = t.from_type
    """,
)
def events_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream (the sequence-model feature + journey diagnostic): consecutive
    event pairs under the (ts, event_id) total order, counted per
    (from, to) with row-normalized probabilities in exact ppm. One
    lead-window pass per user partition + two tiny aggregates — the
    5x5-ish matrix is dimension-sized at any corpus scale."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    t = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    r = t.groupBy("from_type").agg(F.sum("n").cast("long").alias("row_n"))
    return t.join(F.broadcast(r), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(1000000 * n) div row_n").cast("long").alias("p_ppm"),
    )


@query(
    "events_weekly_value_quantiles",
    oracle="""
    WITH c AS (
        SELECT date_trunc('week', ts) AS week_start, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT week_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(quantile_cont(cents, 0.5) * 2, 0) AS BIGINT)
               AS p50_half_cents,
           CAST(ROUND(quantile_cont(cents, 0.9) * 10, 0) AS BIGINT)
               AS p90_deci_cents
    FROM c GROUP BY 1, 2
    """,
)
def events_weekly_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly per-type value quantile trend — the time-series percentile
    panel ops dashboards plot. Exactness: linear-interpolated quantiles
    of integers have denominators dividing (n-1)'s interpolation grid —
    2 for p50 (k or k+.5) and 10 for p90 (tenths) — so 2x / 10x scaled
    units are integers up to the ~1e-10 binary error of the 0.9*(n-1)
    interpolation weight; an explicit ROUND(,0) on BOTH engines absorbs
    that ulp before the BIGINT cast (Spark casts truncate, DuckDB casts
    round — without the shared ROUND the engines disagree exactly at
    the .999.. artifacts). One
    grouped percentile pass; groups are (week x type)-cardinality."""
    c = load(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week_start"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return c.groupBy("week_start", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.percentile("cents", F.lit(0.5)) * 2, 0)
        .cast("long")
        .alias("p50_half_cents"),
        F.round(F.percentile("cents", F.lit(0.9)) * 10, 0)
        .cast("long")
        .alias("p90_deci_cents"),
    )


@query(
    "events_pit_purchase_features",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, ts, epoch_us(ts) AS eu,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COALESCE(SUM(h.cents), 0) AS BIGINT) AS spend_7d_cents,
           CAST(COUNT(h.event_id) AS BIGINT) AS n_events_7d,
           CAST((SELECT COUNT(*) FROM e h2
                 WHERE h2.user_id = p.user_id AND h2.eu < p.eu) AS BIGINT)
               AS n_events_prior
    FROM e p
    LEFT JOIN e h ON h.user_id = p.user_id
        AND h.eu < p.eu AND h.eu >= p.eu - CAST(604800000000 AS BIGINT)
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.eu
    """,
)
def events_pit_purchase_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join (the feature-store pattern that
    prevents label leakage): for every purchase label, the user's
    trailing-7-day spend and activity computed over events STRICTLY
    BEFORE the label timestamp (frame upper bound −1 microsecond — a
    same-instant event must not leak into its own features), plus the
    all-history prior event count. One window pass over the full stream
    per frame (no per-label self-join — the oracle's correlated form is
    the quadratic plan this operator exists to avoid), then filtered to
    the label rows."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("eu"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("eu")
        .rangeBetween(-7 * 86400 * 1_000_000, -1)
    )
    wall = (
        Window.partitionBy("user_id")
        .orderBy("eu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.sum("cents").over(w7), F.lit(0))
        .cast("long")
        .alias("spend_7d_cents"),
        F.count(F.lit(1)).over(w7).cast("long").alias("n_events_7d"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_events_prior"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "spend_7d_cents",
        "n_events_7d",
        "n_events_prior",
    )


N_NEGATIVES = 4


@query(
    "events_negative_samples",
    oracle=f"""
    WITH n AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM events
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id FROM events
        WHERE event_type = 'purchase'
    ),
    j AS (SELECT unnest(range(1, {N_NEGATIVES} + 1)) AS neg_rank)
    SELECT p.purchase_id, p.user_id, CAST(j.neg_rank AS INTEGER) AS neg_rank,
           CAST((p.user_id + 1 +
                 CAST('0x' || substr(sha256(p.purchase_id || ':' || j.neg_rank),
                                     1, 8) AS BIGINT) % (n.nu - 1)
                ) % n.nu AS BIGINT) AS neg_user_id
    FROM p CROSS JOIN j CROSS JOIN n
    """,
)
def events_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each purchase (positive user-item interaction) gets {N_NEGATIVES}
    pseudo-random negative users drawn by the engine-portable sha256
    recipe (operators/sampling.py::hash_bucket's construction) — offset
    ``1 + sha(purchase_id:j) mod (n_users-1)`` guarantees the negative
    can NEVER equal the positive user, and the draw is bit-reproducible
    across engines and runs (ablation-stable training sets; Spark's
    rand() is neither). One projection + a {N_NEGATIVES}-way explode —
    no shuffle; n_users rides as a broadcast scalar. User ids here are
    the dense 0..n-1 driver range; for sparse id spaces map through a
    dense index first."""
    ev = load(spark, sf_dir, "events")
    n = ev.agg(F.count_distinct("user_id").cast("long").alias("nu"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id"
    )
    j = F.explode(F.sequence(F.lit(1), F.lit(N_NEGATIVES))).alias("neg_rank")
    out = p.select("purchase_id", "user_id", j).crossJoin(F.broadcast(n))
    # raw 32-bit sha prefix (hash_bucket's construction without the
    # fixed modulus — the modulus here is the data-dependent nu-1)
    h = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.col("purchase_id").cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                ),
                256,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return out.select(
        "purchase_id",
        "user_id",
        F.col("neg_rank").cast("int").alias("neg_rank"),
        (
            (F.col("user_id") + 1 + h % (F.col("nu") - 1)) % F.col("nu")
        )
        .cast("long")
        .alias("neg_user_id"),
    )


@query(
    "events_forget_user_verdict",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN user_id = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_subject_rows,
           TRUE AS deleted_ok, TRUE AS history_gone_ok, TRUE AS others_intact
    FROM events
    """,
)
def events_forget_user_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten contract over the snapshot log (the
    governance workflow Delta documents as delete + VACUUM): commit the
    events table as v0, commit an erasure version v1 = v0 minus the data
    subject's rows (user_id 0), then vacuum history. Three pinned facts:

    - deleted_ok: the current version contains ZERO subject rows and
      exactly n_events - n_subject_rows total;
    - history_gone_ok: after vacuum_snapshots(keep_last=1) the
      pre-erasure version is unreadable AND its data directory is gone
      from disk — erasure is not erasure while time travel can resurrect
      the subject (the honest tension the snapshot log's immutability
      creates, resolved exactly as Delta resolves it: VACUUM past the
      retention horizon);
    - others_intact: every non-subject row survives byte-for-byte
      (count + cents checksum parity with the in-engine filter).
    """
    import os as _os
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_dirs,
        snapshot_read,
        snapshot_write,
        vacuum_snapshots,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    spec = TableSpec("t.forget", _tempfile.mkdtemp(prefix="snap_forget_") + "/t")
    snapshot_write(ev, spec)
    snapshot_write(ev.filter(F.col("user_id") != 0), spec, mode="overwrite")
    v0_dirs = snapshot_dirs(spec, 0)
    deleted = vacuum_snapshots(spec, keep_last=1)
    v0_dir_gone = not any(_os.path.isdir(d) for d in v0_dirs)
    v0_unreadable = False
    try:
        snapshot_read(spark, spec, version=0)
    except ValueError:
        v0_unreadable = True
    history_gone = bool(deleted) and v0_dir_gone and v0_unreadable

    cur = scoped_persist(snapshot_read(spark, spec))
    cur_stats = cur.agg(
        F.count(F.lit(1)).cast("long").alias("_n_cur"),
        F.sum(F.when(F.col("user_id") == 0, 1).otherwise(0)).alias("_n_subj_cur"),
        F.sum("cents").cast("long").alias("_c_cur"),
    )
    want = ev.filter(F.col("user_id") != 0).agg(
        F.count(F.lit(1)).cast("long").alias("_n_want"),
        F.sum("cents").cast("long").alias("_c_want"),
    )
    totals = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("user_id") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_subject_rows"),
    )
    return (
        totals.crossJoin(F.broadcast(cur_stats))
        .crossJoin(F.broadcast(want))
        .select(
            "n_events",
            "n_subject_rows",
            (
                (F.col("_n_subj_cur") == 0)
                & (F.col("_n_cur") == F.col("n_events") - F.col("n_subject_rows"))
            ).alias("deleted_ok"),
            F.lit(history_gone).alias("history_gone_ok"),
            (
                (F.col("_n_cur") == F.col("_n_want"))
                & F.col("_c_cur").eqNullSafe(F.col("_c_want"))
            ).alias("others_intact"),
        )
    )


@query(
    "events_key_skew_report",
    oracle="""
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
           CAST((MAX(cnt) * 10000) // SUM(cnt) AS BIGINT) AS top1_share_bp,
           CAST((MAX(cnt) * COUNT(*) * 100) // SUM(cnt) AS BIGINT)
               AS max_over_avg_pct,
           CAST(ROUND(quantile_cont(cnt, 0.5) * 2, 0) AS BIGINT)
               AS p50_key_rows_x2,
           CAST(ROUND(quantile_cont(cnt, 0.99) * 100, 0) AS BIGINT)
               AS p99_key_rows_x100
    FROM per_key
    """,
)
def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics over the events fact's join/agg key
    (user_id): key cardinality, heaviest-key share (basis points), max/avg
    ratio, and exact p50/p99 of per-key row counts.

    This is the pre-flight a 100 TB pipeline runs BEFORE a user-keyed
    join/groupBy to decide between plain hash partitioning, AQE skew-join,
    and explicit salting (operators/skew.py) — a top1_share_bp in the
    hundreds means one reducer owns whole percents of the fact table and
    the salted path should be taken. Two aggregations, both key-bounded:
    the per-key count is one map-side-combined shuffle on user_id; the
    stats pass reduces the key-cardinality table to one row. All ratios in
    exact integer arithmetic (floor div on both engines); quantiles follow
    the shared-ROUND scaled-integer convention of
    events_weekly_value_quantiles (denominators 2 and 100 cover the
    0.5/0.99 interpolation grids).
    """
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.expr("(MAX(cnt) * 10000) div SUM(cnt)").alias("top1_share_bp"),
        F.expr("(MAX(cnt) * COUNT(*) * 100) div SUM(cnt)").alias(
            "max_over_avg_pct"
        ),
        F.round(F.percentile("cnt", F.lit(0.5)) * 2, 0)
        .cast("long")
        .alias("p50_key_rows_x2"),
        F.round(F.percentile("cnt", F.lit(0.99)) * 100, 0)
        .cast("long")
        .alias("p99_key_rows_x100"),
    )


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH c AS (
        SELECT event_id, event_type, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    stats AS (
        SELECT event_type, COUNT(*) AS n_t, SUM(cents) AS sum_t
        FROM c GROUP BY 1
    ),
    dev AS (
        SELECT c.event_id, c.event_type, c.ts, s.n_t,
               c.cents * s.n_t - s.sum_t AS dev_scaled
        FROM c JOIN stats s USING (event_type)
    ),
    cusum AS (
        SELECT event_id, event_type, ts, n_t,
               CAST(SUM(dev_scaled) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cs
        FROM dev
    ),
    ranked AS (
        SELECT event_type, CAST(n_t AS BIGINT) AS n_events,
               abs(cs) AS abs_cusum, event_id, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(cs) DESC, ts ASC, event_id ASC
               ) AS rn
        FROM cusum
    )
    SELECT event_type, n_events,
           CAST(abs_cusum AS BIGINT) AS max_abs_cusum_scaled,
           event_id AS changepoint_event_id,
           ts AS changepoint_ts
    FROM ranked WHERE rn = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint candidate per event type: the position where the
    running sum of (value − type mean) deviations peaks in magnitude — the
    classic level-shift detector, complementing the pointwise
    events_value_outliers_3sigma (spikes) and calendar-relative
    events_dow_anomaly (seasonality breaks).

    Exactness: deviations are scaled by n_t (dev = cents·n_t − sum_t) so
    the mean subtraction never leaves int64 — no floats anywhere, both
    engines agree bit-for-bit. Magnitude bound: |CUSUM| ≤ n_t²·max_cents,
    inside int64 through ~3·10⁷ rows per type at 10⁴ max cents; beyond
    that the same expression runs in DECIMAL(38,0) on both engines (Spark
    and DuckDB both support it) — swap the two CASTs.

    Scale shape: one broadcast-joined stats pass, then a PARTITIONED
    running window (event_type is the partition key) and a per-type
    argmax window — no global window, no single-partition funnel. Ties at
    the peak break deterministically by (ts, event_id)."""
    c = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"), F.sum("cents").alias("sum_t")
    )
    dev = c.join(F.broadcast(stats), on="event_type").withColumn(
        "dev_scaled", F.col("cents") * F.col("n_t") - F.col("sum_t")
    )
    run = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = dev.withColumn("cs", F.sum("dev_scaled").over(run).cast("long"))
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cs")).desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        cusum.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_t").cast("long").alias("n_events"),
            F.abs(F.col("cs")).alias("max_abs_cusum_scaled"),
            F.col("event_id").alias("changepoint_event_id"),
            F.col("ts").alias("changepoint_ts"),
        )
    )


@query(
    "events_grouping_sets_summary",
    oracle="""
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           GROUPING(event_type) * 2
               + GROUPING(strftime(CAST(ts AS DATE), '%Y-%m-%d'))
               AS grouping_mask,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY GROUPING SETS ((event_type), (strftime(CAST(ts AS DATE), '%Y-%m-%d')),
                            (event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')), ())
    """,
)
def events_grouping_sets_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a grouping_id mask — completes the
    multi-granularity aggregation trio next to
    nation_rollup_order_stats (ROLLUP) and lineitem_cube_returnflag_status
    (CUBE), covering the case where the wanted granularities are an
    arbitrary subset, not a lattice prefix. Runs through the spark.sql
    entry path (Catalyst expands the sets into one Expand + single
    aggregate — one shuffle, not one scan per set; that expansion IS the
    scale argument vs unioning four groupBys).

    The mask is built from per-column GROUPING() bits (not grouping_id())
    so the bit order is pinned identically on both engines; the day key is
    grouped as a yyyy-MM-dd STRING so the NULLed-out slots of non-day sets
    normalize identically (a DATE column with grouping NULLs lands as
    datetime64-with-NaT in one engine's pandas frame and object-with-None
    in the other's)."""
    load(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).createOrReplaceTempView("_ev_gs")
    return spark.sql(
        """
        SELECT event_type,
               date_format(ts, 'yyyy-MM-dd') AS day,
               GROUPING(event_type) * 2
                   + GROUPING(date_format(ts, 'yyyy-MM-dd'))
                   AS grouping_mask,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM _ev_gs
        GROUP BY GROUPING SETS ((event_type), (date_format(ts, 'yyyy-MM-dd')),
                                (event_type, date_format(ts, 'yyyy-MM-dd')), ())
        """
    )


@query(
    "events_snapshot_skipping_verdict",
    oracle="""
    WITH b AS (
        SELECT LEAST(user_id // 5, 3) AS band,
               user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    )
    SELECT (SELECT CAST(COUNT(DISTINCT band) AS BIGINT) FROM b) AS n_commits,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           TRUE AS pruned_ok, TRUE AS exact_ok
    FROM b WHERE user_id BETWEEN 5 AND 9
    """,
)
def events_snapshot_skipping_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats data skipping under the driver hash gate (the
    snapshot analogue of Delta's per-file stats): commit the events table
    as one snapshot append per disjoint user_id band, then pruned-read the
    [5, 9] range. Pins:

    - pruned_ok: the planner kept EXACTLY the one band commit whose
      min/max intersects the range and skipped every other commit —
      manifest stats, not file footers, did the skipping;
    - exact_ok: the pruned read's row count and cents checksum equal the
      direct in-engine filter (pruning changed I/O only, never semantics);
    - n_rows / sum_cents hash-check the pruned read's content against the
      oracle's independent recomputation.

    Eager verdict harness (excluded from bench like all *_verdict rows);
    scratch snapshot tree deleted before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_read_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.least(F.expr("user_id div 5"), F.lit(3)).alias("band"),
        )
    )
    bands = sorted(r[0] for r in ev.select("band").distinct().collect())
    root = _tempfile.mkdtemp(prefix="snap_skip_")
    try:
        spec = TableSpec("t.skip", root + "/t")
        for b in bands:
            snapshot_write(ev.filter(F.col("band") == b).drop("band"), spec)
        kept, skipped = pruned_dirs(spec, {"user_id": (5, 9)})
        pr = snapshot_read_where(spark, spec, {"user_id": (5, 9)}).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        direct = ev.filter(F.col("user_id").between(5, 9)).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    pruned_ok = len(kept) == 1 and len(skipped) == len(bands) - 1
    exact_ok = pr["n"] == direct["n"] and (pr["c"] or 0) == (direct["c"] or 0)
    return spark.createDataFrame(
        [(len(bands), pr["n"], pr["c"], pruned_ok, exact_ok)],
        "n_commits long, n_rows long, sum_cents long, "
        "pruned_ok boolean, exact_ok boolean",
    )


@query(
    "events_snapshot_bloom_verdict",
    oracle="""
    WITH p AS (SELECT event_id FROM events ORDER BY event_id LIMIT 8),
         e AS (
        SELECT event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    )
    SELECT (SELECT CAST(COUNT(DISTINCT user_id % 4) AS BIGINT) FROM events)
               AS n_commits,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_probes,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           TRUE AS no_false_negatives,
           TRUE AS fp_within_bound,
           TRUE AS exact_ok
    FROM e WHERE event_id IN (SELECT event_id FROM p)
    """,
)
def events_snapshot_bloom_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping under the driver hash gate — the
    point-lookup case min/max stats CANNOT serve: commit events as one
    snapshot append per ``user_id % 4`` band (event_ids interleave across
    bands, so every band's event_id min/max envelope overlaps every
    other's and range stats keep all dirs), each append indexed with
    ``bloom_for=("event_id",)``. Probe the 8 smallest event_ids and pin:

    - no_false_negatives: every probe's TRUE band dir was kept — the
      bloom's hard guarantee; a miss here is a correctness bug, not
      tuning;
    - fp_within_bound: across 8 probes × 3 foreign bands, at most 4
      false-positive keeps (fpp 0.001 sized on the commit row count
      makes even 1 unlikely; 5+ is a broken filter, not bad luck);
    - exact_ok: the pruned equality reads' row count and cents checksum
      equal the direct in-engine filter (pruning changed I/O, never
      semantics);
    - n_rows / sum_cents hash-check the probed rows against the oracle's
      independent recomputation over the raw file.

    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        pruned_dirs,
        snapshot_dirs,
        snapshot_read_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.pmod(F.col("user_id"), F.lit(4)).alias("band"),
        )
    )
    bands = sorted(r[0] for r in ev.select("band").distinct().collect())
    probes = [
        (r["event_id"], r["band"])
        for r in ev.select("event_id", "band")
        .orderBy("event_id")
        .limit(8)
        .collect()
    ]
    root = _tempfile.mkdtemp(prefix="snap_bloom_")
    try:
        spec = TableSpec("t.bloom", root + "/t")
        band_dir: dict[int, str] = {}
        seen: set[str] = set()
        for b in bands:
            # cap raised to 2^21 bits so the filter stays under target
            # fpp through sf0.1 band sizes (~75k rows -> optimal m ≈ 1.1M
            # bits); the default cap is sized for <=~9k-row commits
            v = snapshot_write(
                ev.filter(F.col("band") == b).drop("band"),
                spec,
                bloom_for=("event_id",),
                bloom_max_bits=1 << 21,
            )
            new = set(snapshot_dirs(spec, v)) - seen
            seen |= new
            band_dir[b] = new.pop()
        no_fn, fp_keeps = True, 0
        n_rows, sum_cents = 0, 0
        for eid, band in probes:
            kept, _ = pruned_dirs(spec, {"event_id": (eid, eid)})
            kept_abs = {_os_join(spec.path, d) for d in kept}
            if band_dir[band] not in kept_abs:
                no_fn = False
            fp_keeps += len(kept_abs - {band_dir[band]})
            got = (
                snapshot_read_where(spark, spec, {"event_id": (eid, eid)})
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("cents").cast("long").alias("c"),
                )
                .collect()[0]
            )
            n_rows += got["n"]
            sum_cents += got["c"] or 0
        direct = ev.filter(
            F.col("event_id").isin([e for e, _ in probes])
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    exact_ok = n_rows == direct["n"] and sum_cents == (direct["c"] or 0)
    return spark.createDataFrame(
        [
            (
                len(bands),
                len(probes),
                n_rows,
                sum_cents,
                no_fn,
                fp_keeps <= 4,
                exact_ok,
            )
        ],
        "n_commits long, n_probes long, n_rows long, sum_cents long, "
        "no_false_negatives boolean, fp_within_bound boolean, "
        "exact_ok boolean",
    )


def _os_join(*parts: str) -> str:
    import os as _os

    return _os.path.join(*parts)


@query(
    "events_snapshot_dv_verdict",
    oracle="""
    WITH b AS (
        SELECT LEAST(user_id // 5, 3) AS band,
               user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    )
    SELECT (SELECT CAST(COUNT(DISTINCT band) AS BIGINT) FROM b) AS n_commits,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           TRUE AS no_rewrite_ok, TRUE AS count_ok, TRUE AS purge_ok
    FROM b WHERE user_id NOT BETWEEN 5 AND 9
    """,
)
def events_snapshot_dv_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE (deletion vectors) under the driver hash gate:
    commit events as one snapshot append per disjoint user_id band, then
    ``snapshot_delete_where(..., rewrite=False)`` over the [5, 9] band and
    pin:

    - no_rewrite_ok: the post-delete manifest references the EXACT same
      data dirs as the pre-delete head — the delete was metadata-only
      (at 100 TB: one manifest write, not a band rewrite);
    - count_ok: ``snapshot_count`` answers the post-delete COUNT(*) from
      the manifest alone (the vector records its exact cardinality) and
      equals the scan count;
    - purge_ok: ``purge_deletes`` materializes the vector — the affected
      band's dir rewrites, every other band's dir carries byte-identical,
      the vector is gone, and the content checksum is unchanged;
    - n_rows / sum_cents hash-check the DV-filtered read against the
      oracle's independent recomputation over the raw file.

    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        purge_deletes,
        snapshot_count,
        snapshot_delete_where,
        snapshot_dirs,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.least(F.expr("user_id div 5"), F.lit(3)).alias("band"),
        )
    )
    bands = sorted(r[0] for r in ev.select("band").distinct().collect())
    root = _tempfile.mkdtemp(prefix="snap_dv_")
    try:
        spec = TableSpec("t.dv", root + "/t")
        for b in bands:
            snapshot_write(ev.filter(F.col("band") == b).drop("band"), spec)
        pre_v = len(bands) - 1
        pre_dirs = set(snapshot_dirs(spec, pre_v))

        v = snapshot_delete_where(
            spark, spec, {"user_id": (5, 9)}, rewrite=False
        )
        no_rewrite_ok = set(snapshot_dirs(spec, v)) == pre_dirs
        head = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        count_ok = snapshot_count(spec) == head["n"]

        pv = purge_deletes(spark, spec)
        post_dirs = set(snapshot_dirs(spec, pv))
        band1 = snapshot_dirs(spec, 1)[-1]  # band-1's own commit dir
        purged = snapshot_read(spark, spec).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        purge_ok = (
            band1 not in post_dirs
            and (pre_dirs - {band1}) <= post_dirs
            and (purged["n"], purged["c"]) == (head["n"], head["c"])
            and snapshot_count(spec) == head["n"]
        )
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                len(bands),
                head["n"],
                head["c"],
                bool(no_rewrite_ok),
                bool(count_ok),
                bool(purge_ok),
            )
        ],
        "n_commits long, n_rows long, sum_cents long, "
        "no_rewrite_ok boolean, count_ok boolean, purge_ok boolean",
    )


@query(
    "events_snapshot_transform_verdict",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           TRUE AS hive_pruned_ok, TRUE AS hidden_ok
    FROM events
    WHERE ts >= (SELECT MIN(ts) FROM events)
      AND ts < (SELECT MIN(ts) FROM events) + INTERVAL 3 DAY
    """,
)
def events_snapshot_transform_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning (Iceberg-style partition transforms) under the
    driver hash gate: commit events into a snapshot table partitioned by
    ``days(ts)`` — a transform column the schema never shows — then read
    the first three days back through ``snapshot_read_where`` and pin:

    - hive_pruned_ok: the scan carries a PARTITION filter on the hidden
      day column (directory pruning, not a row filter — the predicate
      was mapped from the ts range onto ``_p_days_ts``);
    - hidden_ok: neither the head read nor the pruned read surfaces the
      hidden column (readers see the logical schema only);
    - n_rows / sum_cents / n_days hash-check the pruned read against the
      oracle's recomputation over the raw file.

    Eager verdict harness (excluded from bench); scratch tree deleted
    before returning a literal frame.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_read,
        snapshot_read_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    t0 = ev.agg(F.min("ts")).collect()[0][0]
    hi = t0 + __import__("datetime").timedelta(days=3)
    root = _tempfile.mkdtemp(prefix="snap_tr_")
    try:
        spec = TableSpec(
            "t.transform", root + "/t", partition_by=("days(ts)",)
        )
        snapshot_write(ev, spec)
        head_cols = snapshot_read(spark, spec).columns
        pruned = snapshot_read_where(spark, spec, {"ts": (t0, None)}).filter(
            F.col("ts") < F.lit(hi)
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        hive_pruned_ok = bool(pf) and "_p_days_ts" in pf[0]
        hidden_ok = (
            head_cols == ["event_id", "ts", "cents"]
            and pruned.columns == ["event_id", "ts", "cents"]
        )
        got = pruned.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
            F.countDistinct(F.to_date("ts")).cast("long").alias("d"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(got["n"], got["c"], got["d"], bool(hive_pruned_ok), bool(hidden_ok))],
        "n_rows long, sum_cents long, n_days long, "
        "hive_pruned_ok boolean, hidden_ok boolean",
    )


@query(
    "events_streaming_session_verdict",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, cents,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ),
    s AS (
        SELECT user_id,
               MIN(ts) AS st,
               MAX(ts) AS last_ts,
               MAX(ts) + INTERVAL 30 MINUTE AS en,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS c
        FROM sess GROUP BY user_id, session_id
    ),
    bounds AS (
        -- Spark tracks watermarks at MILLISECOND precision: the eviction
        -- boundary is the max event time floored to ms, not the raw
        -- microsecond max (a session ending inside that sub-ms sliver
        -- stays open in streaming)
        SELECT make_timestamp(epoch_ms(MAX(ts)) * 1000) AS wm,
               MIN(CAST(ts AS DATE)) AS d0
        FROM events
    ),
    closed AS (SELECT s.* FROM s, bounds WHERE s.en <= bounds.wm)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM closed) AS n_sessions_closed,
           (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM closed)
               AS n_events_closed,
           (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM closed)
               AS sum_cents_closed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM closed, bounds
            WHERE LEAST(CAST((CAST(st AS DATE) - d0) AS BIGINT) // 12, 2)
                  <> LEAST(CAST((CAST(last_ts AS DATE) - d0) AS BIGINT) // 12, 2))
               AS cross_batch_sessions,
           TRUE AS append_matches_batch
    """,
)
def events_streaming_session_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows under watermarks (§2.8 — the stateful
    MERGING-window operator, stronger than tumbling: session state must
    merge across micro-batches before it can close). The events table is
    staged as three TIME-ORDERED json files (days [0,12), [12,24), rest —
    no late rows, so every batch-boundary effect is merge, not eviction)
    and replayed through real Structured Streaming (readStream →
    maxFilesPerTrigger=1 → availableNow → append mode → memory sink) with
    the same 30-minute session_window gap the batch query uses. Pins:

    - n_sessions_closed / n_events_closed / sum_cents_closed: read from
      the STREAMING append output and hash-checked against the oracle's
      lag+cumsum sessionization (closed = session_end <= the final
      watermark = global max event time FLOORED TO MILLISECONDS — Spark
      tracks watermarks at ms precision; session_end includes the gap);
    - cross_batch_sessions: sessions whose first and last event landed in
      DIFFERENT replay files — each one correct only if cross-batch state
      merging worked (oracle recomputes it from the same day-bucket cut;
      an observable, not a pinned minimum — its value is corpus-density-
      dependent and both engines must agree on it exactly);
    - append_matches_batch: the append emission equals the batch
      session_window aggregate restricted to closed sessions, row-for-row
      (full-outer compare on key + counts + exact cents).
    """
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    import uuid as _uuid

    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    _guard_stage_events(ev, "events_streaming_session_verdict")
    rows = ev.collect()  # bounded staging to CREATE a stream source
    d0 = min(r.ts.date() for r in rows)

    def bucket(d):
        return min((d - d0).days // 12, 2)

    root = _tempfile.mkdtemp(prefix="stream_session_")
    src = _os.path.join(root, "src")
    _os.makedirs(src)
    try:
        for i in range(3):
            path = _os.path.join(src, f"b{i}.json")
            with open(path, "w") as f:
                for r in rows:
                    if bucket(r.ts.date()) == i:
                        f.write(
                            _json.dumps(
                                {
                                    "user_id": r.user_id,
                                    "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                                    "cents": r.cents,
                                }
                            )
                            + "\n"
                        )
            _os.utime(path, (1700000000 + i, 1700000000 + i))

        def sessionized(df):
            return (
                df.groupBy(
                    F.session_window("ts", "30 minutes").alias("w"),
                    F.col("user_id"),
                )
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("cents").cast("long").alias("c"),
                )
                .select(
                    "user_id",
                    F.col("w.start").alias("st"),
                    F.col("w.end").alias("en"),
                    "n",
                    "c",
                )
            )

        tag = _uuid.uuid4().hex[:8]
        reader = (
            spark.readStream.schema("user_id long, ts timestamp, cents long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            sessionized(reader.withWatermark("ts", "0 seconds"))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"sess_{tag}")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming session query did not finish")
        streamed = scoped_persist(spark.table(f"sess_{tag}"))

        # ms-floored max event time — Spark's watermark precision (see the
        # oracle's bounds CTE)
        wm = ev.agg(
            F.timestamp_millis(F.unix_millis(F.max("ts"))).alias("wm")
        ).collect()[0][0]
        # localCheckpoint BARRIER before filtering on session columns:
        # Spark's optimizer (observed on 4.1.2) pushes a predicate on the
        # session window's end THROUGH the merging aggregate, rewriting it
        # against each row's INITIAL [ts, ts+gap) window — which silently
        # drops late session members pre-merge and emits truncated
        # sessions (a single event whose successor fell past the pushed
        # bound came back as its own closed session). Unsound for MERGING
        # windows; the barrier forces the filter to run on the final
        # merged sessions.
        batch_closed = scoped_persist(
            sessionized(ev)
            .localCheckpoint(eager=True)
            .filter(F.col("en") <= F.lit(wm))
        )
        mism = (
            streamed.withColumnRenamed("n", "n_s")
            .withColumnRenamed("c", "c_s")
            .join(
                batch_closed.withColumnRenamed("n", "n_b").withColumnRenamed(
                    "c", "c_b"
                ),
                ["user_id", "st", "en"],
                "full_outer",
            )
            .filter(
                F.col("n_s").isNull()
                | F.col("n_b").isNull()
                | (F.col("n_s") != F.col("n_b"))
                | (F.col("c_s") != F.col("c_b"))
            )
            .count()
        )
        stats = streamed.agg(
            F.count(F.lit(1)).cast("long").alias("ns"),
            F.sum("n").cast("long").alias("ne"),
            F.sum("c").cast("long").alias("cc"),
        ).collect()[0]
        # sessions whose first/last event fall in different replay files —
        # recomputed from the batch aggregate (st is the first event time;
        # en - 30min is the last event time)
        last_ts = F.col("en") - F.expr("INTERVAL 30 MINUTES")
        bucket_col = lambda c: F.least(  # noqa: E731
            F.floor(F.datediff(c.cast("date"), F.lit(d0)) / 12), F.lit(2)
        )
        cross = batch_closed.filter(
            bucket_col(F.col("st")) != bucket_col(last_ts)
        ).count()
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(stats["ns"], stats["ne"] or 0, stats["cc"] or 0, cross, mism == 0)],
        "n_sessions_closed long, n_events_closed long, "
        "sum_cents_closed long, cross_batch_sessions long, "
        "append_matches_batch boolean",
    )


@query(
    "events_streaming_exactly_once_verdict",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(3 AS BIGINT) AS n_commits,
           TRUE AS exact_ok,
           TRUE AS restart_noop_ok,
           TRUE AS redelivery_noop_ok
    FROM events
    """,
)
def events_streaming_exactly_once_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-once streaming ingestion contract (Delta's txnAppId/
    txnVersion sink pattern on the snapshot log,
    streaming/pipeline.py::start_exactly_once_sink): the events table is
    staged as three JSON files and replayed through a REAL Structured
    Streaming query (readStream → maxFilesPerTrigger=1 → availableNow →
    foreachBatch snapshot_write_txn), then attacked with both redelivery
    modes foreachBatch's at-least-once contract allows. Hash-pinned facts:

    - n_events / sum_cents: the snapshot table's final content equals the
      staged corpus exactly (count + cents checksum recomputed by the
      oracle from the raw parquet);
    - n_commits: exactly one snapshot version per micro-batch — no batch
      committed twice, none skipped;
    - exact_ok: row-level full-outer anti-join between table and staged
      corpus finds zero mismatches (not just matching aggregates);
    - restart_noop_ok: re-running the whole stream over the same
      checkpoint (no new input) leaves version and content unchanged;
    - redelivery_noop_ok: re-invoking the sink body out-of-band for every
      already-committed batch id (the crash-between-sink-write-and-
      checkpoint-commit replay) is a no-op — the txns watermark, not the
      checkpoint, is what holds the exactly-once line.
    """
    import json as _json
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        current_version,
        last_txn_version,
        snapshot_read,
        snapshot_write_txn,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec
    from creatorops_lakehouse_spark.streaming.pipeline import (
        start_exactly_once_sink,
    )

    ev = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
    )
    _guard_stage_events(ev, "events_streaming_exactly_once_verdict")
    rows = ev.collect()  # bounded staging to CREATE a stream source
    root = _tempfile.mkdtemp(prefix="stream_e1x_")
    src = _os.path.join(root, "src")
    _os.makedirs(src)
    n_batches = 3
    batch_rows: list[list] = [[] for _ in range(n_batches)]
    for r in rows:
        batch_rows[r.event_id % n_batches].append(r)
    try:
        for i, batch in enumerate(batch_rows):
            path = _os.path.join(src, f"b{i}.json")
            with open(path, "w") as f:
                for r in batch:
                    f.write(
                        _json.dumps({"event_id": r.event_id, "cents": r.cents})
                        + "\n"
                    )
            _os.utime(path, (1700000000 + i, 1700000000 + i))

        spec = TableSpec("t.e1x", _os.path.join(root, "t"))
        ckpt = _os.path.join(root, "ckpt")

        def run() -> None:
            stream = (
                spark.readStream.schema("event_id long, cents long")
                .option("maxFilesPerTrigger", 1)
                .json(src)
            )
            q = start_exactly_once_sink(stream, spec, ckpt, app_id="e1x")
            if not q.awaitTermination(300):  # hang backstop only
                q.stop()
                raise TimeoutError("exactly-once sink stream did not finish")

        run()
        v_first = current_version(spec)
        n_commits = (v_first or 0) + 1
        run()  # checkpoint restart with no new input
        restart_noop = current_version(spec) == v_first
        for bid, batch in enumerate(batch_rows):  # crash redelivery
            snapshot_write_txn(
                spark.createDataFrame(
                    [(r.event_id, r.cents) for r in batch],
                    "event_id long, cents long",
                ),
                spec,
                app_id="e1x",
                txn_version=bid,
            )
        redelivery_noop = (
            current_version(spec) == v_first
            and last_txn_version(spec, "e1x") == n_batches - 1
        )
        got = scoped_persist(snapshot_read(spark, spec))
        mism = (
            got.withColumnRenamed("cents", "c_a")
            .join(ev.withColumnRenamed("cents", "c_b"), "event_id", "full_outer")
            .agg(
                F.sum(
                    F.when(F.col("c_a").eqNullSafe(F.col("c_b")), 0).otherwise(1)
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        stats = got.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                stats["n"],
                stats["c"],
                n_commits,
                mism == 0,
                bool(restart_noop),
                bool(redelivery_noop),
            )
        ],
        "n_events long, sum_cents long, n_commits long, exact_ok boolean, "
        "restart_noop_ok boolean, redelivery_noop_ok boolean",
    )


@query(
    "events_stateful_transitions_verdict",
    oracle="""
    WITH e AS (
        SELECT CAST(user_id % 10 AS VARCHAR) AS tenant_id,
               CAST(user_id AS VARCHAR) AS story_id,
               event_type AS stage,
               epoch_us(ts) AS ts_micros,
               event_id
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL
    ),
    d AS (
        SELECT tenant_id, story_id, stage, ts_micros FROM (
            SELECT e.*, ROW_NUMBER() OVER (
                PARTITION BY tenant_id, story_id, ts_micros
                ORDER BY event_id) AS rn
            FROM e
        ) WHERE rn = 1
    ),
    t AS (
        SELECT stage,
               LEAD(stage) OVER w AS next_stage,
               LEAD(ts_micros) OVER w - ts_micros AS dur
        FROM d
        WINDOW w AS (PARTITION BY tenant_id, story_id ORDER BY ts_micros)
    )
    SELECT stage, next_stage,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(dur) AS BIGINT) AS sum_duration_micros,
           TRUE AS stream_matches_batch_lead
    FROM t WHERE next_stage IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_stateful_transitions_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle-checkable contract for the CUSTOM STATEFUL streaming operator
    (streaming/stateful.py::streaming_stage_transitions_gs — keyed
    applyInPandasWithState stage transitions; VERDICT r7 item 4: the one
    streaming form that was pytest-only). Same harness pattern as
    events_streaming_window_verdict: events become per-story stage
    sequences (key = user, stage = event_type, deduped to one event per
    key+instant so ordering is unambiguous), staged as THREE mtime-ordered
    JSON files split by global time terciles — so each key's events arrive
    in event-time order but split ACROSS micro-batches, which is exactly
    what forces the operator to carry (last stage, last ts) in GroupState
    between batches — and replayed through real Structured Streaming
    (readStream json → maxFilesPerTrigger=1 → availableNow → memory sink).

    Hash-checked facts: the (stage → next_stage) transition matrix with
    exact microsecond duration sums, built FROM THE STREAM'S OUTPUT and
    recomputed independently by the DuckDB oracle as a lead() window over
    the same deduped input; plus stream_matches_batch_lead — an in-engine
    full-outer compare of the stream's full (key, stage, next_stage,
    duration) multiset against the batch lead() recompute (the
    sequential-batch equivalence the driver hash pins).
    """
    import json as _json
    import os as _os
    import tempfile as _tempfile
    import uuid as _uuid

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.streaming.stateful import (
        streaming_stage_transitions_gs,
    )

    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            (F.col("user_id") % 10).cast("string").alias("tenant_id"),
            F.col("user_id").cast("string").alias("story_id"),
            F.col("event_type").alias("stage"),
            "ts",
            "event_id",
        )
    )
    w_dedup = Window.partitionBy("tenant_id", "story_id", "ts").orderBy(
        "event_id"
    )
    deduped = (
        ev.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "event_id")
    )
    # bounded staging to CREATE a stream source (the sanctioned verdict
    # pattern — production ingests a live stream, the verdict must
    # manufacture one deterministically)
    rows = scoped_persist(deduped).collect()
    lo = min(r.ts for r in rows)
    hi = max(r.ts for r in rows)
    t1 = lo + (hi - lo) / 3
    t2 = lo + 2 * (hi - lo) / 3
    root = _tempfile.mkdtemp(prefix="stream_stateful_")
    src = _os.path.join(root, "src")
    _os.makedirs(src)
    batches = (
        ("b0", lambda r: r.ts <= t1),
        ("b1", lambda r: t1 < r.ts <= t2),
        ("b2", lambda r: r.ts > t2),
    )
    for i, (name, pred) in enumerate(batches):
        path = _os.path.join(src, f"{name}.json")
        with open(path, "w") as f:
            for r in rows:
                if pred(r):
                    f.write(
                        _json.dumps(
                            {
                                "tenant_id": r.tenant_id,
                                "story_id": r.story_id,
                                "stage": r.stage,
                                "occurred_at": r.ts.strftime(
                                    "%Y-%m-%d %H:%M:%S.%f"
                                ),
                            }
                        )
                        + "\n"
                    )
        _os.utime(path, (1700000000 + i, 1700000000 + i))

    schema = (
        "tenant_id string, story_id string, stage string, "
        "occurred_at timestamp"
    )
    reader = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    name = f"stateful_{_uuid.uuid4().hex[:8]}"
    q = (
        streaming_stage_transitions_gs(reader)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):  # hang backstop only
        q.stop()
        raise TimeoutError("stateful transition stream did not finish")
    stream = scoped_persist(
        spark.table(name).select(
            "tenant_id",
            "story_id",
            "stage",
            "next_stage",
            F.round(F.col("duration_seconds") * 1e6).cast("long").alias("dur"),
        )
    )

    keyed = deduped.select(
        "tenant_id", "story_id", "stage", F.unix_micros("ts").alias("m")
    )
    wk = Window.partitionBy("tenant_id", "story_id").orderBy("m")
    batch = (
        keyed.withColumn("next_stage", F.lead("stage").over(wk))
        .withColumn("dur", (F.lead("m").over(wk) - F.col("m")).cast("long"))
        .filter(F.col("next_stage").isNotNull())
        .select("tenant_id", "story_id", "stage", "next_stage", "dur")
    )
    keys = ["tenant_id", "story_id", "stage", "next_stage", "dur"]
    mism = (
        stream.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_s"))
        .join(
            batch.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_b")),
            keys,
            "full_outer",
        )
        .agg(
            F.sum(
                F.when(F.col("n_s").eqNullSafe(F.col("n_b")), 0).otherwise(1)
            ).alias("m")
        )
    )
    return (
        stream.groupBy("stage", "next_stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.sum("dur").cast("long").alias("sum_duration_micros"),
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "stage",
            "next_stage",
            "n_transitions",
            "sum_duration_micros",
            (F.coalesce(F.col("m"), F.lit(0)) == 0).alias(
                "stream_matches_batch_lead"
            ),
        )
    )


@query(
    "events_snapshot_pipeline_verdict",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           TRUE AS conservation_ok,
           TRUE AS exactly_once_ok
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def events_snapshot_pipeline_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The snapshot→snapshot INCREMENTAL PIPELINE under the driver hash —
    the composition that was pytest-only
    (tests/test_pyds.py::test_snapshot_to_snapshot_incremental_pipeline):
    events land in a source snapshot table as three time-tercile commits;
    after EACH commit, ``spark.readStream.format("snapshot")`` (commit
    version = offset) streams the new rows through a stateless
    transformation into a second snapshot table via the exactly-once sink
    (foreachBatch + snapshot_write_txn). Hash-checked facts:

    - the daily (n_rows, sum_cents) matrix built FROM THE DESTINATION
      table, recomputed independently by the DuckDB oracle over events;
    - conservation_ok: the destination's full (event_id, day, cents)
      multiset equals the source's transformed multiset (in-engine
      full-outer compare — nothing lost or duplicated across the three
      incremental passes);
    - exactly_once_ok: a fourth pass with no new source commits delivers
      nothing, AND a manually re-delivered batch id (the at-least-once
      hole) no-ops against the destination's txn watermark.
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.pyds import register_snapshot_source
    from creatorops_lakehouse_spark.sources.snapshots import (
        current_version,
        snapshot_read,
        snapshot_write,
        snapshot_write_txn,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec
    from creatorops_lakehouse_spark.streaming.pipeline import (
        start_exactly_once_sink,
    )

    register_snapshot_source(spark)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "ts", "value")
    )
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    t1 = lo + (hi - lo) / 3
    t2 = lo + 2 * (hi - lo) / 3
    terciles = (
        ev.filter(F.col("ts") <= F.lit(t1)),
        ev.filter((F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))),
        ev.filter(F.col("ts") > F.lit(t2)),
    )

    root = _tempfile.mkdtemp(prefix="snap_pipe_")
    try:
        src = TableSpec("t.src", _os.path.join(root, "src"))
        dst = TableSpec("t.dst", _os.path.join(root, "dst"))
        ckpt = _os.path.join(root, "ckpt")
        app = "pipe"

        def run_pass():
            reader = (
                spark.readStream.format("snapshot")
                .option("path", src.path)
                .load()
            )
            out = reader.select(
                "event_id",
                F.to_date("ts").alias("day"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
            q = start_exactly_once_sink(out, dst, ckpt, app_id=app)
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("snapshot pipeline pass did not finish")

        for part in terciles:
            snapshot_write(part, src)
            run_pass()

        n_after_three = snapshot_read(spark, dst).count()
        v_after_three = current_version(dst)
        # exactly-once probe 1: a pass with no new source commits
        run_pass()
        no_new = (
            snapshot_read(spark, dst).count() == n_after_three
            and current_version(dst) == v_after_three
        )
        # exactly-once probe 2: manual redelivery of an already-recorded
        # batch id (foreachBatch's at-least-once hole) must no-op
        dup = snapshot_read(spark, dst).limit(5)
        snapshot_write_txn(dup, dst, app_id=app, txn_version=0)
        no_dup = snapshot_read(spark, dst).count() == n_after_three
        exactly_once_ok = bool(no_new and no_dup)

        got = scoped_persist(snapshot_read(spark, dst))
        want = ev.select(
            "event_id",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        keys = ["event_id", "day", "cents"]
        mism = (
            got.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_g"))
            .join(
                want.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_w")),
                keys,
                "full_outer",
            )
            .agg(
                F.sum(
                    F.when(F.col("n_g").eqNullSafe(F.col("n_w")), 0).otherwise(1)
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        conservation_ok = (mism or 0) == 0

        daily = got.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        ).collect()
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["day"], r["n_rows"], r["sum_cents"], conservation_ok,
             exactly_once_ok)
            for r in daily
        ],
        "day date, n_rows long, sum_cents long, conservation_ok boolean, "
        "exactly_once_ok boolean",
    )


@query(
    "events_cdc_replication_verdict",
    oracle="""
    WITH base AS (
        SELECT event_id AS key, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    k AS (SELECT MIN(key) AS mn, (MAX(key) - MIN(key)) // 4 AS q FROM base),
    bounds AS (
        SELECT mn + q AS u_lo, mn + 2 * q - 1 AS u_hi,
               mn + 2 * q AS d_lo, mn + 3 * q - 1 AS d_hi
        FROM k
    ),
    final AS (
        SELECT key,
               CASE WHEN key % 4 <> 3 AND key BETWEEN u_lo AND u_hi
                    THEN cents + 5 ELSE cents END AS cents
        FROM base, bounds
        WHERE key % 4 = 3 OR NOT (key BETWEEN d_lo AND d_hi)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base, bounds
            WHERE key % 4 <> 3 AND key BETWEEN d_lo AND d_hi) AS n_deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base
            WHERE key % 4 = 3) AS n_inserted,
           TRUE AS replica_matches_source
    FROM final
    """,
)
def events_cdc_replication_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC REPLICATION loop under the driver hash — the composition Delta
    users build from CDF + MERGE: a source snapshot table mutates through
    the full DML triad (expression UPDATE on one key band, copy-on-write
    DELETE on a disjoint band, then an append of held-out rows), a
    replica seeded at v0 consumes ``snapshot_diff(detect_updates=True)``
    between each consecutive version pair, and each change batch applies
    through ONE ``snapshot_merge_clauses`` call (delete ops →
    WHEN MATCHED DELETE, update postimages → WHEN MATCHED UPDATE, inserts
    → conditional WHEN NOT MATCHED INSERT). Hash-checked facts: the
    replica's final (n_rows, sum_cents) and the per-op cardinalities,
    recomputed independently by the oracle from events; plus
    replica_matches_source — the in-engine full multiset compare of
    replica head vs source head (the replication loop's whole point).
    """
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        snapshot_delete_where,
        snapshot_diff,
        snapshot_merge_clauses,
        snapshot_read,
        snapshot_update_where,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    base = scoped_persist(
        load(spark, sf_dir, "events").select(
            F.col("event_id").alias("key"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    mnmx = base.agg(F.min("key").alias("mn"), F.max("key").alias("mx")).collect()[0]
    mn, q = mnmx["mn"], (mnmx["mx"] - mnmx["mn"]) // 4
    u_lo, u_hi = mn + q, mn + 2 * q - 1
    d_lo, d_hi = mn + 2 * q, mn + 3 * q - 1
    initial = base.filter(F.col("key") % 4 != 3)
    held_out = base.filter(F.col("key") % 4 == 3)

    root = _tempfile.mkdtemp(prefix="snap_cdc_")
    try:
        src = TableSpec("t.cdc_src", _os.path.join(root, "src"))
        rep = TableSpec("t.cdc_rep", _os.path.join(root, "rep"))
        snapshot_write(initial, src)  # v0
        snapshot_write(initial, rep)  # replica seeded at v0
        snapshot_update_where(
            spark, src, {"key": (u_lo, u_hi)}, {"cents": "cents + 5"}
        )  # v1
        snapshot_delete_where(spark, src, {"key": (d_lo, d_hi)})  # v2
        snapshot_write(held_out, src)  # v3

        for a in range(3):
            changes = snapshot_diff(
                spark, src, a, a + 1, keys=["key"], detect_updates=True
            )
            batch = changes.filter(
                F.col("_change_type") != "update_preimage"
            ).select(
                "key",
                "cents",
                F.when(F.col("_change_type") == "delete", "D")
                .otherwise("U")
                .alias("op"),
            )
            snapshot_merge_clauses(
                spark,
                rep,
                batch,
                keys=["key"],
                matched_delete="src_op = 'D'",
                matched_update={"cents": "src_cents"},
                insert="op <> 'D'",
            )

        got = scoped_persist(snapshot_read(spark, rep).select("key", "cents"))
        want = snapshot_read(spark, src).select("key", "cents")
        mism = (
            got.groupBy("key", "cents")
            .agg(F.count(F.lit(1)).alias("n_g"))
            .join(
                want.groupBy("key", "cents").agg(F.count(F.lit(1)).alias("n_w")),
                ["key", "cents"],
                "full_outer",
            )
            .agg(
                F.sum(
                    F.when(F.col("n_g").eqNullSafe(F.col("n_w")), 0).otherwise(1)
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        replica_matches = (mism or 0) == 0
        head = got.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("c"),
        ).collect()[0]
        n_deleted = initial.filter(F.col("key").between(d_lo, d_hi)).count()
        n_inserted = held_out.count()
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(head["n"], head["c"], n_deleted, n_inserted, bool(replica_matches))],
        "n_rows long, sum_cents long, n_deleted long, n_inserted long, "
        "replica_matches_source boolean",
    )


@query(
    "events_quantile_sketch_verdict",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(quantile_cont(cents, 0.5) * 2) AS BIGINT)
               AS p50_half_cents,
           CAST(ROUND(quantile_cont(cents, 0.9) * 10) AS BIGINT)
               AS p90_tenth_cents,
           CAST(ROUND(quantile_cont(cents, 0.99) * 100) AS BIGINT)
               AS p99_hundredth_cents,
           TRUE AS sketch_rank_ok
    FROM c GROUP BY 1
    """,
)
def events_quantile_sketch_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable QUANTILE SKETCH with a rank-error audit — the third
    distributed-sketch family next to count-min (operators/cms.py) and
    theta (events_audience_overlap_theta): Spark's built-in
    ``percentile_approx`` is the Greenwald-Khanna sketch (JVM-side,
    map-side partial merge — the 100 TB path where exact percentile's
    global sort is the bottleneck). Hash-checked facts per event type:

    - exact p50/p90/p99, integer-exact on both engines via the scaled
      trick (q*(n-1) has a fractional part that is a multiple of 1/2,
      1/10, 1/100 respectively, so 2x/10x/100x-scaled values interpolate
      to exact BIGINTs — the events_value_mad_by_type pattern);
    - sketch_rank_ok: the GK estimate's RANK error audited in-engine —
      for each quantile, count(cents <= approx) must lie within
      q*n ± (eps*n + 1) for eps = 1/accuracy (the sketch's documented
      contract; the +1 absorbs rank-vs-index off-by-one at ties).
    """
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    accuracy = 10_000
    c = scoped_persist(
        load(spark, sf_dir, "events").select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    qs = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.percentile("cents", F.lit(0.5)) * 2)
        .cast("long")
        .alias("p50_half_cents"),
        F.round(F.percentile("cents", F.lit(0.9)) * 10)
        .cast("long")
        .alias("p90_tenth_cents"),
        F.round(F.percentile("cents", F.lit(0.99)) * 100)
        .cast("long")
        .alias("p99_hundredth_cents"),
        F.percentile_approx("cents", F.lit(0.5), F.lit(accuracy)).alias("a50"),
        F.percentile_approx("cents", F.lit(0.9), F.lit(accuracy)).alias("a90"),
        F.percentile_approx("cents", F.lit(0.99), F.lit(accuracy)).alias("a99"),
    )
    ranks = (
        c.join(F.broadcast(qs.select("event_type", "a50", "a90", "a99")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("cents") <= F.col("a50"), 1).otherwise(0)).alias("r50"),
            F.sum(F.when(F.col("cents") <= F.col("a90"), 1).otherwise(0)).alias("r90"),
            F.sum(F.when(F.col("cents") <= F.col("a99"), 1).otherwise(0)).alias("r99"),
        )
    )
    eps = 1.0 / accuracy

    def rank_ok(r, q):
        lo = F.col("n_events") * q - (F.col("n_events") * eps + 1)
        hi = F.col("n_events") * q + (F.col("n_events") * eps + 1)
        return (F.col(r) >= lo) & (F.col(r) <= hi)

    return (
        qs.join(ranks, "event_type")
        .select(
            "event_type",
            "n_events",
            "p50_half_cents",
            "p90_tenth_cents",
            "p99_hundredth_cents",
            (rank_ok("r50", 0.5) & rank_ok("r90", 0.9) & rank_ok("r99", 0.99)).alias(
                "sketch_rank_ok"
            ),
        )
    )


@query(
    "events_stateful_timeout_verdict",
    oracle="""
    WITH e0 AS (
        SELECT CAST(user_id % 10 AS VARCHAR) AS tenant_id,
               CAST(user_id AS VARCHAR) AS story_id,
               event_type AS stage, epoch_us(ts) AS us
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL
    ),
    e1 AS (
        SELECT tenant_id, story_id, MAX(stage) AS stage, us
        FROM e0 GROUP BY tenant_id, story_id, us
    ),
    k AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM e1),
    b AS (
        SELECT e1.*, CASE WHEN us <= mn + (mx - mn) // 3 THEN 0
                          WHEN us <= mn + 2 * ((mx - mn) // 3) THEN 1
                          ELSE 2 END AS batch
        FROM e1, k
    ),
    w AS (
        SELECT (MAX(us) FILTER (batch = 0)) // 1000 AS w0,
               MAX(us) // 1000 AS w2
        FROM b
    ),
    p AS (
        SELECT b.*, LEAD(batch) OVER win AS nb
        FROM b WINDOW win AS (PARTITION BY tenant_id, story_id ORDER BY us)
    ),
    rec AS (
        SELECT stage, us FROM p, w
        WHERE (nb IS NULL AND w2 > us // 1000 + 21600000)
           OR (batch = 0 AND nb = 2 AND w0 > us // 1000 + 21600000)
    )
    SELECT stage AS last_stage,
           CAST(COUNT(*) AS BIGINT) AS n_abandoned,
           CAST(SUM(us) AS BIGINT) AS sum_last_ts_micros,
           TRUE AS stream_matches_batch
    FROM rec GROUP BY 1
    """,
)
def events_stateful_timeout_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GroupState EVENT-TIME TIMEOUTS under the driver hash — the last
    stateful-streaming mechanism without an oracle verdict (transitions
    pin cross-batch VALUE state; this pins TIMERS): per-story abandonment
    via streaming/stateful.py::streaming_abandoned_flows, replayed as
    three time-tercile micro-batches. The batch twin encodes the exact
    timeout contract the operator test pins — a timer fires at a batch
    boundary against the watermark computed from data through the
    PREVIOUS batch (millisecond-floored), data beats an expired timer,
    and a cleared story can abandon again — so for three ascending
    terciles the abandonment set is exactly: every story-final event with
    final_watermark > ms(e)+gap (fires in whichever later batch the
    watermark crosses — same record), plus every batch-0 event whose
    story is silent through batch 1 with batch-0-watermark > ms(e)+gap
    (the one silent-batch window). Hash-checked: the per-stage
    abandonment census with exact microsecond sums, recomputed by the
    oracle; plus stream_matches_batch — the in-engine full multiset
    compare of the stream's (tenant, story, stage, ts) emissions against
    the twin.
    """
    import json as _json
    import os as _os
    import tempfile as _tempfile
    import uuid as _uuid

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.streaming.stateful import (
        streaming_abandoned_flows,
    )

    gap_minutes = 360
    gap_ms = gap_minutes * 60 * 1000
    base = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            (F.col("user_id") % 10).cast("string").alias("tenant_id"),
            F.col("user_id").cast("string").alias("story_id"),
            F.col("event_type").alias("stage"),
            F.unix_micros("ts").alias("us"),
            "ts",
        )
    )
    deduped = scoped_persist(
        base.groupBy("tenant_id", "story_id", "us").agg(
            F.max("stage").alias("stage"), F.max("ts").alias("ts")
        )
    )
    mnmx = deduped.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).collect()[0]
    mn, mx = mnmx["mn"], mnmx["mx"]
    t1_us = mn + (mx - mn) // 3
    t2_us = mn + 2 * ((mx - mn) // 3)
    rows = deduped.collect()  # bounded staging to CREATE a stream source
    root = _tempfile.mkdtemp(prefix="stream_timeout_")
    src = _os.path.join(root, "src")
    _os.makedirs(src)
    batches = (
        ("b0", lambda r: r.us <= t1_us),
        ("b1", lambda r: t1_us < r.us <= t2_us),
        ("b2", lambda r: r.us > t2_us),
    )
    for i, (name, pred) in enumerate(batches):
        path = _os.path.join(src, f"{name}.json")
        with open(path, "w") as f:
            for r in rows:
                if pred(r):
                    f.write(
                        _json.dumps(
                            {
                                "tenant_id": r.tenant_id,
                                "story_id": r.story_id,
                                "stage": r.stage,
                                "occurred_at": r.ts.strftime(
                                    "%Y-%m-%d %H:%M:%S.%f"
                                ),
                            }
                        )
                        + "\n"
                    )
        _os.utime(path, (1700000000 + i, 1700000000 + i))

    schema = (
        "tenant_id string, story_id string, stage string, "
        "occurred_at timestamp"
    )
    reader = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    name = f"timeout_{_uuid.uuid4().hex[:8]}"
    q = (
        streaming_abandoned_flows(reader, gap_minutes=gap_minutes)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("abandonment stream did not finish")
    stream = scoped_persist(spark.table(name))

    # batch twin: the timeout contract over the same terciles
    banded = deduped.withColumn(
        "batch",
        F.when(F.col("us") <= t1_us, 0)
        .when(F.col("us") <= t2_us, 1)
        .otherwise(2),
    )
    w0 = (
        banded.filter(F.col("batch") == 0).agg(F.max("us")).collect()[0][0]
        // 1000
    )
    w2 = mx // 1000
    wk = Window.partitionBy("tenant_id", "story_id").orderBy("us")
    twin = (
        banded.withColumn("nb", F.lead("batch").over(wk))
        .filter(
            (F.col("nb").isNull() & (F.lit(w2) > F.col("us") / 1000 + gap_ms))
            | (
                (F.col("batch") == 0)
                & (F.col("nb") == 2)
                & (F.lit(w0) > F.col("us") / 1000 + gap_ms)
            )
        )
        .select(
            "tenant_id",
            "story_id",
            F.col("stage").alias("last_stage"),
            F.col("us").alias("last_ts_micros"),
        )
    )
    keys = ["tenant_id", "story_id", "last_stage", "last_ts_micros"]
    mism = (
        stream.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_s"))
        .join(
            twin.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_b")),
            keys,
            "full_outer",
        )
        .agg(
            F.sum(
                F.when(F.col("n_s").eqNullSafe(F.col("n_b")), 0).otherwise(1)
            ).alias("m")
        )
    )
    return (
        stream.groupBy("last_stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_abandoned"),
            F.sum("last_ts_micros").cast("long").alias("sum_last_ts_micros"),
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "last_stage",
            "n_abandoned",
            "sum_last_ts_micros",
            (F.coalesce(F.col("m"), F.lit(0)) == 0).alias(
                "stream_matches_batch"
            ),
        )
    )


@query(
    "events_sessionize_bucketed",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
        SELECT user_id, us,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) AS BIGINT) AS end_us
    FROM sess GROUP BY 1, 2
    """,
)
def events_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (30 min) through the HOT-KEY-SAFE two-phase
    bucketed sessionizer (operators/sessionize.py): local windows over
    (user, day-bucket) + a per-present-bucket summary prefix — no window
    partition ever holds more than one user-day of events, so one 60M-row
    bot account cannot single-thread the stage (the adversarial-skew
    rehearsal's one open ceiling, now closed). The oracle recomputes
    sessions with the PLAIN global window — pinning that the bucketed
    decomposition (boundary merges included) is semantics-identical."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        sessionize_bucketed,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = sessionize_bucketed(ev, gap_s=1800, bucket_s=86400)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.unix_micros("ts")).cast("long").alias("start_us"),
        F.max(F.unix_micros("ts")).cast("long").alias("end_us"),
    )


@query(
    "events_stage_durations_bucketed",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        FROM events
    ),
    durations AS (
        SELECT event_type,
               epoch_us(next_ts) - epoch_us(ts) AS micros_to_next
        FROM seq
        WHERE next_ts IS NOT NULL AND epoch_us(next_ts) >= epoch_us(ts)
    )
    SELECT event_type,
           COUNT(*) AS hops,
           ROUND(CAST(SUM(micros_to_next) AS DOUBLE) / COUNT(*) / 3600000000.0, 4)
               AS avg_hours,
           ROUND(quantile_cont(micros_to_next, 0.5) / 3600000000.0, 4) AS p50_hours,
           ROUND(quantile_cont(micros_to_next, 0.9) / 3600000000.0, 4) AS p90_hours,
           ROUND(CAST(MAX(micros_to_next) AS DOUBLE) / 3600000000.0, 4) AS max_hours
    FROM durations
    GROUP BY 1
    """,
)
def events_stage_durations_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI-5 stage durations (the reference's lead-window shape,
    bottlenecks_local.py:38-61) through the HOT-KEY-SAFE two-phase lead
    (operators/sessionize.py::keyed_lead_bucketed): lead is local within
    (user, day-bucket) windows plus a 1-row boundary exchange per present
    bucket — no window partition ever holds a user's lifetime events, so
    one 60M-row bot account cannot single-thread the stage. The oracle is
    the PLAIN per-user-lifetime LEAD window (identical to
    events_sessionize_lead_stats' oracle), pinning that the bucketed
    decomposition is semantics-identical row-for-row."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_lead_bucketed,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    seq = keyed_lead_bucketed(ev, ["ts"], key_cols=["user_id"])
    micros = (F.unix_micros("ts_next") - F.unix_micros("ts")).alias(
        "micros_to_next"
    )
    durations = (
        seq.filter(F.col("ts_next").isNotNull())
        .select("event_type", micros)
        .filter(F.col("micros_to_next") >= 0)
    )
    hours = F.lit(3600000000.0)
    return durations.groupBy("event_type").agg(
        F.count("*").alias("hops"),
        F.round(
            F.sum("micros_to_next").cast("double") / F.count("*") / hours, 4
        ).alias("avg_hours"),
        F.round(F.expr("percentile(micros_to_next, 0.5)") / hours, 4).alias(
            "p50_hours"
        ),
        F.round(F.expr("percentile(micros_to_next, 0.9)") / hours, 4).alias(
            "p90_hours"
        ),
        F.round(F.max("micros_to_next").cast("double") / hours, 4).alias(
            "max_hours"
        ),
    )


@query(
    "events_transition_matrix_bucketed",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    t AS (
        SELECT from_type, to_type, COUNT(*) AS n FROM seq
        WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT from_type, SUM(n) AS row_n FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
           CAST((1000000 * t.n) // r.row_n AS BIGINT) AS p_ppm
    FROM t JOIN r ON r.from_type = t.from_type
    """,
)
def events_transition_matrix_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first-order type-transition matrix
    (events_type_transition_matrix) computed through the hot-key-safe
    two-phase lead instead of the per-user-lifetime window — the second
    consumer of keyed_lead_bucketed, exercising a NON-timestamp lead
    column (event_type) through the boundary exchange. Oracle = the plain
    global window."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_lead_bucketed,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    seq = keyed_lead_bucketed(ev, ["event_type"], key_cols=["user_id"]).select(
        F.col("event_type").alias("from_type"),
        F.col("event_type_next").alias("to_type"),
    )
    t = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    r = t.groupBy("from_type").agg(F.sum("n").cast("long").alias("row_n"))
    return t.join(F.broadcast(r), on="from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(1000000 * n) div row_n").cast("long").alias("p_ppm"),
    )


@query(
    "events_cusum_bucketed",
    oracle="""
    WITH c AS (
        SELECT event_id, event_type, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    stats AS (
        SELECT event_type, COUNT(*) AS n_t, SUM(cents) AS sum_t
        FROM c GROUP BY 1
    ),
    dev AS (
        SELECT c.event_id, c.event_type, c.ts, s.n_t,
               c.cents * s.n_t - s.sum_t AS dev_scaled
        FROM c JOIN stats s USING (event_type)
    ),
    cusum AS (
        SELECT event_id, event_type, ts, n_t,
               CAST(SUM(dev_scaled) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cs
        FROM dev
    ),
    ranked AS (
        SELECT event_type, CAST(n_t AS BIGINT) AS n_events,
               abs(cs) AS abs_cusum, event_id, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY abs(cs) DESC, ts ASC, event_id ASC
               ) AS rn
        FROM cusum
    )
    SELECT event_type, n_events,
           CAST(abs_cusum AS BIGINT) AS max_abs_cusum_scaled,
           event_id AS changepoint_event_id,
           ts AS changepoint_ts
    FROM ranked WHERE rn = 1
    """,
)
def events_cusum_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_cusum_changepoint through the hot-key-safe two-phase prefix
    sum: event_type has ~5 values, so the classic per-type running window
    funnels 1/5 of the CORPUS through single window partitions — the
    hottest-key shape in the registry (far hotter than any user). The
    running CUSUM series is exactly keyed_running_sum_bucketed over
    dev_scaled with key=event_type, and the per-type argmax becomes a
    struct-max AGGREGATE (map-side combinable) instead of a ranking
    window, so no stage holds a per-type partition. Oracle = the
    plain-window formulation (same as events_cusum_changepoint)."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_running_sum_bucketed,
    )

    c = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t"), F.sum("cents").alias("sum_t")
    )
    dev = c.join(F.broadcast(stats), on="event_type").withColumn(
        "dev_scaled", F.col("cents") * F.col("n_t") - F.col("sum_t")
    )
    cusum = keyed_running_sum_bucketed(
        dev, "dev_scaled", key_col="event_type", out_col="cs"
    ).withColumn("cs", F.col("cs").cast("long"))
    # argmax per type WITHOUT a window: max_by over a struct whose
    # ordering encodes (|cs| DESC, ts ASC, event_id ASC) — one map-side
    # combinable aggregate instead of a per-type ranking window
    pick = F.max(
        F.struct(
            F.abs(F.col("cs")).alias("a"),
            (-F.unix_micros("ts")).alias("neg_us"),
            (-F.col("event_id")).alias("neg_id"),
            F.abs(F.col("cs")).alias("abs_cs"),
            F.col("event_id").alias("eid"),
            F.col("ts").alias("cts"),
        )
    ).alias("_pick")
    return (
        cusum.groupBy("event_type")
        .agg(F.max("n_t").alias("n_t"), pick)
        .select(
            "event_type",
            F.col("n_t").cast("long").alias("n_events"),
            F.col("_pick.abs_cs").alias("max_abs_cusum_scaled"),
            F.col("_pick.eid").alias("changepoint_event_id"),
            F.col("_pick.cts").alias("changepoint_ts"),
        )
    )


@query(
    "events_trailing_30min_bucketed",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
           CAST(SUM(CAST(CAST(value AS DECIMAL(14,4)) * 10000 AS BIGINT))
                OVER w AS BIGINT) AS trailing_value_units
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW
    )
    ORDER BY user_id, event_id
    """,
)
def events_trailing_30min_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_trailing_30min_spend's RANGE frame through the HOT-KEY-SAFE
    bounded-frame decomposition (operators/sessionize.py::
    keyed_trailing_agg_bucketed): time cut into 30-min buckets, each data
    row visible to exactly two probe buckets, aggregates from a
    co-partitioned join — no per-user-lifetime window partition. This
    completes the hot-key-safe family: gap sessions, prefix sums,
    lead/lag, and bounded trailing frames all have bucketed forms. The
    oracle is the PLAIN RANGE window (identical to
    events_trailing_30min_spend's), pinning bit-equality.

    RANGE-frame subtlety carried over: timestamp PEERS must all be
    in-frame — the join form gets this for free (membership is a pure
    [lo, hi] predicate on time deltas, not row order)."""
    from creatorops_lakehouse_spark.operators.sessionize import (
        keyed_trailing_agg_bucketed,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("value").cast("decimal(14,4)") * 10000)
        .cast("long")
        .alias("_units"),
    )
    return (
        keyed_trailing_agg_bucketed(
            ev,
            "_units",
            lo_us=-1800 * 1_000_000,
            hi_us=0,
            count_col="n_trailing",
            sum_col="trailing_value_units",
        )
        .select("event_id", "user_id", "n_trailing", "trailing_value_units")
        .orderBy("user_id", "event_id")
    )


@query(
    "events_hll_distinct_events",
    oracle="""
    WITH h AS (
        SELECT event_id % 2 AS half,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h60
        FROM events
    ),
    reg AS (
        SELECT h60 % 128 AS bucket,
               MAX(CASE WHEN h60 // 128 = 0 THEN 54
                        ELSE 54 - length(bin(h60 // 128)) END) AS rho
        FROM h GROUP BY 1
    ),
    reg_half AS (
        SELECT half, h60 % 128 AS bucket,
               MAX(CASE WHEN h60 // 128 = 0 THEN 54
                        ELSE 54 - length(bin(h60 // 128)) END) AS rho
        FROM h GROUP BY 1, 2
    ),
    merged AS (
        SELECT bucket, MAX(rho) AS rho FROM reg_half GROUP BY 1
    ),
    s AS (
        -- integer shifts, never ** : DuckDB's ** is pow() and returns
        -- DOUBLE, which silently rounds past 53 mantissa bits; << keeps
        -- the sum exact-BIGINT (max 128 * 2^54 = 2^61), matching the
        -- engine's shiftleft sum bit-for-bit. Computed from MERGED (the
        -- halves folded by per-bucket MAX), so a register-merge
        -- divergence flips est — not just merge_ok.
        SELECT SUM(CAST(1 AS BIGINT) << (54 - rho))
                   + CAST((128 - COUNT(*)) AS BIGINT)
                     * (CAST(1 AS BIGINT) << 54) AS s54,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MAX(rho) AS BIGINT) AS max_rho,
               CAST(SUM(rho) AS BIGINT) AS sum_rho
        FROM merged
    ),
    e AS (
        SELECT CAST(CAST('211110442137635695750021120' AS HUGEINT)
                    // (CAST(s54 AS HUGEINT) * 1000000) AS BIGINT) AS est,
               n_buckets, max_rho, sum_rho
        FROM s
    ),
    mism AS (
        SELECT (SELECT COUNT(*) FROM
                   (SELECT bucket, rho FROM reg
                    EXCEPT SELECT bucket, rho FROM merged))
             + (SELECT COUNT(*) FROM
                   (SELECT bucket, rho FROM merged
                    EXCEPT SELECT bucket, rho FROM reg)) AS n_mism
    ),
    x AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct
          FROM events)
    SELECT e.est, x.exact_distinct,
           (10000 * ABS(e.est - x.exact_distinct)) // x.exact_distinct
               AS err_bp,
           e.n_buckets, e.max_rho, e.sum_rho,
           (mism.n_mism = 0) AS merge_ok,
           ((10000 * ABS(e.est - x.exact_distinct)) // x.exact_distinct
               <= 2000) AS within_bound
    FROM e, x, mism
    """,
)
def events_hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog distinct-count sketch
    (operators/hll.py) over event_id, with its MERGE property pinned
    in-engine: the corpus is split into two halves (event_id parity),
    each half sketched independently, the halves folded by per-bucket
    MAX, and the merged registers compared to the whole-corpus sketch —
    bucket-for-bucket equality (merge_ok), which is exactly the
    per-partition/per-day/per-cluster fold a 100 TB deployment relies
    on. The exact-integer estimate (88-bit constant ÷ S54 — no floats,
    no log2) lands within 20% of COUNT(DISTINCT) (within_bound; m=128 →
    ~9.2% expected error), and the oracle recomputes sketch, merge,
    estimate, exact count, and error in pure SQL — identical registers,
    identical division, identical err_bp, or the hash flips."""
    from creatorops_lakehouse_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    ev = scoped_persist(load(spark, sf_dir, "events").select("event_id"))
    whole = scoped_persist(hll_registers(ev, "event_id"))
    merged = hll_merge(
        hll_registers(ev.filter(F.col("event_id") % 2 == 0), "event_id"),
        hll_registers(ev.filter(F.col("event_id") % 2 == 1), "event_id"),
    )
    # merge-audit as a ONE-ROW aggregate kept IN the plan (the sanctioned
    # scalar-broadcast shape) instead of a separate driver count() action —
    # same full_outer register comparison over the same hll_merge output,
    # one fewer job per run
    mismatches = (
        whole.withColumnRenamed("rho", "_rw")
        .join(merged.withColumnRenamed("rho", "_rm"), "bucket", "full_outer")
        .filter(
            F.col("_rw").isNull()
            | F.col("_rm").isNull()
            | (F.col("_rw") != F.col("_rm"))
        )
        .agg(F.count(F.lit(1)).alias("_mm"))
    )
    est_row = hll_estimate(whole)
    exact = ev.agg(
        F.countDistinct("event_id").cast("long").alias("exact_distinct")
    )
    out = (
        est_row.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(mismatches))
        .select(
            "est",
            "exact_distinct",
            F.expr("10000 * ABS(est - exact_distinct) div exact_distinct").alias(
                "err_bp"
            ),
            "n_buckets",
            "max_rho",
            "sum_rho",
            (F.col("_mm") == 0).alias("merge_ok"),
            (
                F.expr("10000 * ABS(est - exact_distinct) div exact_distinct")
                <= 2000
            ).alias("within_bound"),
        )
    )
    return out
