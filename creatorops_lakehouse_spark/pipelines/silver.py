"""Silver transform: Bronze raw JSON → typed, contract-validated event log
plus a quarantine table with the full reject taxonomy.

Capability parity with pipelines/silver/transform_local.py:31-209, upgraded
with the documented-but-unimplemented semantics (SURVEY.md §2.9):
D1 dedup keep-latest, D2 authoritative stage derivation, D3 metric checks,
D4 clock-skew guard, D5 reject taxonomy + validation_errors, D6 stable-field
hash, D7 partition-range incremental runs. Typed metric columns implement
the Silver DDL (sql/ddl/02_silver_events.sql:34-40) rather than the
reference code's map-only variant — the documented intent, strictly more
capable — while keeping the open maps for forward-compat (§7.4).

Scale notes:
- The whole parse+validate+project path is narrow (no shuffle) and
  UDF-free, so it fuses into one WholeStageCodegen pass over the scan.
- The good/reject fan-out persists the parsed parent once instead of
  recomputing the scan per action (the reference recomputes it 4×, §3).
- Dedup shuffles once on event_id; at 100 TB run it per ingest-date
  partition range (incremental mode) so the window state stays bounded.
"""

from __future__ import annotations

from datetime import datetime, timezone
from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from creatorops_lakehouse_spark.contract import Rule, compile_contract, default_rules
from creatorops_lakehouse_spark.schemas import RAW_EVENT_SCHEMA, STAGE_BY_EVENT_TYPE

#: ISO-8601 Zulu format used by the event contract (FIXTURES.md A1).
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

#: Days after which an event is flagged late (transform_local.py:109;
#: runbooks/silver-transform.md:92-95).
LATE_EVENT_DAYS = 7


def parse(bronze: DataFrame) -> DataFrame:
    """Parse raw_json against the fixed contract schema (F1).

    Mirrors transform_local.py:71-76: fields that don't match become null.
    PERMISSIVE from_json yields an all-null struct (not a null struct) for
    malformed JSON, so parse failure is detected via a corrupt-record
    column rather than struct nullness.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    schema_with_corrupt = StructType(
        list(RAW_EVENT_SCHEMA.fields) + [StructField("_corrupt_record", StringType())]
    )
    parsed = F.from_json(
        F.col("raw_json"),
        schema_with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return bronze.withColumn("parsed", parsed).withColumn(
        "parse_ok",
        F.col("parsed").isNotNull() & F.col("parsed._corrupt_record").isNull(),
    )


def _stage_map_col() -> F.Column:
    """Authoritative event_type → stage mapping as a literal MAP (D2).

    A literal map lookup instead of a 10-branch when-chain: constant-folded
    by Catalyst, and the single source of truth stays schemas.STAGE_BY_EVENT_TYPE.
    """
    pairs = list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in STAGE_BY_EVENT_TYPE.items()))
    return F.create_map(*pairs)


def stable_event_hash() -> F.Column:
    """D6 stable-field idempotency hash (runbooks/silver-transform.md:100-112):
    sha2 over the business identity, not the raw payload bytes — equal
    events hash equal even if whitespace/key-order differ."""
    p = lambda f: F.col(f"parsed.{f}")  # noqa: E731
    return F.sha2(
        F.concat_ws(
            "||",
            F.coalesce(p("eventType"), F.lit("")),
            F.coalesce(p("occurredAt"), F.lit("")),
            F.coalesce(p("tenant.tenantId"), F.lit("")),
            F.coalesce(p("tenant.authorId"), F.lit("")),
            F.coalesce(p("entity.seriesId"), F.lit("")),
            F.coalesce(p("entity.storyId"), F.lit("")),
            F.coalesce(p("entity.chapterId"), F.lit("")),
            F.coalesce(p("entity.sceneId"), F.lit("")),
            F.coalesce(p("metrics").getItem("wordCount"), F.lit("")),
            F.coalesce(p("metrics").getItem("revisionCount"), F.lit("")),
            F.coalesce(p("metrics").getItem("engagementScore"), F.lit("")),
        ),
        256,
    )


def validate(
    parsed: DataFrame,
    as_of_ts: str | None = None,
    extra_rules: list[Rule] | None = None,
) -> DataFrame:
    """Attach contract verdict columns + derived event columns.

    ``as_of_ts`` parameterizes the D4 future-event guard (and is the
    deterministic stand-in for current_timestamp()).
    """
    rules = default_rules(as_of_ts=as_of_ts)
    if extra_rules:
        rules = rules + list(extra_rules)
    cols = compile_contract(rules)
    occurred = F.try_to_timestamp(F.col("parsed.occurredAt"), F.lit(TS_FMT))
    out = (
        parsed.withColumn("contract_ok", cols["contract_ok"])
        .withColumn("reject_reason", cols["reject_reason"])
        .withColumn("reject_stage", cols["reject_stage"])
        .withColumn("validation_errors", cols["validation_errors"])
        .withColumn("occurred_at", occurred)
        .withColumn("p_event_date", F.to_date(occurred))
        .withColumn("event_hash", stable_event_hash())
        .withColumn(
            "is_late_event",
            F.datediff(F.col("p_ingest_date"), F.to_date(occurred)) > LATE_EVENT_DAYS,
        )
    )
    return out


def to_silver(validated: DataFrame) -> DataFrame:
    """Project the good branch to the typed Silver schema
    (sql/ddl/02_silver_events.sql:8-52 + lineage, transform_local.py:117-153).

    D2: stage is DERIVED from event_type; the producer-supplied stage is
    preserved in metadata_map['producerStage']
    (runbooks/silver-transform.md:63-80)."""
    p = lambda f: F.col(f"parsed.{f}")  # noqa: E731
    derived_stage = _stage_map_col()[p("eventType")]
    producer_stage_meta = F.when(
        p("stage").isNotNull(), F.create_map(F.lit("producerStage"), p("stage"))
    ).otherwise(F.create_map().cast("map<string,string>"))
    metadata = F.map_concat(
        F.coalesce(p("metadata"), F.create_map().cast("map<string,string>")),
        producer_stage_meta,
    )
    return validated.filter(F.col("contract_ok")).select(
        p("eventId").alias("event_id"),
        p("eventType").alias("event_type"),
        p("eventVersion").alias("event_version"),
        F.col("occurred_at"),
        F.col("ingested_at"),
        F.col("p_event_date"),
        p("tenant.tenantId").alias("tenant_id"),
        p("tenant.authorId").alias("author_id"),
        p("tenant.plan").alias("plan"),
        p("entity.seriesId").alias("series_id"),
        p("entity.storyId").alias("story_id"),
        p("entity.chapterId").alias("chapter_id"),
        p("entity.sceneId").alias("scene_id"),
        derived_stage.alias("stage"),
        # try_cast: ANSI mode would crash on non-numeric metric strings; the
        # contract's NON_NUMERIC_* rules quarantine those rows, but the good
        # branch must still never throw on values the contract permits.
        p("metrics").getItem("revisionCount").try_cast("int").alias("revision_count"),
        p("metrics").getItem("wordCount").try_cast("int").alias("word_count"),
        p("metrics").getItem("engagementScore").try_cast("double").alias("engagement_score"),
        F.coalesce(p("metrics"), F.create_map().cast("map<string,string>")).alias(
            "metrics_map"
        ),
        metadata.alias("metadata_map"),
        p("producer.service").alias("producer_service"),
        p("producer.env").alias("producer_env"),
        p("producer.region").alias("producer_region"),
        p("producer.traceId").alias("trace_id"),
        F.col("event_hash"),
        F.coalesce(F.col("is_late_event"), F.lit(False)).alias("is_late_event"),
        F.col("ingest_id"),
        F.col("source"),
        F.col("raw_schema_version"),
        F.col("p_ingest_date"),
        F.col("raw_json"),
    )


def to_rejects(validated: DataFrame, rejected_at: str | None = None) -> DataFrame:
    """Project the quarantine branch with the full D5 taxonomy
    (sql/ddl/03_silver_rejects.sql:8-19; reasons transform_local.py:157-169)."""
    if rejected_at is None:
        rejected_at = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    return validated.filter(~F.col("contract_ok")).select(
        F.col("event_hash"),
        F.col("reject_reason"),
        F.col("reject_stage"),
        F.col("validation_errors"),
        F.col("ingest_id"),
        F.col("source"),
        F.col("raw_schema_version"),
        F.col("ingested_at"),
        F.lit(rejected_at).cast("timestamp").alias("rejected_at"),
        F.col("p_ingest_date"),
        F.col("raw_json"),
    )


def dedup_latest(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    order_col: str = "ingested_at",
    tiebreak: tuple[str, ...] = ("event_hash",),
) -> DataFrame:
    """D1 dedup: keep the latest record per logical key
    (runbooks/silver-transform.md:114-122 "keep max(ingested_at)").

    Deterministic: ties on ``order_col`` break on ``tiebreak`` columns.
    At scale this is one hash-shuffle on the key; pair with a partition
    filter (incremental mode) to bound state.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def transform(
    bronze: DataFrame,
    as_of_ts: str | None = None,
    rejected_at: str | None = None,
    dedup: bool = True,
    ingest_date_range: tuple[str, str] | None = None,
    extra_rules: list[Rule] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full Bronze→Silver split. Returns (silver_events, rejects).

    ``ingest_date_range`` implements D7 incremental/backfill runs
    (runbooks/silver-transform.md:135-137): a (start, end) date pair pushed
    down to partition pruning on p_ingest_date.
    """
    if ingest_date_range is not None:
        start, end = ingest_date_range
        bronze = bronze.filter(
            (F.col("p_ingest_date") >= F.lit(start).cast("date"))
            & (F.col("p_ingest_date") <= F.lit(end).cast("date"))
        )
    validated = validate(parse(bronze), as_of_ts=as_of_ts, extra_rules=extra_rules)
    # one persist instead of the reference's 4× scan recompute (SURVEY §3/§4);
    # scoped so the query-registry wrapper / bench loop can release it once
    # the good+reject branches have been consumed (operators/cache.py).
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    validated = scoped_persist(validated)
    good = to_silver(validated)
    if dedup:
        good = dedup_latest(good)
    bad = to_rejects(validated, rejected_at=rejected_at)
    return good, bad
