"""Streaming Bronze→Silver→Gold: the batch transforms over readStream.

Because the batch-layer transforms (silver.parse/validate/to_silver,
gold aggregations) are pure DataFrame functions, they compose directly onto
streaming DataFrames — Catalyst handles the incrementalization. The pieces
that differ from batch:

- watermarking: `withWatermark("occurred_at", "7 days")` implements the
  reference's documented late-data policy (runbooks/silver-transform.md:92-95)
  as state eviction — a late event past the watermark is dropped from
  windowed aggregates rather than flagged (the batch flag is_late_event
  still rides on each row for the event-log sink).
- dedup: `dropDuplicatesWithinWatermark` on event_id replaces the batch
  row_number window (D1) — bounded state, same keep-first semantics within
  the lateness horizon.
- sinks: event-log append via foreachBatch → parquet table (atomic per
  micro-batch); KPI windows in update mode.

Scale notes: state size is bounded by (watermark horizon × key
cardinality); shuffle partitioning of stateful operators is fixed at first
run (spark.sql.shuffle.partitions) — size it for peak, AQE does not apply
to streaming stages.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from creatorops_lakehouse_spark.pipelines import silver as silver_mod
from creatorops_lakehouse_spark.pipelines.bronze import wrap_bronze


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over an NDJSON drop directory (one file per micro-batch
    in tests; a cloud files source in production)."""
    return spark.readStream.format("text").load(input_dir)


def streaming_silver(
    raw_lines: DataFrame,
    as_of_ts: str | None = None,
    watermark: str = "7 days",
    dedup: bool = True,
) -> DataFrame:
    """Contract-validated silver event stream (good branch).

    Shares parse/validate/to_silver with the batch path; adds watermark +
    within-watermark dedup.
    """
    bronze = wrap_bronze(raw_lines, ingested_at=as_of_ts)
    validated = silver_mod.validate(
        silver_mod.parse(bronze), as_of_ts=as_of_ts
    )
    good = silver_mod.to_silver(validated)
    good = good.withWatermark("occurred_at", watermark)
    if dedup:
        good = good.dropDuplicatesWithinWatermark(["event_id"])
    return good


def streaming_daily_velocity(silver_stream: DataFrame) -> DataFrame:
    """KPI-1 writing velocity as a 1-day tumbling-window streaming aggregate
    (kpis_local.py:36-47 semantics; window start ≡ p_event_date)."""
    return (
        silver_stream.filter(F.col("event_type") == "chapter_written")
        .groupBy(
            F.window("occurred_at", "1 day").alias("day"),
            "tenant_id",
            "author_id",
            "story_id",
            "series_id",
        )
        .agg(
            F.count("*").alias("chapters_written"),
            F.coalesce(F.sum("word_count"), F.lit(0)).alias("words_written"),
            F.avg("word_count").alias("avg_words_per_chapter"),
        )
        .select(
            F.to_date(F.col("day.start")).alias("p_event_date"),
            "tenant_id",
            "author_id",
            "story_id",
            "series_id",
            "chapters_written",
            "words_written",
            "avg_words_per_chapter",
        )
    )


def start_silver_sink(
    silver_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Append the silver event stream to a partitioned parquet table via
    foreachBatch (the Delta MERGE seam in production — swap the body)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy("p_event_date")
            .parquet(out_path)
        )

    writer = silver_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_velocity_sink(
    velocity_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Windowed-aggregate sink: complete-refresh of the small KPI table per
    micro-batch (update-mode semantics materialized via foreachBatch)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_path)

    writer = (
        velocity_stream.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_exactly_once_sink(
    stream_df: DataFrame,
    spec,
    checkpoint: str,
    app_id: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """EXACTLY-ONCE append into a snapshot table (Delta's streaming-sink
    contract, re-expressed on the snapshot log): the foreachBatch body is
    ``snapshot_write_txn(batch, spec, app_id, batch_id)``, so a micro-batch
    redelivered after a crash between sink write and checkpoint commit —
    foreachBatch's documented at-least-once hole — finds its batch id
    already recorded in the table head's ``txns`` map and no-ops. Table
    state is exactly-once even though delivery is at-least-once.

    ``app_id`` defaults to the checkpoint path, which is what uniquely
    identifies a logical stream across restarts (Spark reuses batch ids
    per checkpoint). Distinct streams writing the same table MUST use
    distinct app_ids or they will swallow each other's batches.
    """
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_write_txn

    app = app_id or checkpoint

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # empty micro-batches (a source tick with no new offsets) commit
        # nothing: skipping keeps restart-heavy streams from growing the
        # destination log, and replaying an empty batch is idempotent by
        # construction, so the txn watermark need not advance
        if batch_df.isEmpty():
            return
        snapshot_write_txn(batch_df, spec, app_id=app, txn_version=batch_id)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_user_sessions(
    silver_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Stateful gap-based sessionization on the event stream: native
    session_window + watermark (state evicts once a session can no longer
    grow). ``watermark=None`` reuses the watermark already on the input
    (streaming_silver sets one; Spark forbids redefining it). The
    custom-stateful upgrade path is transformWithStateInPandas;
    session_window covers the gap-session case without Python state."""
    if watermark is not None:
        silver_stream = silver_stream.withWatermark("occurred_at", watermark)
    return (
        silver_stream
        .groupBy(
            F.session_window("occurred_at", gap).alias("w"),
            F.col("tenant_id"),
            F.col("author_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "tenant_id",
            "author_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
