"""Custom stateful streaming operator: per-story stage-duration tracking.

The batch engine computes stage durations with a lead() window
(pipelines/gold/bottlenecks.py). lead() has no streaming equivalent — the
"next" event for the last row of a micro-batch arrives in a LATER batch —
so the streaming form needs explicit keyed state: remember each story's
last (stage, timestamp) across batches and emit a transition when the next
event arrives. This is the transformWithStateInPandas realization
(SURVEY.md §7.4 "streaming session-stage durations").

Scale notes: state is one tiny record per (tenant, story) key in RocksDB;
rows stream through Arrow batches per key group. Requires
spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType()),
        StructField("story_id", StringType()),
        StructField("stage", StringType()),
        StructField("next_stage", StringType()),
        StructField("duration_seconds", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("stage", StringType()),
        StructField("ts_micros", LongType()),
    ]
)


class StageDurationProcessor(StatefulProcessor):
    """Keyed state: the story's last (stage, event-time); each incoming
    event (in event-time order) closes the previous stage and emits its
    duration."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState("last_event", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        tenant_id, story_id = key
        events = pd.concat(list(rows), ignore_index=True).sort_values("ts_micros")
        out: list[tuple] = []
        if self._last.exists():
            prev_stage, prev_ts = self._last.get()
        else:
            prev_stage, prev_ts = None, None
        for row in events.itertuples(index=False):
            if prev_stage is not None and row.ts_micros >= prev_ts:
                out.append(
                    (
                        tenant_id,
                        story_id,
                        prev_stage,
                        row.stage,
                        (row.ts_micros - prev_ts) / 1_000_000.0,
                    )
                )
            prev_stage, prev_ts = row.stage, int(row.ts_micros)
        self._last.update((prev_stage, prev_ts))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in TRANSITION_SCHEMA.fields])

    def close(self) -> None:
        pass


def streaming_stage_transitions(silver_stream: DataFrame) -> DataFrame:
    """Stage-transition stream: groupBy (tenant, story) →
    transformWithStateInPandas with the duration processor."""
    import pyspark.sql.functions as F

    # null occurred_at reaches pandas as NaN ts_micros (idxmax/int() would
    # raise at runtime) — an event without a time can't order a transition
    keyed = silver_stream.filter(
        F.col("stage").isNotNull() & F.col("occurred_at").isNotNull()
    ).select(
        "tenant_id",
        "story_id",
        "stage",
        F.unix_micros("occurred_at").alias("ts_micros"),
    )
    return keyed.groupBy("tenant_id", "story_id").transformWithStateInPandas(
        statefulProcessor=StageDurationProcessor(),
        outputStructType=TRANSITION_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def streaming_stage_transitions_gs(silver_stream: DataFrame) -> DataFrame:
    """Stage-transition stream via ``applyInPandasWithState`` (GroupState).

    Same keyed-state semantics as ``streaming_stage_transitions`` — remember
    each story's last (stage, event-time) across micro-batches, emit a
    transition row when the next event arrives — but realized on the
    GroupState API, which uses the Arrow-only state channel and therefore
    runs without the protobuf-based Python state server that
    ``transformWithStateInPandas`` requires. This is the portable in-engine
    form (reference capability: runbooks/silver-transform.md stage
    durations; batch twin pipelines/gold/bottlenecks.py lead() window).

    Scale notes: state is one tiny tuple per (tenant, story) key, held by
    the streaming state store and shuffled only by the groupBy keys; rows
    reach Python as Arrow batches per key group.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        tenant_id, story_id = key
        events = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_micros")
        if state.exists:
            prev_stage, prev_ts = state.get
        else:
            prev_stage, prev_ts = None, None
        out: list[tuple] = []
        for row in events.itertuples(index=False):
            if prev_stage is not None and row.ts_micros >= prev_ts:
                out.append(
                    (
                        tenant_id,
                        story_id,
                        prev_stage,
                        row.stage,
                        (row.ts_micros - prev_ts) / 1_000_000.0,
                    )
                )
            prev_stage, prev_ts = row.stage, int(row.ts_micros)
        state.update((prev_stage, prev_ts))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in TRANSITION_SCHEMA.fields]
            )

    # null occurred_at reaches pandas as NaN ts_micros (idxmax/int() would
    # raise at runtime) — an event without a time can't order a transition
    keyed = silver_stream.filter(
        F.col("stage").isNotNull() & F.col("occurred_at").isNotNull()
    ).select(
        "tenant_id",
        "story_id",
        "stage",
        F.unix_micros("occurred_at").alias("ts_micros"),
    )
    return keyed.groupBy("tenant_id", "story_id").applyInPandasWithState(
        fn,
        TRANSITION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stage_transitions_foreachbatch(
    state_path: str,
    out_path: str,
):
    """State-in-the-lakehouse alternative: a foreachBatch body that keeps
    each story's last (stage, ts) in a keyed parquet state table.

    transformWithStateInPandas needs the protobuf-based Python state
    server, which this environment lacks; this variant expresses the same
    keyed-state semantics with plain DataFrame ops — the classic Delta/
    parquet pattern for custom streaming state.

    Delivery semantics: foreachBatch is AT-LEAST-ONCE — a batch that fails
    after its writes but before the checkpoint commit is retried with the
    same batch_id. Both writes are therefore keyed by batch_id so a retry
    is a byte-identical no-op:

    - state versions: each batch READS the newest state with
      ``version < batch_id`` (the pre-batch state — unchanged by a partial
      earlier attempt) and WRITES ``version=batch_id`` with overwrite. A
      retry re-reads the same input state, recomputes the same result, and
      overwrites its own version directory.
    - output partitions: transitions land in ``out_path/batch_id=N`` with
      overwrite, so re-emission replaces rather than duplicates.

    Each batch: transitions = lead() over (pre-batch state ∪ batch events);
    new state = latest event per key. Because the state holds exactly ONE
    row per key (the story's latest already-emitted event), every
    consecutive pair in the merged sequence involves at least one new event
    — so every transition is fresh and no dedup against prior output is
    needed. Assumes event-time-ordered arrival per key (the
    transformWithStateInPandas variant + watermark is the general form).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    def _read_prev_state(spark, batch_id: int):
        """Newest committed state version strictly below this batch id."""
        try:
            versions = spark.read.parquet(state_path)
        except Exception:  # first batch — no state yet
            return None, None
        prev = versions.filter(F.col("version") < batch_id)
        max_v = prev.agg(F.max("version")).collect()[0][0]
        if max_v is None:
            return None, None
        return prev.filter(F.col("version") == max_v).drop("version"), max_v

    def _gc_state_versions(spark, keep_from: int) -> None:
        """Drop state versions below ``keep_from`` (superseded; no retry can
        need them — a retry of batch N reads the newest version < N, which
        is exactly ``keep_from``)."""
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(state_path)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if name.startswith("version=") and int(name.split("=", 1)[1]) < keep_from:
                fs.delete(status.getPath(), True)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        events = batch_df.filter(
            F.col("stage").isNotNull() & F.col("occurred_at").isNotNull()
        ).select(
            "tenant_id",
            "story_id",
            "stage",
            F.unix_micros("occurred_at").alias("ts_micros"),
        )
        state, state_version = _read_prev_state(spark, batch_id)
        merged = events if state is None else state.unionByName(events)
        w = Window.partitionBy("tenant_id", "story_id").orderBy(F.col("ts_micros").asc())
        seq = merged.withColumn("_next_stage", F.lead("stage").over(w)).withColumn(
            "_next_ts", F.lead("ts_micros").over(w)
        )
        transitions = seq.filter(F.col("_next_ts").isNotNull()).select(
            "tenant_id",
            "story_id",
            "stage",
            F.col("_next_stage").alias("next_stage"),
            ((F.col("_next_ts") - F.col("ts_micros")) / 1_000_000.0).alias(
                "duration_seconds"
            ),
        )
        transitions.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
        # keep only the latest event per key, as a NEW state version — never
        # read-and-overwrite the same files in one plan
        latest = Window.partitionBy("tenant_id", "story_id").orderBy(
            F.col("ts_micros").desc()
        )
        new_state = (
            merged.withColumn("_rn", F.row_number().over(latest))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        new_state.write.mode("overwrite").parquet(f"{state_path}/version={batch_id}")
        if state_version is not None:
            _gc_state_versions(spark, keep_from=state_version)

    return body


def read_latest_state(spark, state_path: str) -> DataFrame:
    """The newest committed state version (the one-row-per-key table)."""
    import pyspark.sql.functions as F

    versions = spark.read.parquet(state_path)
    max_v = versions.agg(F.max("version")).collect()[0][0]
    return versions.filter(F.col("version") == max_v).drop("version")


ABANDONED_SCHEMA = StructType(
    [
        StructField("tenant_id", StringType()),
        StructField("story_id", StringType()),
        StructField("last_stage", StringType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def streaming_abandoned_flows(
    silver_stream: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """ABANDONED-flow detector — the GroupState EVENT-TIME TIMEOUT form
    (the one stateful mechanism the transition operators don't touch):
    remember each story's last (stage, event time); when the WATERMARK
    passes last_event + gap with no new event for the key, Spark invokes
    the function with ``state.hasTimedOut`` and the story emits ONE
    abandonment record (its final stage and timestamp), clearing state.
    A later event for the same story starts a fresh flow — a story can
    abandon more than once.

    Timeout mechanics this encodes (and the verdict pins): timeouts are
    BATCH-BOUNDARY events evaluated against the watermark computed from
    data through the PREVIOUS batch; a key with data in the firing batch
    takes the data path instead (data beats timeout); timestamps are
    millisecond-floored (Spark tracks watermarks in ms). State is one
    tiny tuple per story in the state store; rows reach Python as Arrow
    batches per key group.
    """
    import pyspark.sql.functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        tenant_id, story_id = key
        if state.hasTimedOut:
            stage, ts_us = state.get
            state.remove()
            yield pd.DataFrame(
                [(tenant_id, story_id, stage, int(ts_us))],
                columns=[f.name for f in ABANDONED_SCHEMA.fields],
            )
            return
        events = pd.concat(list(pdfs), ignore_index=True)
        last = events.loc[events["ts_micros"].idxmax()]
        if state.exists:
            pstage, pts = state.get
            if int(last.ts_micros) >= pts:
                state.update((last.stage, int(last.ts_micros)))
        else:
            state.update((last.stage, int(last.ts_micros)))
        _, ts_us = state.get
        state.setTimeoutTimestamp(ts_us // 1000 + gap_ms)
        return
        yield  # keeps fn a generator on the data path (no emission)

    # null occurred_at reaches pandas as NaN ts_micros (idxmax/int() would
    # raise at runtime) — an event without a time can't order a transition
    keyed = silver_stream.filter(
        F.col("stage").isNotNull() & F.col("occurred_at").isNotNull()
    ).select(
        "tenant_id",
        "story_id",
        "stage",
        F.unix_micros("occurred_at").alias("ts_micros"),
        "occurred_at",
    )
    return (
        keyed.withWatermark("occurred_at", "0 seconds")
        .groupBy("tenant_id", "story_id")
        .applyInPandasWithState(
            fn,
            ABANDONED_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
