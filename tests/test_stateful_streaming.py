"""transformWithStateInPandas stage-duration operator: state must survive
micro-batch boundaries (the transition between the last event of batch 1
and the first event of batch 2 is only computable from keyed state)."""

from __future__ import annotations

import json
import os

import pytest

from creatorops_lakehouse_spark.streaming.pipeline import (
    read_event_stream,
    streaming_silver,
)
from creatorops_lakehouse_spark.streaming.stateful import (
    stage_transitions_foreachbatch,
    streaming_stage_transitions,
    streaming_stage_transitions_gs,
)

AS_OF = "2026-04-02 00:00:00"


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _ev(eid, etype, occurred):
    return json.dumps(
        {
            "eventId": eid,
            "eventType": etype,
            "eventVersion": 1,
            "occurredAt": occurred,
            "tenant": {"tenantId": "t1", "authorId": "a1"},
            "entity": {"storyId": "s1"},
        }
    )


def _run_batch(spark, inp, out, ckpt):
    silver = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF, dedup=False)
    transitions = streaming_stage_transitions(silver)

    def write(df, _bid):
        df.write.mode("append").parquet(out)

    q = (
        transitions.writeStream.outputMode("append")
        .foreachBatch(write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf-based Python state "
    "server; protobuf is not installed in this environment (the "
    "foreachBatch-state variant below covers the semantics)",
)
def test_stage_durations_across_batches(spark, tmp_path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # batch 1: DRAFT@08:00 → WRITE@10:00 (one in-batch transition)
    (inp / "b1.ndjson").write_text(
        _ev("e1", "draft_created", "2026-04-01T08:00:00Z")
        + "\n"
        + _ev("e2", "chapter_written", "2026-04-01T10:00:00Z")
        + "\n"
    )
    _run_batch(spark, str(inp), out, ckpt)
    # batch 2: REVISION@13:00 — transition WRITE→REVISION spans the batch
    # boundary and is only derivable from persisted state
    (inp / "b2.ndjson").write_text(
        _ev("e3", "scene_revised", "2026-04-01T13:00:00Z") + "\n"
    )
    _run_batch(spark, str(inp), out, ckpt)

    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.duration_seconds
    )
    got = [(r.stage, r.next_stage, r.duration_seconds) for r in rows]
    assert ("DRAFT", "WRITE", 7200.0) in got
    assert ("WRITE", "REVISION", 10800.0) in got  # crossed the batch boundary
    assert all(r.tenant_id == "t1" and r.story_id == "s1" for r in rows)


def _run_gs_batch(spark, inp, out, ckpt):
    silver = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF, dedup=False)
    transitions = streaming_stage_transitions_gs(silver)

    def write(df, _bid):
        df.write.mode("append").parquet(out)

    q = (
        transitions.writeStream.outputMode("append")
        .foreachBatch(write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_groupstate_stage_durations_across_batches(spark, tmp_path):
    # applyInPandasWithState uses the Arrow-only state channel — no protobuf
    # needed — so unlike the transformWithStateInPandas twin above this runs
    # for real in this environment. The WRITE→REVISION transition spans the
    # micro-batch boundary and is only derivable from persisted keyed state.
    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (inp / "b1.ndjson").write_text(
        _ev("e1", "draft_created", "2026-04-01T08:00:00Z")
        + "\n"
        + _ev("e2", "chapter_written", "2026-04-01T10:00:00Z")
        + "\n"
    )
    _run_gs_batch(spark, str(inp), out, ckpt)
    (inp / "b2.ndjson").write_text(
        _ev("e3", "scene_revised", "2026-04-01T13:00:00Z") + "\n"
    )
    _run_gs_batch(spark, str(inp), out, ckpt)

    rows = spark.read.parquet(out).collect()
    got = {(r.stage, r.next_stage, r.duration_seconds) for r in rows}
    assert got == {
        ("DRAFT", "WRITE", 7200.0),
        ("WRITE", "REVISION", 10800.0),  # crossed the micro-batch boundary
    }
    assert all(r.tenant_id == "t1" and r.story_id == "s1" for r in rows)


def _run_fb_batch(spark, inp, state, out, ckpt):
    silver = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF, dedup=False)
    q = (
        silver.writeStream.foreachBatch(stage_transitions_foreachbatch(state, out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_foreachbatch_state_across_batches(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    state = str(tmp_path / "state")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (inp / "b1.ndjson").write_text(
        _ev("e1", "draft_created", "2026-04-01T08:00:00Z")
        + "\n"
        + _ev("e2", "chapter_written", "2026-04-01T10:00:00Z")
        + "\n"
    )
    _run_fb_batch(spark, str(inp), state, out, ckpt)
    (inp / "b2.ndjson").write_text(
        _ev("e3", "scene_revised", "2026-04-01T13:00:00Z") + "\n"
    )
    _run_fb_batch(spark, str(inp), state, out, ckpt)

    got = {
        (r.stage, r.next_stage, r.duration_seconds)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("DRAFT", "WRITE", 7200.0),
        ("WRITE", "REVISION", 10800.0),  # crossed the micro-batch boundary
    }
    # latest state version holds exactly the latest event per key
    from creatorops_lakehouse_spark.streaming.stateful import read_latest_state

    state_rows = read_latest_state(spark, state).collect()
    assert len(state_rows) == 1
    assert state_rows[0].stage == "REVISION"


def test_foreachbatch_retry_is_idempotent(spark, tmp_path):
    # foreachBatch is at-least-once: simulate a retry by invoking the batch
    # body twice with the same batch_id AFTER the first attempt fully
    # committed (worst case: output + state both already written). The
    # retry must not duplicate transitions or corrupt state.
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.streaming.stateful import read_latest_state

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    body = stage_transitions_foreachbatch(state, out)

    def batch(rows):
        return spark.createDataFrame(
            rows, ["tenant_id", "story_id", "stage", "occurred_at_s"]
        ).withColumn("occurred_at", F.to_timestamp("occurred_at_s"))

    b1 = batch(
        [
            ("t1", "s1", "DRAFT", "2026-04-01 08:00:00"),
            ("t1", "s1", "WRITE", "2026-04-01 10:00:00"),
        ]
    )
    body(b1, 0)
    body(b1, 0)  # retry of batch 0 after full commit
    b2 = batch([("t1", "s1", "REVISION", "2026-04-01 13:00:00")])
    body(b2, 1)
    body(b2, 1)  # retry of batch 1

    rows = spark.read.parquet(out).collect()
    got = sorted((r.stage, r.next_stage, r.duration_seconds) for r in rows)
    assert got == [
        ("DRAFT", "WRITE", 7200.0),
        ("WRITE", "REVISION", 10800.0),
    ]  # each transition exactly once despite double delivery
    state_rows = read_latest_state(spark, state).collect()
    assert len(state_rows) == 1 and state_rows[0].stage == "REVISION"


def test_groupstate_event_time_timeout_abandonment(spark, tmp_path):
    """EventTimeTimeout mechanics: a silent story emits ONE abandonment
    record when the watermark (previous batch's max event time) passes
    last_event + gap; a story with data in the firing batch takes the
    data path instead (data beats timeout); open stories never emit."""
    import json
    import os

    from creatorops_lakehouse_spark.streaming.stateful import (
        streaming_abandoned_flows,
    )

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        # (file, rows): story A goes silent after 10:00; B stays active;
        # C is silent through b1 but has data in the firing batch b2
        ("b0", [("t", "A", "s1", "2024-01-01 10:00:00"),
                ("t", "B", "s1", "2024-01-01 10:00:00"),
                ("t", "C", "s1", "2024-01-01 10:00:00")]),
        ("b1", [("t", "B", "s2", "2024-01-01 12:00:00")]),
        ("b2", [("t", "B", "s3", "2024-01-01 14:00:00"),
                ("t", "C", "s9", "2024-01-01 14:00:00")]),
    ]
    for i, (name, rows) in enumerate(batches):
        p = src / f"{name}.json"
        with open(p, "w") as f:
            for t, s, st, ts in rows:
                f.write(json.dumps({
                    "tenant_id": t, "story_id": s, "stage": st,
                    "occurred_at": ts,
                }) + "\n")
        os.utime(p, (1700000000 + i, 1700000000 + i))

    schema = ("tenant_id string, story_id string, stage string, "
              "occurred_at timestamp")
    reader = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_abandoned_flows(reader, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("abandon_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r.story_id, r.last_stage, r.last_ts_micros)
        for r in spark.table("abandon_t").collect()
    }
    # only A abandons (at its last stage); B is still live at stream end
    # (watermark 14:00 never passes 14:00+gap); C had data in the batch
    # whose watermark crossed its timer - data beat the timeout
    import datetime as dt

    a_us = int(dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc)
               .timestamp() * 1_000_000)
    assert got == {("A", "s1", a_us)}


def test_null_event_time_rows_are_filtered_not_fatal(spark, tmp_path):
    """A null occurred_at reaches pandas as NaN ts_micros — before the
    round-9 filter, idxmax() on an all-NaN key group (abandoned flows) and
    int(NaN) (GS transitions) failed the query at RUNTIME. Null-timed rows
    must be dropped like null-stage rows, with identical results."""
    import json
    import os

    from creatorops_lakehouse_spark.streaming.stateful import (
        streaming_abandoned_flows,
    )

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        # story A abandons; story N is ALL null-timed (the idxmax crash
        # shape); A also carries one null-timed row mixed in
        ("b0", [("t", "A", "s1", "2024-01-01 10:00:00"),
                ("t", "A", "s9", None),
                ("t", "N", "s1", None)]),
        ("b1", [("t", "B", "s2", "2024-01-01 12:00:00"),
                ("t", "N", "s2", None)]),
        ("b2", [("t", "B", "s3", "2024-01-01 14:00:00")]),
    ]
    for i, (name, rows) in enumerate(batches):
        p = src / f"{name}.json"
        with open(p, "w") as f:
            for t, s, st, ts in rows:
                f.write(json.dumps({
                    "tenant_id": t, "story_id": s, "stage": st,
                    "occurred_at": ts,
                }) + "\n")
        os.utime(p, (1700000100 + i, 1700000100 + i))

    schema = ("tenant_id string, story_id string, stage string, "
              "occurred_at timestamp")
    reader = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_abandoned_flows(reader, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("abandon_null_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r.story_id, r.last_stage) for r in spark.table("abandon_null_t").collect()
    }
    assert got == {("A", "s1")}  # null-timed rows never drive state


def test_gs_transitions_null_event_time_filtered(spark, tmp_path):
    """Same hazard on the GroupState transitions path: int(NaN) raised in
    the per-key loop. Null-timed rows are dropped; transitions unchanged."""
    inp = tmp_path / "in"
    inp.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    null_ts = json.dumps({
        "eventId": "e9", "eventType": "chapter_written", "eventVersion": 1,
        "occurredAt": None,
        "tenant": {"tenantId": "t1", "authorId": "a1"},
        "entity": {"storyId": "s1"},
    })
    (inp / "b1.ndjson").write_text(
        _ev("e1", "draft_created", "2026-04-01T08:00:00Z")
        + "\n" + null_ts + "\n"
        + _ev("e2", "chapter_written", "2026-04-01T10:00:00Z")
        + "\n"
    )
    _run_gs_batch(spark, str(inp), out, ckpt)
    rows = spark.read.parquet(out).collect()
    got = {(r.stage, r.next_stage, r.duration_seconds) for r in rows}
    assert got == {("DRAFT", "WRITE", 7200.0)}
