"""Streaming slice tests: the batch silver transform over readStream,
watermarked dedup, windowed KPI aggregation — exercised with availableNow
triggers over an NDJSON drop directory."""

from __future__ import annotations

import json
import os

import pytest

from creatorops_lakehouse_spark.streaming.pipeline import (
    read_event_stream,
    start_silver_sink,
    start_velocity_sink,
    streaming_daily_velocity,
    streaming_silver,
)

AS_OF = "2026-04-02 00:00:00"


def _ev(eid, etype, occurred, word_count=None):
    ev = {
        "eventId": eid,
        "eventType": etype,
        "eventVersion": 1,
        "occurredAt": occurred,
        "tenant": {"tenantId": "tnt_001", "authorId": "auth_001_001"},
        "entity": {"seriesId": "ser_1", "storyId": "sto_1"},
    }
    if word_count is not None:
        ev["metrics"] = {"wordCount": word_count}
    return json.dumps(ev)


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp = root / "in"
    inp.mkdir()
    lines = [
        _ev("c1", "chapter_written", "2026-04-01T08:00:00Z", 1000),
        _ev("c2", "chapter_written", "2026-04-01T09:00:00Z", 2000),
        _ev("c1", "chapter_written", "2026-04-01T08:00:00Z", 1000),  # dup event_id
        _ev("c3", "chapter_written", "2026-03-31T12:00:00Z", 3000),  # previous day
        _ev("g1", "reader_engagement", "2026-04-01T10:00:00Z"),
    ]
    (inp / "batch1.ndjson").write_text("\n".join(lines) + "\n")
    return str(inp), str(root)


def test_streaming_silver_sink(spark, stream_dirs, tmp_path_factory):
    inp, root = stream_dirs
    out = os.path.join(root, "silver")
    ckpt = os.path.join(root, "ckpt_silver")
    stream = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF)
    assert stream.isStreaming
    q = start_silver_sink(stream, out, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == ["c1", "c2", "c3", "g1"]  # dup c1 dropped by watermark dedup
    # partitioned layout by event date
    assert any(d.startswith("p_event_date=") for d in os.listdir(out))


def test_streaming_velocity_window(spark, stream_dirs):
    inp, root = stream_dirs
    out = os.path.join(root, "velocity")
    ckpt = os.path.join(root, "ckpt_velocity")
    silver = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF)
    q = start_velocity_sink(streaming_daily_velocity(silver), out, ckpt)
    q.awaitTermination(120)
    rows = {str(r.p_event_date): r for r in spark.read.parquet(out).collect()}
    assert rows["2026-04-01"].chapters_written == 2
    assert rows["2026-04-01"].words_written == 3000
    assert rows["2026-03-31"].chapters_written == 1
    assert rows["2026-03-31"].words_written == 3000


def test_streaming_incremental_second_batch(spark, stream_dirs):
    inp, root = stream_dirs
    out = os.path.join(root, "silver2")
    ckpt = os.path.join(root, "ckpt_silver2")
    stream = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF)
    start_silver_sink(stream, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # drop a second file: only the new rows are processed (checkpointed)
    with open(os.path.join(inp, "batch2.ndjson"), "w") as fh:
        fh.write(_ev("c9", "chapter_written", "2026-04-01T11:00:00Z", 500) + "\n")
    stream2 = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF)
    start_silver_sink(stream2, out, ckpt).awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == n1 + 1
    assert {r.event_id for r in rows} >= {"c9"}


def test_streaming_session_windows(spark, stream_dirs):
    from creatorops_lakehouse_spark.streaming.pipeline import streaming_user_sessions

    inp, root = stream_dirs
    out = os.path.join(root, "sessions")
    ckpt = os.path.join(root, "ckpt_sessions")
    silver = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF, dedup=False)
    sessions = streaming_user_sessions(silver, gap="90 minutes")

    def write_batch(df, _bid):
        df.write.mode("overwrite").parquet(out)

    q = (
        sessions.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    # chapter events at 08:00/09:00 merge (gap 90m); 03-31 and reader event
    # at 10:00 chain onto 09:00 within 90m
    assert any(r.n_events >= 2 for r in rows)
    assert all(r.session_end > r.session_start for r in rows)


def test_stream_static_enrichment_join(spark, stream_dirs):
    """Stream-static join: the silver stream enriched against a static
    dimension (event_type -> category) must equal the batch join — the
    standard enrichment topology (static side re-read per micro-batch,
    no state store, no watermark requirement on the static side)."""
    import pyspark.sql.functions as F
    from creatorops_lakehouse_spark.streaming.pipeline import (
        read_event_stream,
        streaming_silver,
    )

    inp, root = stream_dirs
    dim = spark.createDataFrame(
        [("chapter_written", "authoring"), ("reader_engagement", "audience")],
        ["event_type", "category"],
    )
    stream = streaming_silver(read_event_stream(spark, inp), as_of_ts=AS_OF)
    enriched = stream.join(F.broadcast(dim), on="event_type", how="left")
    q = (
        enriched.select("event_id", "event_type", "category")
        .writeStream.format("memory")
        .queryName("enriched_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enriched_mem").collect()
    mapping = {"chapter_written": "authoring", "reader_engagement": "audience"}
    # every streamed row is enriched per the static dim (no null/missed joins)
    assert rows and all(r.category == mapping[r.event_type] for r in rows)
    # the first batch's events are all present (other module tests may have
    # dropped more batches into the shared input dir — they must enrich
    # too, which the all() above pins)
    got = {(r.event_id, r.category) for r in rows}
    assert got >= {
        ("c1", "authoring"),
        ("c2", "authoring"),
        ("c3", "authoring"),
        ("g1", "audience"),
    }


def test_streaming_verdict_staging_guards_refuse_big_corpus(spark, monkeypatch):
    """All four streaming verdicts stage micro-batch files via a driver
    collect of the events table; each must REFUSE (not OOM the driver)
    above MAX_STAGE_EVENTS — the staging-guard pattern from
    queries/dedup.py, applied here after the round-9 verdict flagged the
    pre-pattern collects."""
    import pytest

    import creatorops_lakehouse_spark.queries.events as qe

    monkeypatch.setattr(qe, "MAX_STAGE_EVENTS", 3)
    for verdict in (
        qe.events_streaming_window_verdict,
        qe.events_streaming_join_verdict,
        qe.events_streaming_session_verdict,
        qe.events_streaming_exactly_once_verdict,
    ):
        with pytest.raises(ValueError, match="refuses corpora above"):
            verdict(spark, "/root/testdata/sf0.001")
