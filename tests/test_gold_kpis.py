"""Golden KPI tests over the hand-computable mini-corpus (FIXTURES.md A5):
formulas from docs/kpis.md:9-113, exercised through bronze→silver→gold."""

from __future__ import annotations

import json

import pytest

from creatorops_lakehouse_spark.pipelines.bronze import wrap_bronze
from creatorops_lakehouse_spark.pipelines.gold import (
    dropoff_rate_daily,
    engagement_bands_daily,
    revision_churn_daily,
    stage_bottlenecks,
    writing_velocity_daily,
)
from creatorops_lakehouse_spark.pipelines.silver import transform

AS_OF = "2026-04-02 00:00:00"


def _ev(eid, etype, occurred, metrics=None, chapter=None, scene=None):
    ev = {
        "eventId": eid,
        "eventType": etype,
        "eventVersion": 1,
        "occurredAt": occurred,
        "tenant": {"tenantId": "tnt_001", "authorId": "auth_001_001", "plan": "pro"},
        "entity": {"seriesId": "ser_001_001", "storyId": "sto_001_001_01"},
    }
    if chapter:
        ev["entity"]["chapterId"] = chapter
    if scene:
        ev["entity"]["sceneId"] = scene
    if metrics:
        ev["metrics"] = metrics
    return json.dumps(ev)


CORPUS = [
    # 3 chapters, known word counts → velocity (3, 6000, 2000)
    _ev("c1", "chapter_written", "2026-04-01T08:00:00Z", {"wordCount": 1000}, "ch_01"),
    _ev("c2", "chapter_written", "2026-04-01T09:00:00Z", {"wordCount": 2000}, "ch_02"),
    _ev("c3", "chapter_written", "2026-04-01T10:00:00Z", {"wordCount": 3000}, "ch_03"),
    # 2 revisions, counts 2+4 → churn (2, 6, 3.0)
    _ev("r1", "scene_revised", "2026-04-01T11:00:00Z", {"revisionCount": 2}, "ch_01", "sc_01"),
    _ev("r2", "scene_revised", "2026-04-01T12:00:00Z", {"revisionCount": 4}, "ch_01", "sc_02"),
    # engagement scores 5/55/95 → bands 0/50/90; 1 dropoff → rate 0.25
    _ev("g1", "reader_engagement", "2026-04-01T13:00:00Z", {"engagementScore": 5}),
    _ev("g2", "reader_engagement", "2026-04-01T14:00:00Z", {"engagementScore": 55}),
    _ev("g3", "reader_engagement", "2026-04-01T15:00:00Z", {"engagementScore": 95}),
    _ev("d1", "reader_dropoff", "2026-04-01T16:00:00Z", {"engagementScore": 10}),
]


@pytest.fixture(scope="module")
def silver(spark):
    bronze = wrap_bronze(
        spark.createDataFrame([(line,) for line in CORPUS], ["value"]),
        ingest_id="golden",
        ingested_at=AS_OF,
    )
    good, bad = transform(bronze, as_of_ts=AS_OF)
    assert bad.count() == 0
    return good.persist()


def test_writing_velocity(silver):
    rows = writing_velocity_daily(silver).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.chapters_written, r.words_written, r.avg_words_per_chapter) == (3, 6000, 2000.0)
    assert str(r.p_event_date) == "2026-04-01"


def test_revision_churn(silver):
    r = revision_churn_daily(silver).collect()[0]
    assert (r.revision_events, r.revision_count_sum, r.revision_churn_index) == (2, 6, 3.0)


def test_engagement_bands(silver):
    rows = engagement_bands_daily(silver, as_of_date="2026-04-02").collect()
    bands = {r.score_band: (r.engagement_events, r.avg_score_in_band) for r in rows}
    assert bands == {0.0: (1, 5.0), 50.0: (1, 55.0), 90.0: (1, 95.0)}
    assert all(str(r.as_of_date) == "2026-04-02" for r in rows)


def test_dropoff_rate(silver):
    r = dropoff_rate_daily(silver, as_of_date="2026-04-02").collect()[0]
    assert (r.engagement_events, r.dropoff_events, r.total_events) == (3, 1, 4)
    assert r.dropoff_rate == 0.25


def test_stage_bottlenecks(silver):
    rows = stage_bottlenecks(silver, as_of_date="2026-04-02").collect()
    by_stage = {r.stage: r for r in rows}
    # WRITE appears 3x: ch1→ch2 (1h), ch2→ch3 (1h), ch3→revision (1h)
    assert by_stage["WRITE"].stage_hops == 3
    assert by_stage["WRITE"].avg_hours_in_stage == 1.0
    assert by_stage["WRITE"].max_hours_in_stage == 1.0
    # REVISION: r1→r2 (1h), r2→g1 (1h)
    assert by_stage["REVISION"].stage_hops == 2
    # ENGAGEMENT: g1→g2→g3→d1 = 3 hops of 1h each
    assert by_stage["ENGAGEMENT"].stage_hops == 3


def test_velocity_null_wordcount_defaults_zero(spark):
    bronze = wrap_bronze(
        spark.createDataFrame(
            [(_ev("nw", "chapter_written", "2026-04-01T08:00:00Z"),)], ["value"]
        ),
        ingest_id="g2",
        ingested_at=AS_OF,
    )
    good, _ = transform(bronze, as_of_ts=AS_OF)
    r = writing_velocity_daily(good).collect()[0]
    assert r.words_written == 0
    assert r.avg_words_per_chapter is None


def test_churn_missing_count_defaults_one(spark):
    bronze = wrap_bronze(
        spark.createDataFrame(
            [(_ev("nr", "scene_revised", "2026-04-01T08:00:00Z"),)], ["value"]
        ),
        ingest_id="g3",
        ingested_at=AS_OF,
    )
    good, _ = transform(bronze, as_of_ts=AS_OF)
    r = revision_churn_daily(good).collect()[0]
    assert (r.revision_events, r.revision_count_sum, r.revision_churn_index) == (1, 1, 1.0)
