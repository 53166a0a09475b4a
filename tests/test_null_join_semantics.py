"""SURVEY.md §7.4 risk pin: full-outer-join semantics on nullable keys.

The reference's KPI-4 joins on (p_event_date, tenant_id, story_id,
series_id) where series_id is nullable. SQL equality never matches NULLs,
so a null-series engagement row and a null-series dropoff row must NOT
merge — each survives the full outer join as its own row with the other
side null-filled. The reference's generator always populates series_id so
it never exercises this; our engine pins it explicitly."""

from __future__ import annotations

import json

from creatorops_lakehouse_spark.pipelines.bronze import wrap_bronze
from creatorops_lakehouse_spark.pipelines.gold import dropoff_rate_daily
from creatorops_lakehouse_spark.pipelines.silver import transform

AS_OF = "2026-04-02 00:00:00"


def _ev(eid, etype, series=None):
    ev = {
        "eventId": eid,
        "eventType": etype,
        "eventVersion": 1,
        "occurredAt": "2026-04-01T10:00:00Z",
        "tenant": {"tenantId": "t1", "authorId": "a1"},
        "entity": {"storyId": "s1"},
    }
    if series:
        ev["entity"]["seriesId"] = series
    return json.dumps(ev)


def test_null_series_keys_do_not_merge(spark):
    lines = [
        _ev("g1", "reader_engagement"),          # series NULL
        _ev("d1", "reader_dropoff"),             # series NULL
        _ev("g2", "reader_engagement", "ser_1"),  # series present
        _ev("d2", "reader_dropoff", "ser_1"),
    ]
    bronze = wrap_bronze(
        spark.createDataFrame([(line,) for line in lines], ["value"]),
        ingest_id="b", ingested_at=AS_OF,
    )
    good, _ = transform(bronze, as_of_ts=AS_OF)
    rows = dropoff_rate_daily(good, as_of_date="2026-04-02").collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r.series_id, []).append(r)
    # non-null keys merge into one row with rate 1/2
    assert len(by_series["ser_1"]) == 1
    assert by_series["ser_1"][0].dropoff_rate == 0.5
    # null keys DON'T match each other: engagement-only row + dropoff-only
    # row, each null-filled on the other side
    null_rows = sorted(
        by_series[None], key=lambda r: r.engagement_events, reverse=True
    )
    assert len(null_rows) == 2
    assert (null_rows[0].engagement_events, null_rows[0].dropoff_events) == (1, 0)
    assert (null_rows[1].engagement_events, null_rows[1].dropoff_events) == (0, 1)
    assert null_rows[0].dropoff_rate == 0.0
    assert null_rows[1].dropoff_rate == 1.0
