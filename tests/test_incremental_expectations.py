"""D7 partition-range incremental runs and D8 expectations-file rules."""

from __future__ import annotations

import json

import pytest

from creatorops_lakehouse_spark.contract import rules_from_expectations
from creatorops_lakehouse_spark.pipelines.bronze import wrap_bronze
from creatorops_lakehouse_spark.pipelines.silver import transform


def _ev(eid, occurred, plan="pro"):
    return json.dumps(
        {
            "eventId": eid,
            "eventType": "chapter_written",
            "eventVersion": 1,
            "occurredAt": occurred,
            "tenant": {"tenantId": "t", "authorId": "a", "plan": plan},
            "entity": {"storyId": "s"},
        }
    )


def test_incremental_ingest_date_range(spark):
    b1 = wrap_bronze(
        spark.createDataFrame([(_ev("d1", "2026-04-01T08:00:00Z"),)], ["value"]),
        ingest_id="b1", ingested_at="2026-04-01 12:00:00",
    )
    b2 = wrap_bronze(
        spark.createDataFrame([(_ev("d2", "2026-04-02T08:00:00Z"),)], ["value"]),
        ingest_id="b2", ingested_at="2026-04-02 12:00:00",
    )
    bronze = b1.unionByName(b2)
    # full run sees both; incremental run prunes to the 04-02 partition only
    full, _ = transform(bronze, as_of_ts="2026-04-03 00:00:00")
    assert full.count() == 2
    inc, _ = transform(
        bronze,
        as_of_ts="2026-04-03 00:00:00",
        ingest_date_range=("2026-04-02", "2026-04-02"),
    )
    rows = inc.collect()
    assert [r.event_id for r in rows] == ["d2"]


def test_expectations_yaml_rules(spark, tmp_path):
    spec = """
- reason: INVALID_PLAN
  stage: enum_check
  expr: "parsed.tenant.plan IS NULL OR parsed.tenant.plan IN ('free', 'pro')"
"""
    path = tmp_path / "expectations.yml"
    path.write_text(spec)
    from creatorops_lakehouse_spark.contract import load_expectations_yaml

    extra = load_expectations_yaml(str(path))
    bronze = wrap_bronze(
        spark.createDataFrame(
            [
                (_ev("ok1", "2026-04-01T08:00:00Z", plan="free"),),
                (_ev("bad1", "2026-04-01T09:00:00Z", plan="enterprise"),),
            ],
            ["value"],
        ),
        ingest_id="b", ingested_at="2026-04-01 12:00:00",
    )
    good, bad = transform(bronze, as_of_ts="2026-04-02 00:00:00", extra_rules=extra)
    assert [r.event_id for r in good.collect()] == ["ok1"]
    rejects = bad.collect()
    assert len(rejects) == 1
    assert rejects[0].reject_reason == "INVALID_PLAN"
    assert rejects[0].reject_stage == "enum_check"


def test_expectations_compile_shape():
    rules = rules_from_expectations(
        [{"reason": "R1", "stage": "validation", "expr": "1 = 1"}]
    )
    assert rules[0].reason == "R1"
    assert rules[0].stage == "validation"
