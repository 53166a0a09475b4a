"""n-stage funnel operator semantics (operators/sequence.py).

First-match ordering is the part a naive per-type MIN gets wrong: a user
who clicks BEFORE their first view must not count as clicked_after_view
even though they have both event types. These fixtures pin that, the
strictly-after boundary, stage dropout, and the input validation."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from creatorops_lakehouse_spark.operators.sequence import funnel, funnel_stage_times


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes view(1) -> click(2) -> purchase(3)
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2 clicks BEFORE first view: has all types but breaks the order
        (2, "click", _ts(1)), (2, "view", _ts(2)), (2, "purchase", _ts(3)),
        # u3 view only
        (3, "view", _ts(1)),
        # u4 click at the SAME ts as first view: strictly-after excludes it,
        # the later click qualifies
        (4, "view", _ts(1)), (4, "click", _ts(1)), (4, "click", _ts(5)),
        # u5 never views
        (5, "purchase", _ts(1)),
    ]
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def _stages():
    # built lazily: Column construction needs an active SparkContext
    return [
        ("viewed", F.col("event_type") == "view"),
        ("clicked", F.col("event_type") == "click"),
        ("purchased", F.col("event_type") == "purchase"),
    ]


def test_funnel_first_match_ordering(events):
    row = funnel(events, _stages()).collect()[0]
    assert row.n_users == 5
    assert row.n_viewed == 4          # u1 u2 u3 u4
    assert row.n_clicked == 2         # u1; u4 via the LATER click only
    assert row.n_purchased == 1       # u1 (u2's purchase follows no ordered click)
    assert row.conversion_bp == 2500  # 10000 * 1 // 4


def test_funnel_stage_times_strictly_after(events):
    stages = funnel_stage_times(events, [p for _, p in _stages()])
    clicked = {r.user_id: r.t_1 for r in stages[1].collect()}
    assert clicked == {1: _ts(2), 4: _ts(5)}  # u4's ts(1) click excluded


def test_funnel_within_windows(events):
    # u1 clicks 1 min after view, u4 clicks 4 min after first view (ts 1->5).
    # A 60-second window admits u1's click exactly AT the boundary (<=)
    # and excludes u4's.
    row = funnel(events, _stages(), within=[60, None]).collect()[0]
    assert row.n_viewed == 4
    assert row.n_clicked == 1      # u1 at exactly +60s; u4's +240s is out
    assert row.n_purchased == 1    # u1's purchase (gap unbounded)


def test_funnel_validation(events):
    with pytest.raises(ValueError, match="at least one stage"):
        funnel_stage_times(events, [])
    with pytest.raises(ValueError, match="duplicate stage names"):
        funnel(events, [("a", F.lit(True)), ("a", F.lit(True))])
    with pytest.raises(ValueError, match="within must have"):
        funnel_stage_times(events, [p for _, p in _stages()], within=[60])


def test_fractional_second_window_not_truncated(spark):
    # u1 clicks 400 ms after view, u2 clicks 800 ms after: a 0.5 s window
    # must admit u1 only (regression: int() truncated 0.5 -> 0 s, which
    # with the strictly-after filter silently matched nothing)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", base), (1, "click", base + dt.timedelta(milliseconds=400)),
        (2, "view", base), (2, "click", base + dt.timedelta(milliseconds=800)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    stages = funnel_stage_times(
        ev,
        [F.col("event_type") == "view", F.col("event_type") == "click"],
        within=[0.5],
    )
    assert [r.user_id for r in stages[1].collect()] == [1]


def test_funnel_by_group_per_cohort_counts(spark, events):
    from creatorops_lakehouse_spark.operators.sequence import funnel_by_group

    # cohort A: u1 (full chain), u2 (broken order), u3 (view only)
    # cohort B: u4 (view -> later click), u5 (never views)
    cohort = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")],
        ["user_id", "cohort"],
    )
    ev = events.join(cohort, "user_id")
    got = {
        r.cohort: r.asDict()
        for r in funnel_by_group(ev, _stages(), group_cols=["cohort"]).collect()
    }
    a, b = got["A"], got["B"]
    assert (a["n_users"], a["n_viewed"], a["n_clicked"], a["n_purchased"]) == (
        3, 3, 1, 1,
    )
    assert a["conversion_bp"] == 10000 * 1 // 3
    assert (b["n_users"], b["n_viewed"], b["n_clicked"], b["n_purchased"]) == (
        2, 1, 1, 0,
    )
    assert b["conversion_bp"] == 0


def test_funnel_by_group_zero_stage0_group_reports_zeros(spark, events):
    from creatorops_lakehouse_spark.operators.sequence import funnel_by_group

    # u5 alone in cohort C: no view at all -> all stage counts 0, not a
    # dropped row
    cohort = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "A"), (5, "C")],
        ["user_id", "cohort"],
    )
    ev = events.join(cohort, "user_id")
    got = {
        r.cohort: r.asDict()
        for r in funnel_by_group(ev, _stages(), group_cols=["cohort"]).collect()
    }
    c = got["C"]
    assert (c["n_users"], c["n_viewed"], c["n_clicked"], c["n_purchased"]) == (
        1, 0, 0, 0,
    )
    assert c["conversion_bp"] == 0


def test_funnel_by_group_requires_group_cols(spark, events):
    from creatorops_lakehouse_spark.operators.sequence import funnel_by_group

    with pytest.raises(ValueError, match="group column"):
        funnel_by_group(events, _stages(), group_cols=[])
