"""Planted-data unit tests for the temporal family (as-of join, bounded
range join, sessionization). Round 3's NTZ regression broke exactly these
operators and only the driver gate noticed — these pin the SEMANTICS on
events with known structure, independent of the oracle harness:

* as-of picks the most recent prior-or-EQUAL view, never a later one,
  and purchases with no prior view keep a null view side;
* the range window is exclusive of the purchase instant and closed at
  -window_sec;
* sessions split strictly-greater than the gap (an exactly-gap-sized
  silence does NOT split);
* everything tolerates the event stream arriving in any row order.
"""

from __future__ import annotations

import datetime as dt

import pytest

from xboard_spark.operators import events as ev
from xboard_spark.operators import temporal


def _t(minute: int, second: int = 0, micro: int = 0) -> dt.datetime:
    return dt.datetime(2025, 6, 1, 12, minute, second, micro)


@pytest.fixture(scope="module")
def stream(spark):
    rows = [
        # user 10: view v1, view v2, purchase p (ties + ordering)
        (1, _t(0), 10, "view", 1.0, "{}"),
        (2, _t(5), 10, "view", 1.0, "{}"),
        (3, _t(9), 10, "purchase", 9.0, "{}"),
        # user 11: purchase with NO prior view; a view AFTER it
        (4, _t(2), 11, "purchase", 5.0, "{}"),
        (5, _t(3), 11, "view", 1.0, "{}"),
        # user 12: view at the EXACT purchase instant (prior-or-equal)
        (6, _t(7), 12, "view", 1.0, "{}"),
        (7, _t(7), 12, "purchase", 3.0, "{}"),
    ]
    # deliberately shuffled input order: operators must not depend on it
    rows = [rows[i] for i in (3, 6, 0, 5, 2, 4, 1)]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_asof_picks_most_recent_prior_view(stream):
    got = {r.purchase_id: r for r in temporal.purchase_asof_view(stream).collect()}
    assert set(got) == {3, 4, 7}
    assert got[3].view_id == 2  # v2 (12:05), not v1 (12:00)
    assert got[3].gap_sec == 240.0  # 12:09 - 12:05
    assert got[4].view_id is None and got[4].gap_sec is None  # no prior view
    # equal timestamp: view counts (prior-or-equal), event_id order breaks
    # the tie (view id 6 sorts before purchase id 7)
    assert got[7].view_id == 6 and got[7].gap_sec == 0.0


def test_range_window_bounds_exclusive_of_instant(spark):
    rows = [
        (1, _t(0, 0), 20, "view", 1.0, "{}"),   # exactly 600s before -> IN
        (2, _t(9, 59, 999999), 20, "view", 1.0, "{}"),  # 1us before -> IN
        (3, _t(10), 20, "view", 1.0, "{}"),      # same instant -> OUT
        (4, _t(10), 20, "purchase", 9.0, "{}"),
        (5, _t(11), 21, "purchase", 2.0, "{}"),  # no views at all
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.purchase_id: r.n_views_before
           for r in temporal.views_before_purchase(df, window_sec=600).collect()}
    assert got[4] == 2  # boundary view + 1us-before view; NOT the same-instant one
    assert got[5] == 0  # coalesce over the empty frame


def test_sessionize_gap_strictly_greater(spark):
    rows = [
        (1, _t(0), 30, "view", 1.0, "{}"),
        (2, _t(30), 30, "view", 1.0, "{}"),       # exactly 30min later: SAME session
        (3, _t(0, 1) + dt.timedelta(hours=2), 30, "view", 1.0, "{}"),  # new session
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sess = ev.sessionize(df, gap_minutes=30).collect()
    assert [(r.session_seq, r.n_events) for r in sess] == [(1, 2), (2, 1)]
    assert sess[0].duration_sec == 1800.0


def test_session_stats_mean_from_exact_micros(stream):
    out = {r.user_id: r for r in ev.session_stats(stream, gap_minutes=30).collect()}
    # user 10: one session of 3 events spanning 9 min = 540s
    assert out[10].n_sessions == 1 and out[10].n_events == 3
    assert out[10].avg_session_sec == 540.0
    # user 12: both events at the same instant -> zero-length session
    assert out[12].avg_session_sec == 0.0


def test_asof_same_instant_view_with_larger_id_is_matched(spark):
    """The round-10 tie-rule fix: a view at ts EQUAL to the purchase whose
    event_id is LARGER than the purchase's still counts as prior-or-equal
    (the plain (ts, event_id) order sorted it after the purchase and
    missed it)."""
    rows = [
        (1, _t(5), 30, "purchase", 9.0, "{}"),
        (2, _t(5), 30, "view", 1.0, "{}"),  # same instant, larger id
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = temporal.purchase_asof_view(df).collect()
    assert len(got) == 1
    assert got[0].view_id == 2 and got[0].gap_sec == 0.0
