"""Property-based invariants (hypothesis) for the round-4 continuation
operators: attribution conservation, heatmap share normalization,
canonical-selection coverage, and sampling determinism under arbitrary
inputs — the invariants that must hold for EVERY input, not just the
planted fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xboard_spark.operators import dedup, events

TYPES = ["view", "click", "purchase", "signup"]

event_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),      # user_id
        st.integers(min_value=0, max_value=10_000), # offset seconds
        st.sampled_from(TYPES),
    ),
    min_size=1,
    max_size=40,
)


def _ev_df(spark, rows):
    t0 = dt.datetime(2026, 1, 1)
    data = [
        (i, t0 + dt.timedelta(seconds=off), uid, typ, 1.0, "{}")
        for i, (uid, off, typ) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_lists)
def test_attribution_conserves_purchases(spark, rows):
    # every purchase is credited exactly once, whatever the stream shape
    n_purchases = sum(1 for r in rows if r[2] == "purchase")
    out = events.conversion_attribution(_ev_df(spark, rows)).collect()
    assert sum(r.n_purchases for r in out) == n_purchases
    if n_purchases:
        assert abs(sum(r.purchase_share for r in out) - 1.0) < 1e-9


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_lists)
def test_activity_heatmap_shares_normalize(spark, rows):
    out = events.activity_heatmap(_ev_df(spark, rows)).collect()
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    assert sum(r.n_events for r in out) == len(rows)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_lists)
def test_bounce_sessions_partition_sessionize(spark, rows):
    # bounce panel totals must equal the sessionize session count
    df = _ev_df(spark, rows)
    n_sessions = events.sessionize(df).count()
    out = events.bounce_rate_by_dow(df).collect()
    assert sum(r.n_sessions for r in out) == n_sessions
    assert all(0.0 <= r.bounce_rate <= 1.0 for r in out)


doc_lists = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cd"),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_lists)
def test_canonical_docs_cover_every_cluster_once(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, "en", "web") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    clusters = dedup.dedup_clusters(docs).collect()
    canon = dedup.canonical_docs(docs).collect()
    # exactly one representative per cluster; representative is a member
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    assert {r.cluster_id for r in canon} == set(by_cluster)
    for r in canon:
        assert r.rep_doc_id in by_cluster[r.cluster_id]
        assert r.n_members == len(by_cluster[r.cluster_id])


order_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=400),   # day offset
        st.floats(min_value=1.0, max_value=5000.0, allow_nan=False),
    ),
    min_size=2,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=order_lists)
def test_mom_growth_telescopes(spark, rows):
    # product of (1 + growth) over the ladder == last/first month revenue
    from xboard_spark.operators import window_ops

    data = [
        (i, 1, "O", round(v, 2), dt.datetime(2026, 1, 1) + dt.timedelta(days=d), "P")
        for i, (d, v) in enumerate(rows)
    ]
    orders = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = sorted(window_ops.orders_mom_growth(orders).collect(), key=lambda r: r.month)
    prod = 1.0
    for r in out[1:]:
        prod *= 1.0 + r.mom_growth
    if len(out) > 1:
        assert abs(prod - out[-1].revenue / out[0].revenue) < 1e-6


line_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),   # orderkey
        st.integers(min_value=1, max_value=40),   # partkey
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=line_lists)
def test_fanout_profile_conserves_lineitems_and_orders(spark, rows):
    from xboard_spark.operators import tpch

    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = tpch.order_fanout_profile(li).collect()
    assert sum(r.n_lines * r.n_orders for r in out) == len(rows)
    assert sum(r.n_orders for r in out) == len({k for k, _ in rows})


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_lists)
def test_unpivot_conserves_events(spark, rows):
    from xboard_spark.operators import window_ops

    out = window_ops.daily_type_unpivot(_ev_df(spark, rows)).collect()
    assert sum(r.n_events for r in out) == len(rows)
