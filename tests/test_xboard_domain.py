"""Unit tests for the XBoard reference-domain semantics (SURVEY.md §5.2
item 2): null keys in group-by, empty-group COALESCE, inclusive date
bounds, left-join null side, conflict-update-wins upsert, and the
documented faithful-vs-corrected join divergence."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from xboard_spark.ingest import merge_upsert
from xboard_spark.operators import analytics


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def domain(spark):
    """3 tenants, one empty (FIXTURES.md §A scale), reference-shaped."""
    customers = spark.createDataFrame(
        [
            (1, 10, "a@x.com", "Alice A"),
            (1, 11, None, "Bob B"),  # guest-ish: null email
            (2, 20, "c@y.com", None),  # null name
        ],
        "tenant_id long, shopify_customer_id long, email string, name string",
    )
    orders = spark.createDataFrame(
        [
            (1, 100, 10, 10.0, "USD", _ts("2024-01-01T10:00:00")),
            (1, 101, 10, 20.0, "USD", _ts("2024-01-02T10:00:00")),
            (1, 102, 11, 5.0, "EUR", _ts("2024-01-02T23:59:59")),
            (2, 200, 20, 7.5, "USD", _ts("2024-02-01T00:00:00")),
        ],
        "tenant_id long, shopify_order_id long, customer_id long, "
        "total_price double, currency string, created_at timestamp",
    )
    return customers, orders


def test_overview_empty_tenant_coalesce(spark, domain):
    customers, orders = domain
    # tenant 3 has no rows anywhere: COALESCE(SUM,0) must yield 0, not null
    c3 = customers.filter(F.col("tenant_id") == 3)
    o3 = orders.filter(F.col("tenant_id") == 3)
    row = (
        c3.agg(F.count("*").alias("total_customers"))
        .crossJoin(
            o3.agg(
                F.count("*").alias("total_orders"),
                F.coalesce(F.sum("total_price"), F.lit(0.0)).alias("total_revenue"),
            )
        )
        .first()
    )
    assert row.total_customers == 0
    assert row.total_orders == 0
    assert row.total_revenue == 0.0


def test_date_range_inclusive_both_ends(spark, domain):
    _, orders = domain
    t1 = orders.filter(F.col("tenant_id") == 1)
    out = (
        t1.filter(
            (F.col("created_at") >= F.lit("2024-01-02").cast("timestamp"))
            & (F.col("created_at") <= F.lit("2024-01-02 23:59:59").cast("timestamp"))
        )
    ).count()
    assert out == 2  # both the 10:00 and the 23:59:59 order


def test_groupby_null_keys_grouped_together(spark, domain):
    customers, _ = domain
    # SQL semantics: NULL group keys form one group (analytics.js:89-94 / A3)
    grouped = (
        customers.groupBy("email").agg(F.count("*").alias("n")).collect()
    )
    null_groups = [r for r in grouped if r.email is None]
    assert len(null_groups) == 1


def test_faithful_join_fanout_vs_corrected(spark, domain):
    customers, orders = domain
    orders1 = orders.filter(F.col("tenant_id") == 1)
    cust1 = customers.filter(F.col("tenant_id") == 1)
    # faithful: join on tenant_id only -> every order matches every customer
    faithful = orders1.join(cust1, on="tenant_id", how="left")
    assert faithful.count() == 3 * 2  # 3 orders x 2 customers (fan-out)
    # corrected: join on customer identity -> one row per order
    corrected = orders1.join(
        cust1,
        orders1["customer_id"] == cust1["shopify_customer_id"],
        "left",
    )
    assert corrected.count() == 3


def test_left_join_null_side_coalesce(spark, domain):
    customers, orders = domain
    o = orders.filter(F.col("tenant_id") == 2)
    c = customers.filter(F.col("tenant_id") == 2)
    row = (
        o.join(c, o["customer_id"] == c["shopify_customer_id"], "left")
        .select(
            F.coalesce("email", F.lit("Guest Customer")).alias("email"),
            F.coalesce("name", F.lit("Unknown")).alias("name"),
        )
        .first()
    )
    assert row.email == "c@y.com"
    assert row.name == "Unknown"


def test_merge_upsert_conflict_update_wins(spark):
    current = spark.createDataFrame(
        [(1, 10, 100.0), (1, 11, 50.0), (2, 20, 75.0)],
        "tenant_id long, shopify_order_id long, total_price double",
    )
    updates = spark.createDataFrame(
        [(1, 10, 999.0), (1, 12, 1.0)],
        "tenant_id long, shopify_order_id long, total_price double",
    )
    merged = merge_upsert(
        current, updates, keys=["tenant_id", "shopify_order_id"]
    )
    rows = {(r.tenant_id, r.shopify_order_id): r.total_price for r in merged.collect()}
    assert rows[(1, 10)] == 999.0  # conflict: update wins
    assert rows[(1, 11)] == 50.0  # non-conflicting old row survives
    assert rows[(1, 12)] == 1.0  # new row inserted
    assert rows[(2, 20)] == 75.0
    assert len(rows) == 4


def test_merge_upsert_idempotent(spark):
    current = spark.createDataFrame(
        [(1, 10, 100.0)], "tenant_id long, shopify_order_id long, total_price double"
    )
    updates = spark.createDataFrame(
        [(1, 10, 999.0)], "tenant_id long, shopify_order_id long, total_price double"
    )
    once = merge_upsert(current, updates, ["tenant_id", "shopify_order_id"])
    twice = merge_upsert(once, updates, ["tenant_id", "shopify_order_id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_upsert_duplicate_keys_in_batch_last_wins(spark):
    current = spark.createDataFrame(
        [(1, 10, 100.0)], "tenant_id long, shopify_order_id long, total_price double"
    )
    updates = spark.createDataFrame(
        [(1, 10, 111.0, 1), (1, 10, 222.0, 2)],
        "tenant_id long, shopify_order_id long, total_price double, _batch_priority long",
    )
    merged = merge_upsert(current, updates, ["tenant_id", "shopify_order_id"])
    assert merged.first().total_price == 222.0


def test_recent_orders_deterministic_tiebreak(spark, sf_dir):
    from xboard_spark.io import read_table

    orders = read_table(spark, sf_dir, "orders")
    a = analytics.recent_orders(orders, limit=10).collect()
    b = analytics.recent_orders(orders, limit=10).collect()
    assert a == b
    # strictly descending (date, key)
    seq = [(r.o_orderdate, r.o_orderkey) for r in a]
    assert seq == sorted(seq, reverse=True)


def test_approx_cardinality_bounds(spark, sf_dir_mid):
    """HLL calibration panel (invariant-oracle form since round 9): the
    exact side must MATCH an independent exact aggregate, the bound must
    be the documented integer formula, and the within-bound boolean must
    hold at rsd=2% on real data."""
    from xboard_spark.io import read_table
    from xboard_spark.operators.events import approx_cardinality
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir_mid, "events")
    panel = {r.event_type: r for r in approx_cardinality(ev, rsd=0.02).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(panel) == set(exact)
    for t, a in panel.items():
        e = exact[t]
        assert a.n_events == e.n and a.exact_users == e.users, t
        assert a.users_err_bound == e.users * 3 // 25 + 4, t
        assert a.users_within_bound, t


def test_funnel_strict_ordering(spark):
    """User 1 converts fully in order; user 2's click precedes their view
    (doesn't count); user 3 purchases without clicking (not counted at the
    purchase stage)."""
    from xboard_spark.operators.events import funnel_conversion

    rows = [
        (1, "2024-01-01T10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01T10:05:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01T10:10:00", 1, "purchase", 5.0, "{}"),
        (4, "2024-01-01T10:05:00", 2, "click", 0.0, "{}"),  # before their view
        (5, "2024-01-01T10:06:00", 2, "view", 0.0, "{}"),
        (6, "2024-01-01T10:00:00", 3, "view", 0.0, "{}"),
        (7, "2024-01-01T10:01:00", 3, "purchase", 9.0, "{}"),  # skipped click
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["to_timestamp"]).to_timestamp("ts"))
    out = funnel_conversion(ev).collect()[0]
    assert out.n_view_users == 3
    assert out.n_click_users == 1  # only user 1 clicked after viewing
    assert out.n_purchase_users == 1


def test_global_ntile_matches_native_ntile(spark):
    """global_ntile (range-partitioned exact ntile, no single-partition
    sort) must be bit-identical to F.ntile over a global window — checked
    on a frame with n % 4 != 0 AND duplicate sort values (tiebreak path),
    for several tile counts."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xboard_spark.operators.window_ops import global_ntile

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 20), round(rng.uniform(0, 100), 2)) for i in range(1, 404)]
    df = spark.createDataFrame(rows, "k long, dups long, v double")
    for n_tiles in (3, 4, 7):
        order = [F.desc("dups"), F.asc("k")]
        expected = df.select(
            "k", F.ntile(n_tiles).over(Window.orderBy(*order)).alias("t")
        )
        got = global_ntile(df, n_tiles, order, "t").select("k", "t")
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0


def test_merge_upsert_matches_dict_model_property(spark):
    """Property-based (hypothesis): folding merge_upsert over any sequence
    of batches with unique keys-per-batch is equivalent to folding Python
    dict.update — the executable spec of ON CONFLICT DO UPDATE."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    key_st = st.tuples(st.integers(1, 3), st.integers(1, 6))
    batch_st = st.dictionaries(key_st, st.integers(0, 999), min_size=1, max_size=5)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(batch_st, min_size=1, max_size=4))
    def run(batches):
        schema = "tenant_id int, shopify_order_id int, total int"

        def to_df(b):
            return spark.createDataFrame(
                [(t, o, v) for (t, o), v in b.items()], schema
            )

        state = to_df(batches[0])
        model = dict(batches[0])
        for b in batches[1:]:
            state = merge_upsert(
                state, to_df(b), ["tenant_id", "shopify_order_id"]
            )
            model.update(b)
        got = {
            (r.tenant_id, r.shopify_order_id): r.total for r in state.collect()
        }
        assert got == model

    run()


def test_pii_redact_and_scan(spark):
    """Planted-PII coverage for the scrub pass (the testdata corpus is
    PII-free, so pii_scan's driver row is all zeros — this is where the
    patterns are actually exercised)."""
    from xboard_spark.operators import text

    rows = [
        (1, "contact me at bob@x-corp.io or +1 (415) 555-0199 today", "en", "s1", 54),
        (2, "no pii here just words", "en", "s2", 22),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    red = {r.doc_id: r.text for r in text.redact_pii(docs).collect()}
    assert "[EMAIL]" in red[1] and "[PHONE]" in red[1]
    assert "bob@" not in red[1] and "555" not in red[1]
    assert red[2] == "no pii here just words"
    scan = {r.source: r for r in text.pii_scan(docs).collect()}
    assert scan["s1"].total_emails == 1 and scan["s1"].docs_with_phone == 1
    assert scan["s2"].total_emails == 0 and scan["s2"].total_phones == 0


def test_pii_phone_pattern_ignores_dates_and_ids(spark):
    """Round-3 verdict item: the old PHONE_RE digit-run matched ISO dates
    and order ids, so redact_pii destructively rewrote non-PII text.
    Dates, datetimes, epoch millis, and dashed order ids must survive
    redaction untouched; real phone shapes must still be caught."""
    from xboard_spark.operators import text

    rows = [
        (1, "shipped 2026-08-13 at 2026-08-13 20:54:57 order ORD-2026-12345", "en", "s1", 62),
        (2, "epoch 1700000000000 invoice 123456789 ref 2024.01.15", "en", "s1", 52),
        (3, "call 415-555-0199 or +14155550199 or (415) 555-0199", "en", "s2", 51),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    red = {r.doc_id: r.text for r in text.redact_pii(docs).collect()}
    assert red[1] == rows[0][1]  # dates/order ids untouched
    assert red[2] == rows[1][1]  # epoch/plain ids untouched
    assert "[PHONE]" in red[3] and "0199" not in red[3] and "+1415" not in red[3]
    scan = {r.source: r for r in text.pii_scan(docs).collect()}
    assert scan["s1"].total_phones == 0
    assert scan["s2"].total_phones == 3


def test_repetition_stats_detects_repeats(spark):
    """A doc that is one phrase looped must score near-1 duplicate-3-gram
    fraction and low distinct ratio; fresh text scores 0 dup grams."""
    from xboard_spark.operators import text

    looped = " ".join(["the quick brown fox"] * 10)
    fresh = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, looped, "en", "s", len(looped)), (2, fresh, "en", "s", len(fresh))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    assert float(got[1].dup_3gram_frac) == 1.0  # every 3-gram recurs
    assert float(got[1].distinct_ratio) == 0.1  # 4 distinct / 40 tokens
    assert float(got[2].dup_3gram_frac) == 0.0
    assert float(got[2].distinct_ratio) == 1.0


def test_boilerplate_ngrams_finds_shared_template(spark):
    """A phrase planted in 3 of 4 docs must rank first (df=3) with the
    right occurrence count; a phrase unique to one doc is excluded by
    min_df=2 however often it repeats within that doc."""
    from xboard_spark.operators import text

    boiler = "all rights reserved worldwide"
    rows = [
        (1, f"alpha beta gamma {boiler} delta", "en", "s", 40),
        (2, f"{boiler} epsilon zeta", "en", "s", 30),
        (3, f"eta theta {boiler}", "en", "s", 30),
        (4, "unique phrase here unique phrase here unique phrase here", "en", "s", 56),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = text.boilerplate_ngrams(docs, n=4, min_df=2, top=5).collect()
    assert got, "no cross-doc 4-grams found"
    top = got[0]
    assert top.gram == boiler
    assert top.df == 3 and top.n_occurrences == 3
    assert all(r.df >= 2 for r in got)
    assert not any("unique" in r.gram for r in got)  # df=1, excluded


def test_top_customers_faithful_panel_inflation(spark, sf_dir_mid):
    """The registered divergence exhibit (round 9): in faithful mode every
    customer of the synthetic tenant reads the TENANT's total order count
    and revenue — the fan-out signature of analytics.js:92."""
    from xboard_spark.io import read_table
    from xboard_spark.operators.analytics import top_customers_faithful_panel
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir_mid, "orders")
    customer = read_table(spark, sf_dir_mid, "customer")
    out = top_customers_faithful_panel(orders, customer).collect()
    n_orders = orders.filter(F.col("o_custkey") % 797 == 7).count()
    total = (
        orders.filter(F.col("o_custkey") % 797 == 7)
        .agg(F.round(F.sum("o_totalprice"), 2).alias("t"))
        .collect()[0]
        .t
    )
    assert len(out) >= 1
    for r in out:  # every named customer shows the inflated tenant totals
        assert r.orders_count == n_orders
        assert abs(r.total_spent - total) < 1e-6
