"""End-to-end fixture flow (SURVEY.md §5.2 item 3): Shopify-shaped JSON
payloads -> ingest (S2-S4) -> typed silver tables (F5-F8) -> merge upsert
(S7/S8) -> the five analytics queries — the whole reference pipeline in one
test, including re-ingestion with changed values (conflict-update-wins)."""

from __future__ import annotations

import json
import os
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from xboard_spark import ingest


@pytest.fixture(scope="module")
def payload_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shopify")
    customers = {
        "customers": [
            {"id": 1, "email": "a@x.com", "first_name": "Alice", "last_name": "A",
             "created_at": "2024-01-01T00:00:00Z"},
            {"id": 2, "email": None, "first_name": "Bob", "last_name": None,
             "created_at": "2024-01-02T00:00:00Z"},
        ]
    }
    orders = {
        "orders": [
            {"id": 100, "total_price": "10.50", "currency": "USD",
             "created_at": "2024-01-03T10:00:00Z", "customer": {"id": 1}},
            {"id": 101, "total_price": "20.00", "currency": "USD",
             "created_at": "2024-01-04T11:00:00Z", "customer": {"id": 2}},
        ]
    }
    products = {
        "products": [
            {"id": 7, "title": "Widget", "body_html": "<p>x</p>", "vendor": "Acme",
             "product_type": "tool", "handle": "widget"},
        ]
    }
    for name, obj in [("customers", customers), ("orders", orders), ("products", products)]:
        with open(os.path.join(d, f"{name}.json"), "w") as f:
            json.dump(obj, f)
    # re-ingestion batch: order 100 price changed, order 102 new
    orders2 = {
        "orders": [
            {"id": 100, "total_price": "99.99", "currency": "USD",
             "created_at": "2024-01-03T10:00:00Z", "customer": {"id": 1}},
            {"id": 102, "total_price": "5.00", "currency": "EUR",
             "created_at": "2024-01-05T09:00:00Z", "customer": {"id": 1}},
        ]
    }
    with open(os.path.join(d, "orders2.json"), "w") as f:
        json.dump(orders2, f)
    return str(d)


def test_full_pipeline(spark, payload_dir):
    tables = ingest.ingest_tenant_data(
        spark,
        tenant_id=1,
        customers_path=os.path.join(payload_dir, "customers.json"),
        orders_path=os.path.join(payload_dir, "orders.json"),
        products_path=os.path.join(payload_dir, "products.json"),
    )
    customers, orders, products = (
        tables["customers"], tables["orders"], tables["products"]
    )

    # F5: concat_ws skips the null last_name (no 'undefined' artifacts)
    names = {r.shopify_customer_id: r.name for r in customers.collect()}
    assert names[1] == "Alice A"
    assert names[2] == "Bob"

    # F6/F7: money string -> decimal, ISO string -> timestamp
    o = {r.shopify_order_id: r for r in orders.collect()}
    assert o[100].total_price == Decimal("10.50")
    assert o[100].created_at.year == 2024
    assert o[100].customer_shopify_id == 1

    # S11 implemented for real: products land typed
    assert products.count() == 1
    assert products.first().vendor == "Acme"

    # S8 re-ingestion: changed row wins, new row lands, old rows survive
    raw2 = ingest.ingest_entity_json(
        spark, os.path.join(payload_dir, "orders2.json"),
        ingest.ORDER_PAYLOAD, "orders",
    )
    batch2 = ingest.normalize_orders(raw2, tenant_id=1)
    merged = ingest.merge_upsert(
        orders.drop("created_recorded_at"),
        batch2.drop("created_recorded_at"),
        keys=["tenant_id", "shopify_order_id"],
    )
    m = {r.shopify_order_id: r for r in merged.collect()}
    assert len(m) == 3
    assert m[100].total_price == Decimal("99.99")  # update wins
    assert m[101].total_price == Decimal("20.00")  # untouched survives
    assert m[102].total_price == Decimal("5.00")  # insert lands

    # the five analytics over the merged silver (reference-domain shapes)
    merged.createOrReplaceTempView("t_orders")
    customers.createOrReplaceTempView("t_customers")
    overview = spark.sql(
        """SELECT (SELECT count(*) FROM t_customers) AS total_customers,
                  count(*) AS total_orders,
                  coalesce(sum(total_price), 0) AS total_revenue
           FROM t_orders"""
    ).first()
    assert overview.total_customers == 2
    assert overview.total_orders == 3
    assert overview.total_revenue == Decimal("124.99")

    daily = spark.sql(
        """SELECT date(created_at) AS d, count(*) n, sum(total_price) s
           FROM t_orders GROUP BY 1 ORDER BY d DESC"""
    ).collect()
    assert len(daily) == 3  # three distinct order dates

    top = spark.sql(
        """SELECT c.name, count(o.shopify_order_id) AS n,
                  sum(o.total_price) AS spent
           FROM t_orders o LEFT JOIN t_customers c
             ON o.customer_shopify_id = c.shopify_customer_id
           GROUP BY 1 ORDER BY spent DESC LIMIT 5"""
    ).collect()
    assert top[0].name == "Alice A"
    assert top[0].spent == Decimal("104.99")


def test_paginated_capture_overlap(spark, tmp_path):
    """S2 + SURVEY §2.10.3: a 3-page capture with boundary overlaps — the
    engine must see every entity exactly once, with the LATEST page's
    version winning where a row was re-served mid-sweep (the reference
    truncates at one 250-row page; this is the engine-side replacement)."""
    d = tmp_path / "pages"
    os.makedirs(d)
    pages = {
        1: [{"id": 1, "email": "a@x.com", "first_name": "Alice",
             "last_name": "A", "created_at": "2024-01-01T00:00:00Z"},
            {"id": 2, "email": "old@x.com", "first_name": "Bob",
             "last_name": "B", "created_at": "2024-01-02T00:00:00Z"}],
        # cursor re-serves id 2 (updated mid-sweep) + new id 3
        2: [{"id": 2, "email": "new@x.com", "first_name": "Bob",
             "last_name": "B", "created_at": "2024-01-02T00:00:00Z"},
            {"id": 3, "email": "c@x.com", "first_name": "Cara",
             "last_name": "C", "created_at": "2024-01-03T00:00:00Z"}],
        # re-serves id 3 unchanged + new id 4
        3: [{"id": 3, "email": "c@x.com", "first_name": "Cara",
             "last_name": "C", "created_at": "2024-01-03T00:00:00Z"},
            {"id": 4, "email": "d@x.com", "first_name": "Dan",
             "last_name": "D", "created_at": "2024-01-04T00:00:00Z"}],
    }
    for n, rows in pages.items():
        with open(d / f"page-{n}.json", "w") as f:
            json.dump({"customers": rows}, f)
    raw = ingest.ingest_entity_pages(
        spark, str(d), ingest.CUSTOMER_PAYLOAD, "customers"
    )
    got = {r.id: r for r in raw.collect()}
    assert sorted(got) == [1, 2, 3, 4]  # no truncation, no duplicates
    assert got[2].email == "new@x.com"  # page 2 beat page 1 for id 2
    # and the page-merged frame flows through the normal normalize path
    silver = ingest.normalize_customers(raw, tenant_id=9)
    assert silver.count() == 4
    assert {r.email for r in silver.collect()} >= {"new@x.com", "d@x.com"}


def test_paginated_capture_duplicate_id_within_page(spark, tmp_path):
    """Round-3 verdict item: the same id served TWICE in one page tied on
    ``desc(_page)`` and the winner was shuffle-luck. The envelope-array
    position is now the secondary authority key — the later-listed
    version must win, deterministically."""
    d = tmp_path / "pages"
    os.makedirs(d)
    rows = [
        {"id": 7, "email": "stale@x.com", "first_name": "Eve",
         "last_name": "E", "created_at": "2024-02-01T00:00:00Z"},
        {"id": 8, "email": "f@x.com", "first_name": "Fay",
         "last_name": "F", "created_at": "2024-02-02T00:00:00Z"},
        # id 7 re-listed later in the SAME page with an updated email
        {"id": 7, "email": "fresh@x.com", "first_name": "Eve",
         "last_name": "E", "created_at": "2024-02-01T00:00:00Z"},
    ]
    with open(d / "page-1.json", "w") as f:
        json.dump({"customers": rows}, f)
    got = {
        r.id: r
        for r in ingest.ingest_entity_pages(
            spark, str(d), ingest.CUSTOMER_PAYLOAD, "customers"
        ).collect()
    }
    assert sorted(got) == [7, 8]
    assert got[7].email == "fresh@x.com"  # later array position won


def test_paginated_capture_keeps_null_id_rows(spark, tmp_path):
    """Entities whose id is missing (or fails the LongType cast) have no
    merge identity: the paginated path must pass them through un-deduped
    like the single-file path — partitionBy(id) used to group every NULL
    across all pages and keep exactly one."""
    d = tmp_path / "nullid"
    os.makedirs(d)
    for page, rows in [
        (1, [{"email": "lost1@x.com"}, {"id": 5, "email": "keep@x.com"}]),
        (2, [{"email": "lost2@x.com"}]),
    ]:
        with open(d / f"page-{page}.json", "w") as f:
            f.write(json.dumps({"customers": rows}))
    out = ingest.ingest_entity_pages(
        spark, str(d), ingest.CUSTOMER_PAYLOAD, "customers"
    ).collect()
    assert len(out) == 3  # nothing vanished
    assert sorted(r.email for r in out if r.id is None) == [
        "lost1@x.com",
        "lost2@x.com",
    ]


def test_pretty_printed_capture_body_parses(spark, tmp_path):
    """A pretty-printed (multi-line) API response body must parse — the
    JSON-Lines default mode yielded a NULL envelope and ZERO rows with no
    error."""
    d = tmp_path / "pretty"
    os.makedirs(d)
    body = {"customers": [{"id": 1, "email": "a@x.com"},
                          {"id": 2, "email": "b@x.com"}]}
    with open(d / "page-1.json", "w") as f:
        f.write(json.dumps(body, indent=2))  # multi-line
    single = d / "single.json"
    with open(single, "w") as f:
        f.write(json.dumps(body, indent=2))
    got_pages = ingest.ingest_entity_pages(
        spark, str(d), ingest.CUSTOMER_PAYLOAD, "customers"
    ).count()
    got_single = ingest.ingest_entity_json(
        spark, str(single), ingest.CUSTOMER_PAYLOAD, "customers"
    ).count()
    assert got_pages == 2 and got_single == 2


def test_capture_merge_demo_resolves_overlap_and_in_page_dup(spark):
    """The driver-hashed S5 face: evens must resolve to page 1 (cursor
    re-serve overlap), the %10==0 ids to the LATER in-page v3 listing,
    and odd ids with id % 3 == 2 appear on neither page. custkeys 1..10:
    v1 = {1, 3, 7, 9} (odd, not 2 mod 3 — 5 is 2 mod 3), v2 = {2, 4, 6,
    8}, v3 = {10}."""
    cust = spark.createDataFrame(
        [(k, f"cust#{k}") for k in range(1, 11)],
        "c_custkey long, c_name string",
    )
    out = {r.version_tag: r for r in ingest.capture_merge_demo(cust).collect()}
    assert set(out) == {"v1", "v2", "v3"}
    assert (out["v1"].n_customers, out["v1"].id_sum) == (4, 1 + 3 + 7 + 9)
    assert (out["v2"].n_customers, out["v2"].id_sum) == (4, 2 + 4 + 6 + 8)
    assert (out["v3"].n_customers, out["v3"].id_sum) == (1, 10)
    assert all(r.n_ids == r.n_customers for r in out.values())
