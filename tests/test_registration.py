"""Registration flow (S9/S10, routes/auth.js) + approx-distinct accuracy +
the tenant-filter lint — the remaining reference rows and engine
invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from xboard_spark import ingest
from xboard_spark.io import read_table
from xboard_spark.plans.lint import assert_filter_on


@pytest.fixture()
def empty_tables(spark):
    tenants = spark.createDataFrame([], ingest.TENANT_SCHEMA)
    users = spark.createDataFrame([], ingest.USER_SCHEMA)
    return tenants, users


def test_register_assigns_sequential_ids(spark, empty_tables):
    tenants, users = empty_tables
    tenants, users, tid1 = ingest.register_tenant(
        spark, tenants, users, "a.example", "tok-a", "a@x.com", "hash-a"
    )
    tenants, users, tid2 = ingest.register_tenant(
        spark, tenants, users, "b.example", "tok-b", "b@x.com", "hash-b"
    )
    assert (tid1, tid2) == (1, 2)
    assert {r.id for r in tenants.collect()} == {1, 2}
    u = {r.email: r for r in users.collect()}
    assert u["a@x.com"].tenant_id == 1
    assert u["b@x.com"].tenant_id == 2


def test_register_duplicate_email_rejected(spark, empty_tables):
    tenants, users = empty_tables
    tenants, users, _ = ingest.register_tenant(
        spark, tenants, users, "a.example", "tok", "a@x.com", "h"
    )
    with pytest.raises(ValueError, match="already exists"):
        ingest.register_tenant(spark, tenants, users, "c.example", "t", "a@x.com", "h")


def test_assign_ids_continues_from_max(spark):
    existing = spark.createDataFrame(
        [(7, "x")], "id long, v string"
    )
    new = spark.createDataFrame([(None, "a"), (None, "b")], "id long, v string")
    out = ingest.assign_ids(existing, new)
    assert sorted(r.id for r in out.collect()) == [8, 9]


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """The 100 TB twin of count_distinct: HLL++ must land within its
    documented error (rsd default 5%) of the exact count."""
    events = read_table(spark, sf_dir, "events")
    row = events.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_tenant_filter_lint(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    filtered = orders.filter(F.col("o_custkey") == 7)
    assert_filter_on(filtered, "o_custkey")  # passes
    with pytest.raises(ValueError, match="isolation predicate"):
        assert_filter_on(orders, "o_custkey")  # no filter -> lint trips


def test_backfill_orchestration(spark, empty_tables):
    import datetime as dt

    from xboard_spark.ingest import run_backfill, tenants_needing_backfill

    tenants, users = empty_tables
    for shop, email in [("a.example", "a@x.com"), ("b.example", "b@x.com")]:
        tenants, users, _ = ingest.register_tenant(
            spark, tenants, users, shop, "tok", email, "h"
        )
    # both have last_backfill_at NULL -> both due
    assert tenants_needing_backfill(tenants).count() == 2

    seen = []

    def fake_ingest(row):
        seen.append(row.shop_domain)
        if row.shop_domain == "b.example":
            raise RuntimeError("shopify 429")
        return {"customers": 3}

    tenants2, runs = run_backfill(spark, tenants, fake_ingest)
    assert sorted(seen) == ["a.example", "b.example"]
    by_status = {r.status: r for r in runs.collect()}
    assert by_status["success"].tenant_id == 1
    assert "429" in by_status["failed"].details
    # success stamped, failure left due for retry
    assert tenants_needing_backfill(tenants2).count() == 1


def test_backfill_survives_unserializable_ingest_details(spark, empty_tables):
    """ingest_fn naturally returns dict[str, DataFrame] (the S12 pipeline
    does); serializing the run-log details must not crash the orchestrator
    AFTER a successful ingest (json.dumps(DataFrame) raised TypeError and
    lost every accumulated run record)."""
    from xboard_spark.ingest import run_backfill

    tenants, users = empty_tables
    tenants, users, _ = ingest.register_tenant(
        spark, tenants, users, "a.example", "tok", "a@x.com", "h"
    )

    def frame_returning_ingest(row):
        return {"customers": spark.range(3)}  # a DataFrame, not JSON

    tenants2, runs = run_backfill(spark, tenants, frame_returning_ingest)
    row = runs.first()
    assert row.status == "success"
    assert "DataFrame" in row.details  # default=str stringified it


def test_tenant_filter_lint_rejects_lookalike_predicates(spark, sf_dir):
    """The lint must anchor on the exact column token next to =/IN — a
    substring match passed on a parent_tenant_id filter and on a bare
    isnotnull(tenant_id), neither of which isolates a tenant."""
    orders = read_table(spark, sf_dir, "orders")
    # a filter on a DIFFERENT column whose name merely contains the token
    lookalike = orders.withColumnRenamed(
        "o_custkey", "parent_o_key"
    ).filter(F.col("parent_o_key") == 7)
    with pytest.raises(ValueError, match="isolation predicate"):
        assert_filter_on(lookalike, "o_key")
    # isnotnull alone is not isolation
    notnull_only = orders.filter(F.col("o_custkey").isNotNull())
    with pytest.raises(ValueError, match="isolation predicate"):
        assert_filter_on(notnull_only, "o_custkey")
    # IN-list isolation still passes
    assert_filter_on(
        orders.filter(F.col("o_custkey").isin(7, 8)), "o_custkey"
    )
