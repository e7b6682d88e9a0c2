"""The five XBoard analytics queries (reference: ``routes/analytics.js``),
re-expressed as pure DataFrame functions over the driver testdata tables
(mapping per FIXTURES.md §B: customer/orders stand in for the per-tenant
customers/orders tables; the tenant filter generalizes to any equality
predicate and is exercised by the reference-domain tests in
``tests/test_xboard_domain.py``).

Every function takes already-loaded DataFrames and returns a lazy DataFrame —
no collect, no driver-side loops. All expressions are built-in (JVM-side,
whole-stage codegen); zero Python UDFs (SURVEY.md §2.8).

Determinism notes (SURVEY.md §7 hard part 4): the reference's LIMIT-1
currency pick (``analytics.js:38``) and unordered LIMIT are nondeterministic;
we pin deterministic semantics (``min`` pick, explicit sort tiebreaks) so the
DuckDB oracle can hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xboard_spark.functions.exact import cent_sum_dollars


def overview(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """A1 scalar-aggregate panel (``routes/analytics.js:33-39``).

    Four scalar subqueries in the reference; here two single-row aggregate
    panels cross-joined — each side is a full-table partial+final hash agg
    (map-side combine, one row shuffled per partition) and the cross join of
    two 1-row frames is free. COALESCE(SUM,0) per ``analytics.js:37``;
    the reference's arbitrary LIMIT-1 pick becomes deterministic ``min``.
    """
    cust_panel = customer.agg(F.count("*").alias("total_customers"))
    order_panel = orders.agg(
        F.count("*").alias("total_orders"),
        F.coalesce(cent_sum_dollars(F.col("o_totalprice")), F.lit(0.0)).alias(
            "total_revenue"
        ),
        F.min("o_orderstatus").alias("sample_status"),
    )
    return cust_panel.crossJoin(order_panel)


def orders_by_date(
    orders: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """A2 daily rollup + P4 conditional date range + T3 sort
    (``routes/analytics.js:54-70``).

    The conditional predicate mirrors the reference's dynamic SQL assembly
    (``analytics.js:63-68``): applied only when bounds are present, inclusive
    on both ends. Filter is applied before the aggregate so it pushes down to
    the parquet scan (min/max row-group skipping — the Spark analog of
    ``idx_orders_created_at``, ``init.sql:63``).
    """
    df = orders
    if start_date is not None:
        df = df.filter(F.col("o_orderdate") >= F.lit(start_date).cast("timestamp"))
    if end_date is not None:
        df = df.filter(F.col("o_orderdate") <= F.lit(end_date).cast("timestamp"))
    return (
        df.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").alias("order_count"),
            cent_sum_dollars(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy(F.desc("order_date"))
    )


def top_customers(orders: DataFrame, customer: DataFrame, k: int = 5) -> DataFrame:
    """J2 + A3 + T1: top-k customers by spend (``routes/analytics.js:85-97``).

    Corrected-join mode (SURVEY.md §2.10 defect 1): joins on customer
    identity, not the reference's tenant-only key. Left join keeps orders
    whose customer is absent, surfaced as 'Guest Customer' via COALESCE
    (``analytics.js:87-88``). The grouped aggregate is partial+final hash agg;
    ORDER BY + LIMIT plans as TakeOrderedAndProject (distributed top-k — no
    full sort at 100 TB). Deterministic tiebreak on the grouping key.
    """
    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"], "left"
    )
    return (
        joined.groupBy(
            F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("cust_id"),
            F.coalesce(F.col("c_name"), F.lit("Guest Customer")).alias("cust_name"),
        )
        .agg(
            F.count("o_orderkey").alias("orders_count"),
            cent_sum_dollars(F.col("o_totalprice")).alias("total_spent"),
        )
        .orderBy(F.desc("total_spent"), F.asc("cust_id"))
        .limit(k)
    )


def recent_orders(orders: DataFrame, limit: int = 10) -> DataFrame:
    """P1 + T2: most recent N orders (``routes/analytics.js:113-122``;
    default 10 per ``analytics.js:109`` — the README's claim of 5 is a
    documented drift, SURVEY.md §2.10 defect 2).

    Plans as TakeOrderedAndProject: each task keeps a local top-N heap, the
    driver merges — O(N) memory regardless of table size. Tiebreak on
    o_orderkey pins determinism within equal timestamps.
    """
    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"
        )
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(limit)
    )


def customer_lookup(
    customer: DataFrame, nation: DataFrame, region: DataFrame, cust_id: int
) -> DataFrame:
    """J1 'me' join: point lookup through FK chain (``routes/analytics.js:16-19``,
    same shape ``routes/auth.js:77-82``), generalized to the
    customer⋈nation⋈region dimension chain.

    The equality filter is pushed below both joins by Catalyst (one row off
    the fact side), and nation/region are broadcast — no shuffle at any scale.
    """
    return (
        customer.filter(F.col("c_custkey") == cust_id)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


def top_customers_faithful(orders: DataFrame, customer: DataFrame, on: str) -> DataFrame:
    """The reference's *actual* (defective) join semantics, kept for parity
    documentation: join on a coarse non-identifying key only
    (``routes/analytics.js:92`` joins orders⟕customers ON tenant_id alone),
    producing an O(|orders|·|customers|) within-key fan-out that inflates
    every per-customer count to the tenant's total order count.

    Not registered in ``queries()`` — exercised by the domain unit tests to
    document the divergence (SURVEY.md §2.10 defect 1).
    """
    joined = orders.join(customer, on=on, how="left")
    return (
        joined.groupBy(
            F.coalesce(F.col("c_name"), F.lit("Guest Customer")).alias("cust_name")
        )
        .agg(
            F.count("o_orderkey").alias("orders_count"),
            cent_sum_dollars(F.col("o_totalprice")).alias("total_spent"),
        )
        .orderBy(F.desc("total_spent"), F.asc("cust_name"))
    )


def top_customers_faithful_panel(
    orders: DataFrame,
    customer: DataFrame,
    modulus: int = 797,
    tenant: int = 7,
) -> DataFrame:
    """Registered divergence exhibit (VERDICT r8 #8): the reference's
    DECLARED ``top_customers`` semantics — join on the coarse tenant key
    alone (``routes/analytics.js:92``) — reproduced over the TPC-H tables
    by deriving one synthetic tenant (``custkey % modulus == tenant``) on
    both sides and running ``top_customers_faithful`` on it. Every
    customer in the tenant fans out to ALL of the tenant's orders, so
    ``orders_count`` reads the tenant's total order count for every row
    and ``total_spent`` the tenant's total revenue — the defect, now in
    driver-hashed evidence (the oracle twin reproduces the same defective
    SQL), not just unit tests.

    The modulus bounds the within-key fan-out to one small tenant
    (~n/797 rows a side) BECAUSE the fan-out is the defect: running the
    faithful semantics tenant-unscoped is quadratic per key, which is
    exactly why the corrected ``top_customers`` joins on customer
    identity. The corrected form remains the engine's real operator."""
    o = orders.filter(F.col("o_custkey") % modulus == tenant)
    c = customer.filter(F.col("c_custkey") % modulus == tenant)
    # the tenant-filtered customer side is ~n/modulus rows — broadcast it
    # so the (deliberately) fan-out join never shuffles the orders side
    return top_customers_faithful(
        o.withColumn("tenant_id", F.lit(tenant)),
        F.broadcast(c.withColumn("tenant_id", F.lit(tenant))),
        "tenant_id",
    )


def tenant_orders_overview(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, tenant_nation: int
) -> DataFrame:
    """The multi-tenant isolation surface (P2) generalized onto the driver
    tables: nationkey stands in for tenant_id; every downstream aggregate
    sees ONLY the tenant's rows, and the plan is linted for the isolation
    predicate before returning (the engine-side analog of the reference
    sourcing tenant_id from the JWT, ``routes/analytics.js:30``)."""
    from xboard_spark.plans.lint import assert_filter_on

    tenant_cust = customer.filter(F.col("c_nationkey") == tenant_nation)
    assert_filter_on(tenant_cust, "c_nationkey")
    joined = orders.join(
        tenant_cust, orders["o_custkey"] == tenant_cust["c_custkey"], "inner"
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            cent_sum_dollars(F.col("o_totalprice")).alias("revenue"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
    )
