"""Incremental-maintenance operators: the lakehouse patterns that keep
derived tables fresh WITHOUT full recomputes — partial-aggregate merge
(materialized-rollup maintenance) and snapshot diff (CDC classification).

The reference's Postgres world gets both implicitly (every upsert row
updates indexes/aggreg-on-read immediately, ``dataIngestion.js:32-63``);
at 100 TB a derived table is recomputed incrementally or not at all, so
these are first-class operators here. Both are registered under the
oracle gate with FULL-RECOMPUTE oracles — the driver literally verifies
"incremental == recompute", which is the whole correctness contract of
incremental maintenance."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_daily_rollup(
    orders: DataFrame, cutoff: str = "1997-01-01"
) -> DataFrame:
    """Daily order rollup maintained INCREMENTALLY: the pre-``cutoff``
    slice plays the persisted rollup table (built yesterday), the
    post-``cutoff`` slice is the newly-arrived delta; the delta's partial
    aggregates merge into the stored partials without re-reading history.
    This works because count/sum are ALGEBRAIC (partials re-combine:
    count += count, sum += sum) — the same property Spark's own
    partial/final HashAggregate exploits map-side, lifted to cross-batch
    maintenance (the ``foreachBatch`` silver-rollup pattern in
    ``streaming/webhook.py``, expressed as a verifiable batch op).

    Scale: history is touched only through its (tiny) stored partials —
    per-day rows, not per-order; the delta pays one scan + one shuffle on
    the group key. The oracle recomputes the rollup FROM SCRATCH over all
    orders — the gate proves incremental == recompute. Revenue partials
    are EXACT integer cents (round-13 half-boundary sweep), so the
    cross-batch merge is genuinely algebraic: long addition re-associates
    losslessly where the previous double partials could drift a cent at a
    repr half-boundary, and incremental == recompute holds bit-exactly at
    any batch split."""
    day = F.to_date("o_orderdate").alias("order_date")
    base_partials = (
        orders.filter(F.col("o_orderdate") < cutoff)
        .groupBy(day)
        .agg(
            F.count("*").alias("order_count"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rev_cents"),
        )
    )
    delta_partials = (
        orders.filter(F.col("o_orderdate") >= cutoff)
        .groupBy(day)
        .agg(
            F.count("*").alias("order_count"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rev_cents"),
        )
    )
    return (
        base_partials.unionByName(delta_partials)
        .groupBy("order_date")
        .agg(
            F.sum("order_count").cast("long").alias("order_count"),
            (F.sum("rev_cents").cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .orderBy("order_date")
    )


def cdc_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Snapshot diff / CDC classification: full outer join two snapshots
    on the business key and tag each key ``inserted`` / ``deleted`` /
    ``updated`` / ``unchanged`` — the change feed a downstream consumer
    needs when the source can only deliver full snapshots (the common
    worst case for SaaS exports like the reference's Shopify pulls).

    One shuffle keyed on the business key (co-partitioned full outer
    join); the comparison is a null-safe equality over ``compare_cols``
    (``eqNullSafe`` — NULL == NULL is 'unchanged', NULL vs value is a
    real update), all JVM-side."""
    o = old.select(
        F.col(key).alias("_k"), *[F.col(c).alias(f"_o_{c}") for c in compare_cols]
    )
    n = new.select(
        F.col(key).alias("_k"), *[F.col(c).alias(f"_n_{c}") for c in compare_cols]
    )
    joined = o.withColumn("_in_old", F.lit(True)).join(
        n.withColumn("_in_new", F.lit(True)), "_k", "full_outer"
    )
    same = None
    for c in compare_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("_in_old").isNull(), "inserted")
        .when(F.col("_in_new").isNull(), "deleted")
        .when(same, "unchanged")
        .otherwise("updated")
    )
    return joined.select(F.col("_k").alias(key), change.alias("change"))


def orders_cdc_summary(orders: DataFrame) -> DataFrame:
    """Oracle-checkable CDC demo on the testdata ``orders`` table: the
    "new snapshot" re-prices every 100th order (same synthetic update
    batch as ``ingest.orders_upsert_demo``), drops keys ending in 97
    (deletions), and adds high-key clones (insertions); the diff is then
    summarized per change class."""
    updates = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 100 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        ).otherwise(F.col("o_totalprice")),
    )
    new = updates.filter(F.col("o_orderkey") % 100 != 97).unionByName(
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
        ).filter(F.col("o_orderkey") % 100 == 50)
    )
    diff = cdc_diff(
        orders, new, key="o_orderkey", compare_cols=["o_totalprice"]
    )
    return (
        diff.groupBy("change")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("change")
    )


def incremental_nation_rollup(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    cutoff: str = "1997-01-01",
) -> DataFrame:
    """Incremental maintenance of a JOIN view: the per-nation revenue
    rollup (orders ⋈ customer ⋈ nation) kept fresh by merging only the
    DELTA of new orders — the join-view extension of
    ``incremental_daily_rollup``. A join view is incrementally
    maintainable when the delta arrives on the fact side only: the delta
    joins the (slowly-changing) dims and its partials merge into the
    stored per-nation partials; history is never re-joined or re-read
    beyond its ~25 stored partial rows (classic IVM, cf. Gupta &
    Mumick's delta rules — insert-only fact delta is the easy,
    common case).

    Scale shape: the delta pays one scan + one FK join (nation
    broadcast; customer a broadcast or shuffle join as Catalyst prices
    it — at 100 TB of orders the customer dim is still the small side) +
    one partial aggregate on ~25 keys. The oracle recomputes the view
    from scratch over ALL orders — the gate proves incremental ==
    recompute, the defining contract. Revenue partials are exact integer
    CENTS (``functions.exact``), so merging stored partials with delta
    partials is plain long addition — incremental == recompute is an
    exact identity at any magnitude, not a 2dp-tolerance one (the
    pre-round-11 double partials re-associated on merge and leaned on
    the round)."""
    cust_nation = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("nation"))

    def partials(o: DataFrame) -> DataFrame:
        return (
            o.select("o_custkey", "o_totalprice")
            .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("nation")
            .agg(
                F.count("*").alias("order_count"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("revenue_cents"),
            )
        )

    base = partials(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partials(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("nation")
        .agg(
            F.sum("order_count").cast("long").alias("order_count"),
            (
                F.sum("revenue_cents").cast("double") / F.lit(100.0)
            ).alias("revenue"),
        )
        .orderBy("nation")
    )
