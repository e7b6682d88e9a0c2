"""Analytic depth beyond the reference's five endpoints: TPC-H-shaped
queries over the driver testdata star schema. These generalize the
reference's aggregate/join/top-k shapes (SURVEY.md §2.3-2.5) to multi-way
joins and wide aggregations — the workloads that actually stress shuffle
planning at 100 TB.

Scale design:
- Dimension joins (region, nation, supplier) are broadcast — zero shuffle.
- Fact-fact joins (orders⋈lineitem, customer⋈orders) shuffle on the join
  key; AQE coalesces post-shuffle partitions and splits skew.
- Aggregations are partial+final hash agg (map-side combine) — the shuffle
  carries one row per (partition, group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xboard_spark.functions import exact as X
from pyspark.storagelevel import StorageLevel


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation over lineitem.

    The whole query is one parquet scan + one partial/final hash aggregate on
    a 6-ish-group key — the canonical 100 TB scan benchmark. The date filter
    reaches the scan (row-group min/max skipping).

    Every money/metric column runs in EXACT integer arithmetic
    (``functions.exact``): the factors are quantized (cents / integer
    percents — the reference's NUMERIC columns, ``migrations/init.sql:54``,
    are exact the same way), so ``price*(1-disc)`` and
    ``price*(1-disc)*(1+tax)`` are exact integer "units" per row, the sums
    are associative DECIMAL(38,0) integer sums (bit-identical at any
    partitioning/magnitude), and rounding happens in integer space — never
    on a double (round-11/12 magnitude sweeps: double product sums and
    round-on-huge-double were the two remaining silent cross-engine
    divergence classes)."""
    from xboard_spark.functions import exact as X

    qty_cents = X.cent_units(F.col("l_quantity"))
    price_cents = X.cent_units(F.col("l_extendedprice"))
    disc_pct = X.pct_units(F.col("l_discount"))
    disc_units = X.disc_price_units(
        F.col("l_extendedprice"), F.col("l_discount")
    )
    charge_units = X.charge_units(
        F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    )
    n_dec = F.count("*").cast("decimal(38,0)")
    # round(avg, 6) in integer space: avg = cents/(100*n) dollars, so the
    # 6dp-scaled integer is round(cents*1e4 / n)
    avg6 = lambda cents_sum: X.round_div_units(  # noqa: E731
        cents_sum * F.lit(10000), n_dec, 1e6
    )
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            X.units_sum_dollars(qty_cents, 1).alias("sum_qty"),
            X.units_sum_dollars(price_cents, 1).alias("sum_base_price"),
            X.units_sum_dollars(disc_units, 100).alias("sum_disc_price"),
            X.units_sum_dollars(charge_units, 10000).alias("sum_charge"),
            avg6(F.sum(qty_cents)).alias("avg_qty"),
            avg6(F.sum(price_cents)).alias("avg_price"),
            avg6(F.sum(disc_pct)).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    start_date: str = "1996-01-01",
    end_date: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join + grouped revenue, local-supplier variant
    (customer and supplier in the same nation).

    Join order matters at scale: filter orders by date FIRST (pushdown), join
    the two facts on their natural keys (shuffle), then broadcast the
    dimension chain (supplier/nation/region are small at any realistic
    scale-out; supplier broadcast is borderline at 100 TB — AQE demotes to
    shuffle join automatically if it exceeds the threshold).
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(start_date).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end_date).cast("timestamp"))
    )
    r = region.filter(F.col("r_name") == region_name)
    nr = nation.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), F.asc("nation_name"))
    )


def top_parts_by_revenue(lineitem: DataFrame, part: DataFrame, k: int = 10) -> DataFrame:
    """Top-k parts by discounted revenue: fact⋈dimension + grouped top-k.

    Aggregates on l_partkey BEFORE joining part — the join input shrinks from
    |lineitem| rows to |distinct partkey| rows, and the part dimension joins
    broadcast-side. Never join-then-aggregate when aggregate-then-join is
    semantics-preserving.

    Revenue runs in exact integer units (``functions.exact`` — see
    ``pricing_summary``): the top-k ORDER itself depends on the sums, so
    a last-ulp double divergence here could flip the returned ROWS, not
    just a printed cent.
    """
    from xboard_spark.functions import exact as X

    per_part = lineitem.groupBy("l_partkey").agg(
        X.units_sum_dollars(
            X.disc_price_units(F.col("l_extendedprice"), F.col("l_discount")),
            100,
        ).alias("revenue"),
        X.units_sum_dollars(X.cent_units(F.col("l_quantity")), 1).alias(
            "total_qty"
        ),
    )
    return (
        per_part.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "revenue",
            "total_qty",
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(k)
    )


def segment_top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    order_cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-k within a market segment.

    Customer is filtered to one segment before the join (selective predicate
    first), lineitem revenue aggregates per order, top-k via
    TakeOrderedAndProject.
    """
    c = customer.filter(F.col("c_mktsegment") == segment)
    o = orders.filter(F.col("o_orderdate") < F.lit(order_cutoff).cast("timestamp"))
    rev = (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(k)


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders having at least one late
    lineitem, counted per priority. Uses a true left-semi join (no fan-out,
    no distinct needed), a join kind the reference lacks entirely
    (SURVEY.md §2.9) but any warehouse workload needs.
    """
    # "late" in this schema: shipped more than 30 days after the order date.
    late = lineitem.select("l_orderkey", "l_shipdate")
    joined = orders.join(
        late,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)),
        "left_semi",
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def nation_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    target_nation: str = "NATION_7",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's revenue share per order year —
    CASE-inside-aggregate + date-part extraction. One fact-fact shuffle,
    dimensions broadcast, then a single hash agg keyed by year.

    Both the share and the revenue run in exact integer units
    (``functions.exact`` — see ``pricing_summary``): the share is
    round(num/den, 6) computed as an exact integer ratio — numerator and
    denominator are bit-identical integer sums on both engines, and the
    rounding never touches a double."""
    from xboard_spark.functions import exact as X

    rev_units = X.disc_price_units(
        F.col("l_extendedprice"), F.col("l_discount")
    )
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("n_name") == target_nation, rev_units).otherwise(
                    zero
                )
            ).alias("_num"),
            F.sum(rev_units).alias("_den"),
        )
        .select(
            "order_year",
            # round(share, 6) == round(num * 1e6 / den) / 1e6, exactly
            X.round_div_units(
                F.col("_num") * F.lit(1000000), F.col("_den"), 1e6
            ).alias("mkt_share"),
            X.round_div_units(
                F.col("_den"), F.lit(100).cast("decimal(38,0)"), 100.0
            ).alias("total_revenue"),
        )
        .orderBy("order_year")
    )


def orders_above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated-scalar-subquery shape ("orders larger than their
    customer's average"), expressed in the decorrelated form Catalyst
    itself would produce: per-customer aggregate + equi-join back. Counted
    per status so the output is small and stable.

    The threshold comparison runs in EXACT integer cent space
    (``functions.exact``): ``price > sum/ n`` is evaluated as
    ``cents * n > sum_cents`` — a double-avg threshold put rows within an
    ulp of their customer's mean on different sides per engine (round-11
    magnitude sweep's avg-round class), and here that flips row MEMBERSHIP,
    not just a printed value. The revenue sum is the plain exact cent sum."""
    from xboard_spark.functions import exact as X
    from xboard_spark.functions.exact import cent_sum_dollars

    cents = X.cent_units(F.col("o_totalprice"))
    cust_stats = orders.groupBy("o_custkey").agg(
        F.sum(cents).alias("_cust_cents"),
        F.count("*").cast("decimal(38,0)").alias("_cust_n"),
    )
    return (
        orders.join(cust_stats, "o_custkey")
        .filter(cents * F.col("_cust_n") > F.col("_cust_cents"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above_avg"),
            cent_sum_dollars(F.col("o_totalprice")).alias(
                "revenue_above_avg"
            ),
        )
        .orderBy("o_orderstatus")
    )


def part_type_breakdown(part: DataFrame) -> DataFrame:
    """String-function surface over the part dimension: regexp extraction of
    the noun from p_name, IN-list filter on p_type, grouped stats."""
    noun = F.regexp_extract(F.col("p_name"), "([a-z]+)$", 1)
    # mean over exact integer cents — avg of raw doubles is summation-order
    # dependent and flips round() boundaries between engines
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return (
        part.withColumn("noun", noun)
        .withColumn("cents", cents)
        .filter(F.col("p_type").isin("STANDARD", "SMALL"))
        .groupBy("noun")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("cents") / (F.count("*") * 100.0), 4).alias("avg_price"),
            F.count_distinct("p_brand").alias("n_brands"),
        )
        .orderBy("noun")
    )


def brand_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Disjunctive multi-branch predicate (TPC-H Q19 shape): three
    brand/size/quantity branches OR-ed together over lineitem JOIN part,
    revenue per qualifying brand.

    The optimizer surface this exercises: Catalyst factors the disjunction
    — per-branch conjuncts that mention only one side (p_size bounds, the
    l_quantity envelope) are pushed below the join to their scans
    (PushedFilters shows the OR trees), the brand IN-superset prunes part
    row groups, and the join stays a broadcast on the filtered dimension.
    A naive engine evaluates the whole OR post-join; at 100 TB the
    difference is scanning 3 brands' worth of part vs all of it."""
    branches = [
        ("Brand#12", 1, 15, 1, 11),
        ("Brand#23", 1, 25, 10, 20),
        ("Brand#34", 1, 35, 20, 30),
    ]
    joined = lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    )
    cond = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in branches:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(qty_lo, qty_hi)
        )
        cond = c if cond is None else cond | c
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(revenue), 2).alias("revenue"),
        )
        .orderBy("p_brand")
    )


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """Max-revenue supplier(s) for a quarter (TPC-H Q15 shape): revenue per
    supplier over a shipdate range, keep every supplier whose (2-decimal)
    revenue equals the maximum — the uncorrelated scalar-subquery-in-WHERE
    pattern, decorrelated by Catalyst into an aggregate + broadcast join.
    Date filter is pushed to the lineitem scan; the revenue agg shuffles
    once on l_suppkey; the max is a 1-row broadcast."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end)
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def basket_pairs(lineitem: DataFrame, top: int = 20) -> DataFrame:
    """Market-basket co-occurrence: the part pairs most often bought in the
    SAME order (the co-purchase signal behind "frequently bought together"
    item-item recommenders, Linden et al. 2003) — a self-join the reference
    world would write as lineitem x lineitem on order id.

    Scale shape: distinct (order, part) first — the self-join then fans out
    as sum(basket_size^2) over orders, NOT |lineitem|^2 (TPC-H baskets are
    <= 7 lines; real carts are similarly tiny, so the quadratic is per-key
    constant). One shuffle keys both sides on l_orderkey (co-partitioned
    self-join — a single exchange, reused for both join inputs), the pair
    aggregate shuffles once on the (p1, p2) pair key, and the final top-N
    plans TakeOrderedAndProject (distributed top-k, no global sort). A
    hot-key guard at 100 TB: cap basket size (baskets above ~1k items are
    bots/ETL noise and contribute k^2 pairs each) — here TPC-H bounds it
    structurally.

    Measured alternative: a single-scan form (collect_set per order ->
    higher-order-function pair expansion) halves the scans but ran 9%
    SLOWER at sf0.1 (1.35s vs 1.24s min-of-3) because the pair expansion
    is interpreted while the self-join stays in whole-stage codegen; at
    scan-dominated extreme scale the aggregate form wins — flip when the
    scan is the bottleneck."""
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(top)
    )


def shipping_lag_stats(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-ship lag per order priority: the fulfillment-latency panel
    over the two biggest tables. Lag is whole days (DATE(l_shipdate) -
    DATE(o_orderdate)); the mean is the exact integer-sum division both
    engines evaluate identically.

    Scale shape: large-large equi-join on the orderkey — sort-merge with
    both sides hash-partitioned on the key (the join neither side can
    broadcast at 100 TB; bucketing both tables on orderkey, as
    tests/test_bucketing.py demonstrates, removes the shuffle entirely),
    then a 5-key hash aggregate."""
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("lag_days").cast("long").alias("total_lag_days"),
            (F.sum("lag_days").cast("double") / F.count("*")).alias(
                "avg_lag_days"
            ),
            F.max("lag_days").cast("long").alias("max_lag_days"),
        )
        .orderBy("o_orderpriority")
    )


def brand_supplier_diversity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Supply-chain diversity per brand: distinct suppliers and parts that
    shipped under each brand, from the lineitem evidence (the TPC-H Q16
    shape re-expressed over the tables this lake carries — no partsupp).

    Scale shape: lineitem joins the part DIM on partkey — broadcast-hash
    (part is the small side at every scale ratio; the filter-free dim
    projection is 2 columns); the distinct aggregates are partial+final
    with Expand, keyed on brand."""
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("p_brand")
    )


def revenue_change_forecast(
    lineitem: DataFrame,
    year: int = 1995,
    lo: float = 0.05,
    hi: float = 0.07,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue scan — total discount revenue
    from a one-year window of lineitems in a discount band under a
    quantity cap. THE pure predicate-pushdown benchmark: every filter is
    scan-local (year range + discount band + quantity reach the parquet
    row-group stats), the aggregate is a single global sum, and nothing
    shuffles but one partial-sum row per partition.

    Revenue runs in exact integer units (``functions.exact``, round-13
    half-boundary sweep): price*discount is exact in 1e-4-dollar units,
    the DECIMAL(38,0) sum is associative at any partitioning, and the
    round-to-cents happens in integer space — bit-identical to the
    DuckDB twin even when off-grid inputs land the sum on a repr half
    boundary."""
    rev_units = X.cent_units(F.col("l_extendedprice")) * X.pct_units(
        F.col("l_discount")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            & (F.col("l_discount") >= lo)
            & (F.col("l_discount") <= hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.count("*").alias("n_lineitems"),
            X.units_sum_dollars(rev_units, 100).alias("potential_revenue"),
        )
    )


def prospect_customers(
    customer: DataFrame, orders: DataFrame, dormant_since: str = "2001-01-01"
) -> DataFrame:
    """TPC-H Q22 shape, dormant-customer variant: high-balance customers
    with NO orders since ``dormant_since`` — the decorrelated form of the
    classic scalar-subquery + NOT EXISTS pair (every customer in this
    dataset has ordered at some point, so the pure never-ordered Q22
    predicate is vacuous; the recent-window form is both non-empty and
    what a win-back campaign actually asks). The global positive-balance
    average computes once (1-row frame, broadcast); NOT EXISTS becomes a
    left anti join on the custkey. Threshold and sums round to cents so
    both engines compare against the identical constant.

    Scale shape: one customer scan for the threshold (at 100 TB this is
    the 1-row aggregate you'd cache), one filtered scan anti-joined
    against the date-pruned orders keys (the date filter reaches the
    parquet scan; anti joins shuffle only keys), then a bounded-key
    rollup by nation."""
    thr = customer.filter(F.col("c_acctbal") > 0.0).agg(
        X.round_div_units(
            F.sum(X.cent_units(F.col("c_acctbal"))),
            F.nullif(F.count("c_acctbal"), F.lit(0)).cast("decimal(38,0)"),
            100.0,
        ).alias("thr")
    )
    rich = customer.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("thr")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(dormant_since).cast("timestamp")
    )
    prospects = rich.join(
        recent.select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return (
        prospects.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_prospects"),
            X.cent_sum_dollars(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


# one-slot cache registry for segment_priority_chi2's persisted cell
# frame — see the unpersist note inside the function (ADVICE r11). The
# lock makes the swap atomic under concurrent callers (ADVICE r12: a
# racing pair could double-pop/double-append, leaking a persisted frame
# or unpersisting one a peer still holds); the single-driver harness
# never contends, so it costs nothing there.
_CHI2_CELL_CACHE: list = []
_CHI2_CELL_LOCK = __import__("threading").Lock()


def segment_priority_chi2(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Chi-square independence panel: is order priority independent of
    customer market segment? The contingency table is DENSE over the
    observed category values — every (segment, priority) combination of
    values that appear anywhere in the joined data gets a cell, with
    zero-filled counts for combinations no row realized. A sparse table
    (cells-present-only, the pre-round-10 shape) silently dropped each
    empty cell's (0-E)^2/E = E term AND excluded it from nothing else —
    marginals were already complete — so the statistic was underestimated
    exactly when the association is strongest (a category pair that never
    co-occurs). The grid is |segments| x |priorities| rows built from two
    bounded distinct frames (the traffic_anomalies dense-grid treatment);
    expected counts come from window marginals over that bounded key
    space, never the raw rows, and the statistic is exact-integer counts
    through one identical double expression tree.

    NULL category values are EXCLUDED from the table (both engines,
    identically): the grid-to-observed equi-join can never match a NULL
    key, so a NULL segment/priority row would zero-fill its real counts
    while ``n_cells`` counted the phantom cell and the
    ``count(DISTINCT)``-based dof excluded it — three mutually
    inconsistent treatments. A chi-square test is over KNOWN categories;
    rows with an unknown one are out of the population (the round-10
    null-key-sweep exclusion pattern, here for category columns).

    Output rounds the statistic to 6dp: the per-cell terms are
    deterministic doubles, and rounding absorbs the last-ulp association
    difference of the final 25-term sum across engines."""
    observed = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(
            F.col("c_mktsegment").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        # reuse the bounded cell frame: three consumers below (grid left
        # side, both distinct domains) would otherwise each re-run the
        # full join+aggregate — measured 0.53s -> 1.11s at sf0.1 before
        # the cut. persist (lazy, evictable, lineage intact) rather than
        # localCheckpoint: eager=True ran a Spark job at call time even
        # if the result was never consumed, the checkpointed RDD blocks
        # were pinned until session end (repeated calls accumulated
        # executor storage), and the truncated lineage made the frame
        # unrecoverable on executor loss instead of recomputable
        .persist(StorageLevel.MEMORY_ONLY)
    )
    # the returned frame is lazy, so this function can't unpersist after
    # its consumers run — instead each call releases the PREVIOUS call's
    # cell cache (ADVICE r11): steady state holds exactly one ~25-row
    # cached frame, never an unbounded accumulation; MEMORY_ONLY keeps
    # even that one LRU-evictable
    with _CHI2_CELL_LOCK:
        prev = _CHI2_CELL_CACHE.pop() if _CHI2_CELL_CACHE else None
        _CHI2_CELL_CACHE.append(observed)
    if prev is not None:
        prev.unpersist(blocking=False)
    # dense (segment x priority) grid over the observed category values:
    # both sides are bounded category domains (broadcast cross join), and
    # every marginal stays > 0 because each value occurs in >= 1 row
    segs = observed.select("c_mktsegment").distinct()
    pris = observed.select("o_orderpriority").distinct()
    cells = (
        segs.crossJoin(F.broadcast(pris))
        # the checkpointed frame carries no size statistics, so without
        # the hint this 25-ish-row join fell back to sort-merge (2 SMJ +
        # 6 extra exchanges in the plan audit)
        .join(F.broadcast(observed), ["c_mktsegment", "o_orderpriority"], "left")
        .select(
            "c_mktsegment",
            "o_orderpriority",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    w_seg = Window.partitionBy("c_mktsegment")
    w_pri = Window.partitionBy("o_orderpriority")
    w_all = Window.partitionBy()
    with_marginals = cells.select(
        "c_mktsegment",
        "o_orderpriority",
        "n",
        F.sum("n").over(w_seg).alias("row_tot"),
        F.sum("n").over(w_pri).alias("col_tot"),
        F.sum("n").over(w_all).alias("total"),
    )
    term = (
        F.col("n")
        - F.col("row_tot") * F.col("col_tot") / F.col("total")
    )
    chi = term * term / (
        F.col("row_tot") * F.col("col_tot") / F.col("total")
    )
    return with_marginals.agg(
        F.count("*").cast("long").alias("n_cells"),
        (
            (F.countDistinct("c_mktsegment") - 1)
            * (F.countDistinct("o_orderpriority") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.round(F.sum(chi), 6).alias("chi2"),
    )


def order_fanout_profile(lineitem: DataFrame) -> DataFrame:
    """Fact fan-out profile: how many orders have k lineitems — the
    distribution that prices every orders-lineitem join (expected output
    rows = sum k * n_orders(k)) and the basket-size histogram behind the
    co-purchase operators' cost bounds."""
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines")
    )
    return (
        per_order.groupBy(F.col("n_lines").cast("long").alias("n_lines"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("n_lines")
    )


def supplier_panel(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Supplier dimension panel per nation: counts, account-balance mass,
    and the negative-balance (at-risk) cohort — first-class coverage for
    the one base table the query surface touched only in passing.

    Scale shape: dim-dim broadcast join, bounded-key agg."""
    return (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            X.cent_sum_dollars(F.col("s_acctbal")).alias("total_acctbal"),
            X.round_div_units(
                F.sum(X.cent_units(F.col("s_acctbal"))),
                F.nullif(F.count("s_acctbal"), F.lit(0)).cast(
                    "decimal(38,0)"
                ),
                100.0,
            ).alias("avg_acctbal"),
            F.sum((F.col("s_acctbal") < 0).cast("long")).alias(
                "n_negative"
            ),
        )
        .orderBy("n_name")
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped between a
    nation PAIR (either direction), by supplier nation, customer nation,
    and ship year. The two nation dims broadcast; lineitem joins orders
    on the shared orderkey; the pair predicate keeps both directions and
    the grouped panel separates them.

    Scale shape: the selective nation filters reduce customer/supplier
    BEFORE their joins (predicate-first, like segment_top_orders); the
    only big-side shuffle is lineitem⋈orders on orderkey. Revenue is the
    repo-standard 2dp-rounded double sum."""
    n_s = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n_c = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = supplier.join(
        F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    c = customer.join(
        F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey", "cust_nation")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_items_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking — customers whose RETURNED
    items (l_returnflag = 'R') cost the most revenue in a window; the
    returns-management / fraud triage query. Orders carry the window
    predicate (pushed to the scan), lineitem carries the flag predicate,
    the nation dim broadcasts, and the top-k plans
    TakeOrderedAndProject with a full deterministic tie-break."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    rev = (
        returned.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue")
        )
    )
    return rev.orderBy(F.desc("lost_revenue"), F.asc("c_custkey")).limit(k)


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the order-count distribution over ALL customers —
    how many customers placed exactly N orders, INCLUDING the
    zero-order bucket the inner join would silently drop (the left join
    + count(order) is the point of the query; customers_without_orders
    is this query's N=0 row). Two aggregations: per-customer count,
    then the count-of-counts histogram — both partial/final hash aggs;
    the second one's key domain is tiny."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


def small_qty_part_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#13"
) -> DataFrame:
    """TPC-H Q17 shape: the decorrelated correlated subquery — revenue
    lost to small one-off orders: lineitems of one brand whose quantity
    is below 20% of that PART's average quantity. The correlated
    per-part average decorrelates into ONE aggregate keyed on partkey
    joined back to the fact — the standard rewrite every optimizer
    (and every hand-written Spark job) uses; the per-part avg frame is
    brand-filtered first so it broadcasts.

    Output is a single audited row (avg_yearly = sum/7.0 per the Q17
    convention), COALESCEd to 0 when no lineitem qualifies."""
    p = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.round((F.avg("l_quantity") * 0.2), 6).alias("qty_cut")
    )
    small = li.join(
        F.broadcast(avg_qty), F.col("l_partkey") == F.col("ak")
    ).filter(F.col("l_quantity") < F.col("qty_cut"))
    return small.agg(
        F.count("*").alias("n_small_lineitems"),
        F.round(
            F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2
        ).alias("avg_yearly"),
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 300,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — orders whose TOTAL lineitem
    quantity exceeds ``min_qty``, with their customers, top-k by order
    value. The HAVING-sum semi-filter is one aggregate on the orderkey
    (the same shuffle the join needs) — no correlated subquery, no
    second lineitem scan; the qualifying-key frame is small and
    broadcasts back onto orders⋈customer."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def sole_late_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 60,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape ("suppliers who kept waiting"), adapted to this
    schema: among finalized multi-supplier orders, count per supplier the
    orders where it was the ONLY late supplier — the classic
    EXISTS / NOT-EXISTS correlated pair (another supplier on the order /
    no OTHER late supplier), decorrelated into two aggregates. Lateness
    is l_shipdate more than ``late_days`` days after o_orderdate (this
    dataset has no commit/receipt dates; reference Q21 uses
    receipt>commit — same plan shape, different predicate; cf.
    routes/analytics.js for the reference's own date-window idiom).

    Scale shape: the correlated subqueries become (orderkey, suppkey)
    and (orderkey) hash aggregates over the SAME joined frame — two
    shuffles keyed on natural keys instead of one correlated probe per
    row; the verdict join reuses the orderkey partitioning. The
    per-supplier result is bounded by |suppliers with a late sole
    order| — usually tiny, but NOT a constant (10M+ such suppliers
    would overflow a forced broadcast build), so the name join carries
    no broadcast hint: AQE sees the aggregate's actual size at runtime
    and picks broadcast when it fits, shuffle-hash when it doesn't —
    the graceful-degradation shape for 100 TB (VERDICT r6 design note).
    Top-k is TakeOrderedAndProject with a full deterministic
    tie-break."""
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late_line = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        > late_days
    ).cast("int")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late_line).alias("late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("late").alias("n_late")
    )
    waiting = (
        per_os.filter(F.col("late") == 1)
        .join(
            per_o.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        supplier.select("s_suppkey", "s_name")
        .join(waiting, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"), F.asc("s_suppkey"))
        .limit(k)
    )
