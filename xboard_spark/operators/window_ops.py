"""Relational surface the reference explicitly lacks (SURVEY.md §2.9:
window functions, set operations, DISTINCT aggregates, rollup/grouping
sets, anti joins, percentiles, pivot) — required for "a user of the
reference could switch and run every query they'd ever grow into", and all
cheap wins on Spark since Catalyst plans them natively.

Scale notes: ranking windows shuffle once on their partition key; rollup is
a multi-pass partial aggregate (Expand + hash agg — no extra scan); exact
percentiles need a sort per group (use approx_percentile at 100 TB — both
are exposed); anti join plans as broadcast-anti for small right sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xboard_spark.functions.exact import cent_sum_dollars


def nation_customer_ranks(customer: DataFrame, nation: DataFrame, k: int = 3) -> DataFrame:
    """Ranking windows: top-k customers by account balance per nation, with
    rank, the customer's own share of the nation's total balance
    (``balance_share``), and the RUNNING share accumulated through that
    rank (``running_share`` — a cumulative unbounded-preceding frame over
    the rank order; the round-9 symmetric-defect review found the
    docstring promised this while the code emitted only the static
    share). Both windows reuse the one shuffle on n_name."""
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    by_nation = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    running = by_nation.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nation_total = Window.partitionBy("n_name")
    total = F.sum("c_acctbal").over(nation_total)
    return (
        joined.withColumn("rnk", F.row_number().over(by_nation))
        .withColumn("balance_share", F.round(F.col("c_acctbal") / total, 6))
        .withColumn(
            "running_share",
            F.round(F.sum("c_acctbal").over(running) / total, 6),
        )
        .filter(F.col("rnk") <= k)
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("rnk").cast("long").alias("rnk"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "balance_share",
            "running_share",
        )
        .orderBy("nation_name", "rnk")
    )


def segment_setops(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets (BUILDING-segment
    vs high-value buyers), tagged and counted — one row per set op."""
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    big_buyers = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    parts = [
        ("union", building.union(big_buyers).distinct()),
        ("intersect", building.intersect(big_buyers)),
        ("except", building.exceptAll(big_buyers).distinct()),
    ]
    out = None
    for tag, df in parts:
        row = df.agg(F.count("*").alias("n_customers")).select(
            F.lit(tag).alias("set_op"), "n_customers"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("set_op")


def status_distinct_aggs(orders: DataFrame) -> DataFrame:
    """DISTINCT aggregates (absent from the reference): distinct customers
    and distinct order months per status. At 100 TB the approx twin
    (approx_count_distinct / HLL++) replaces the exact shuffle-heavy form —
    both are exposed; the exact one is the oracle-checked surface."""
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count_distinct(F.date_trunc("month", "o_orderdate")).alias("n_months"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def _grand_total_if_empty(
    src: DataFrame, keys: list, zero_aggs: list, gid: int
) -> DataFrame:
    """The SQL-standard ROLLUP/CUBE on an EMPTY relation emits the ``()``
    grand-total grouping set's row where Spark's Expand-based plan emits
    zero rows (round-12 empty sweep; VERDICT r12 #4). Aggregates over
    zero rows are CLOSED-FORM — COUNT is 0, sums are NULL — so the row is
    pure typed literals (``zero_aggs``) over a 1-row range, NEVER a
    second aggregate scan of ``src`` (the first cut used a global agg
    here; the plan audit showed it doubling the operators' shuffle/scan
    count — a full re-scan of the table at any scale, paid on every run,
    to build a row discarded whenever any data exists). It is kept ONLY
    when the relation is empty: a broadcast LEFT ANTI against a
    ``limit(1)`` probe — a first-partition CollectLimit, never a full
    scan. tests/test_grouping_sets_empty.py pins both the empty-input
    row and the non-empty no-duplication."""
    grand = src.sparkSession.range(1).select(
        *[
            F.lit(None).cast(src.schema[k].dataType).alias(k)
            for k in keys
        ],
        *zero_aggs,
        F.lit(gid).cast("long").alias("gid"),
    )
    probe = src.select(F.lit(1).alias("_one")).limit(1)
    return grand.join(F.broadcast(probe), F.lit(True), "left_anti")


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP (returnflag, linestatus): subtotals + grand total with
    grouping_id — one Expand + hash aggregate, no extra scans, plus the
    ``_grand_total_if_empty`` guard so an empty relation yields the
    standard's ``()`` row instead of Spark's zero rows.

    Revenue runs in exact integer units (``functions.exact`` — see
    ``tpch.pricing_summary``): the GRAND-total row sums the entire table,
    the first place a double product sum's association-order divergence
    shows up as the data grows."""
    from xboard_spark.functions import exact as X

    main = lineitem.rollup("l_returnflag", "l_linestatus").agg(
        X.units_sum_dollars(
            X.disc_price_units(
                F.col("l_extendedprice"), F.col("l_discount")
            ),
            100,
        ).alias("revenue"),
        F.count("*").alias("n_items"),
        F.grouping_id().cast("long").alias("gid"),
    )
    guard = _grand_total_if_empty(
        lineitem,
        ["l_returnflag", "l_linestatus"],
        [
            F.lit(None).cast("double").alias("revenue"),  # SUM() of none
            F.lit(0).cast("long").alias("n_items"),       # COUNT of none
        ],
        gid=3,
    )
    return main.unionByName(guard).orderBy(
        F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of event value per type (linear
    interpolation — matches ANSI percentile_cont / DuckDB quantile_cont).
    The 100 TB twin is approx_percentile; exact needs a per-group sort."""
    pct = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile(value, {p})"), 4
    )
    return (
        events.groupBy("event_type")
        .agg(
            pct(0.5).alias("p50"),
            pct(0.9).alias("p90"),
            pct(0.99).alias("p99"),
            F.round(F.avg("value"), 4).alias("mean_value"),
        )
        .orderBy("event_type")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def daily_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot: one row per day, one count column per event type (fixed value
    list — required for a deterministic schema, and what keeps the pivot a
    single pass instead of a values-discovery job + a pass)."""
    out = (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return out.na.fill(0, EVENT_TYPES).orderBy("event_date")


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, nation: DataFrame,
    before: str = "1995-07-01",
) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders before ``before``,
    counted per nation. Plans as a true left-anti (no fan-out, no
    distinct); the date filter pushes to the orders scan first."""
    early = orders.filter(F.col("o_orderdate") < F.lit(before).cast("timestamp"))
    silent = customer.join(
        early, customer["c_custkey"] == early["o_custkey"], "left_anti"
    )
    return (
        silent.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_silent"),
            cent_sum_dollars(F.col("c_acctbal")).alias("idle_balance"),
        )
        .orderBy("nation_name")
    )


def rolling_revenue(orders: DataFrame, window_days: int = 7) -> DataFrame:
    """Moving average of daily revenue over the last ``window_days`` observed
    days (ROWS frame over the daily rollup — dense and portable).

    The ordering window is global but over the DAILY grain — cardinality is
    days, not orders, so the single-partition sort is a few thousand rows at
    any raw-data scale. (Partition by year if the calendar itself gets big.)
    """
    # daily revenue and the moving average both run over EXACT integer
    # cents aggregated ONCE per row (round-13 half-boundary sweep: a
    # rounded double sum splits engines when off-grid inputs land the sum
    # on a repr half-boundary; the long sum is associative and
    # engine-identical, and deriving cents directly avoids the
    # dollars->cents double roundtrip that breaks past ~2^52 cents)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_cents"
        )
    )
    daily = daily.withColumn(
        "revenue", F.col("rev_cents").cast("double") / F.lit(100.0)
    )
    w = Window.orderBy("order_date").rowsBetween(-(window_days - 1), 0)
    return (
        daily.withColumn(
            "ma7",
            F.round(
                F.sum("rev_cents").over(w) / (F.count("*").over(w) * 100.0), 4
            ),
        )
        .drop("rev_cents")
        .orderBy("order_date")
    )


def customer_order_gaps(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Inter-order gap analysis: days between consecutive orders per
    customer (lag window), aggregated per market segment. One shuffle on
    custkey for the window, reused by the join."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.withColumn(
        "gap", F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
    )
    return (
        gaps.join(customer, gaps["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("gap"), 4).alias("avg_gap_days"),
            F.count("gap").alias("n_gaps"),
        )
        .orderBy("c_mktsegment")
    )


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE (status, priority): all 4 grouping combinations in one Expand +
    hash aggregate — the full grouping-sets surface next to
    ``revenue_rollup``'s ROLLUP, with the same ``_grand_total_if_empty``
    guard (an empty relation yields the standard's ``()`` row)."""
    from xboard_spark.functions.exact import cent_sum_dollars

    main = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        cent_sum_dollars(F.col("o_totalprice")).alias("total_price"),
        F.grouping_id().cast("long").alias("gid"),
    )
    guard = _grand_total_if_empty(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.lit(0).cast("long").alias("n_orders"),          # COUNT of none
            F.lit(None).cast("double").alias("total_price"),  # SUM of none
        ],
        gid=3,
    )
    return main.unionByName(guard).orderBy(
        F.asc_nulls_first("o_orderstatus"),
        F.asc_nulls_first("o_orderpriority"),
    )


def global_ntile(df: DataFrame, n_tiles: int, sort_cols: list, out_col: str) -> DataFrame:
    """Distributed exact ntile over a total order — same output as
    ``F.ntile(n).over(Window.orderBy(*sort_cols))`` (tiebreaks included)
    WITHOUT the single-partition global sort that makes unpartitioned
    ranking windows a scale-killer.

    Shape: range-repartition on the ordering (each partition holds a
    contiguous key range), rank within each partition, add the per-partition
    row-count offsets (one row per shuffle partition — tiny grain, joined
    back via broadcast, never collected to the driver), and bucket the
    resulting global rank with ntile's closed-form tile sizes
    (first ``n % k`` tiles get ``n/k + 1`` rows, the rest ``n/k``).

    Output ranks are invariant to where repartitionByRange draws its sampled
    bounds — only contiguity matters — so the result is deterministic. The
    range exchange appears once (counts and ranks reuse it via
    ReusedExchange). The cumulative offsets are a broadcast triangular
    self-join on the counts frame (<= spark.sql.shuffle.partitions rows,
    bounded by cluster config, not data) — NOT an unpartitioned window, so
    nothing here ever plans a single-partition sort.
    """
    ranged = df.repartitionByRange(*sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("__pid").orderBy(*sort_cols)
    ranked = ranged.withColumn("__rn", F.row_number().over(in_part))
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    a = counts.select(F.col("__pid"))
    b = counts.select(
        F.col("__pid").alias("__pid_b"), F.col("__cnt").alias("__cnt_b")
    )
    offsets = (
        a.join(F.broadcast(b), F.col("__pid_b") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__cnt_b"), F.lit(0)).alias("__off"))
    )
    total = counts.agg(F.sum("__cnt").alias("__n"))
    rank = F.col("__rn") + F.col("__off")
    base = F.floor(F.col("__n") / n_tiles)
    rem = F.col("__n") % n_tiles
    head = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
    tile = F.when(rank <= head, F.ceil(rank / (base + 1))).otherwise(
        rem + F.ceil((rank - head) / base)
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, tile.cast("int"))
        .drop("__pid", "__rn", "__off", "__n")
    )


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM segmentation: quartile-bucket every customer on Recency
    (latest order date), Frequency (order count), and Monetary (total
    spend), then count customers per (r, f, m) cell — the classic CRM
    rollup, with deterministic tiebreaks.

    Scale note: the ranked relation is one row per customer — hundreds of
    millions at 100 TB — so a global ``ntile`` window (single-partition
    sort) is a scale-killer. All three quartiles are instead computed by
    ONE ``global_ntile``-shaped pass over a long-form frame — one row per
    (customer, dimension) with each DESC ordering folded into an ASC
    numeric key — range-partitioned on (dim, key, custkey). Contiguity in
    that compound order means every earlier partition's rows of the same
    dim precede this partition's, so per-(partition, dim) ranks + offsets
    reconstruct each dimension's exact global rank; ntile's closed-form
    tile sizes then bucket it. Bit-identical to three ntile windows, one
    range exchange total, no unpartitioned window anywhere. (Measured
    alternative: percentile_approx bucket boundaries instead of the range
    exchange save the sampling pass but cost more than they save at every
    tested SF — the sketch build dominates; repartitionByRange also
    splits heavy key ties across partitions for free since custkey is in
    its sort key.)"""
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        cent_sum_dollars(F.col("o_totalprice")).alias("spend"),
    )
    # DESC orderings become ASC keys by negation: dates via epoch-day,
    # counts exactly representable as double, spend a 2-dp positive double.
    long = per_cust.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("dim"),
                    # exact integer micros (< 2^53, lossless as double);
                    # NTZ->LTZ cast is monotone under the fixed-offset
                    # session tz (Etc/UTC — no DST folds)
                    (-F.unix_micros(F.col("last_order").cast("timestamp_ltz")))
                    .cast("double")
                    .alias("key"),
                ),
                F.struct(
                    F.lit("f").alias("dim"),
                    (-F.col("n_orders")).cast("double").alias("key"),
                ),
                F.struct(
                    F.lit("m").alias("dim"),
                    (-F.col("spend")).cast("double").alias("key"),
                ),
            )
        ).alias("dk"),
    ).select("o_custkey", F.col("dk.dim").alias("dim"), F.col("dk.key").alias("key"))
    # Both consumers below (the in-partition rank window and the
    # per-(partition, dim) counts that become rank offsets) re-derive
    # this subtree — two orders scans and two range exchanges in the
    # plan. Persisting it was tried (round 13) and measured as a small
    # but consistent WARM regression in solo sessions (old warm-min
    # 1.04/1.38 s vs persisted 1.14/1.49 s at sf0.1): the re-derivation
    # is a cheap codegen'd pipeline locally, while the IMR materialize +
    # re-read is fixed overhead (the kmeans_inertia verdict class). At
    # real scale, where an orders scan is expensive, persist/checkpoint
    # this frame — the trade flips with input size.
    ranged = long.repartitionByRange("dim", "key", "o_custkey").withColumn(
        "__pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("__pid", "dim").orderBy("key", "o_custkey")
    ranked = ranged.withColumn("__rn", F.row_number().over(in_part))
    counts = ranged.groupBy("__pid", "dim").agg(F.count("*").alias("__cnt"))
    # cumulative offset + per-dim total over the tiny counts frame
    # (<= shuffle.partitions * 3 rows — bounded by config, not data).
    # These windows are PARTITIONED (by dim) so nothing here plans a
    # single-partition sort, and keeping them in-plan (instead of a
    # broadcast triangular join) keeps the whole query one job: AQE
    # broadcasts the tiny offsets side of the final join on its own.
    w_dim = Window.partitionBy("dim").orderBy("__pid")
    offsets = counts.select(
        "__pid",
        "dim",
        F.coalesce(
            F.sum("__cnt").over(w_dim.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__off"),
        F.sum("__cnt")
        .over(w_dim.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("__n"),
    )
    rank = F.col("__rn") + F.col("__off")
    base = F.floor(F.col("__n") / 4)
    rem = F.col("__n") % 4
    head = rem * (base + 1)
    tile = (
        F.when(rank <= head, F.ceil(rank / (base + 1)))
        .otherwise(rem + F.ceil((rank - head) / base))
        .cast("int")
    )
    tiled = (
        # explicit hint: offsets is <= shuffle.partitions x 3 rows, but the
        # persisted ranked frame carries its own (small-at-test-scale) IMR
        # statistics and the planner picked IT as the broadcast side — at
        # 100 TB that is 3 rows per customer shipped to the driver. Pin
        # the bounded-by-config side as the build side.
        ranked.join(F.broadcast(offsets), ["__pid", "dim"])
        .withColumn("__tile", tile)
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("dim") == "r", F.col("__tile"))).alias("r_tile"),
            F.max(F.when(F.col("dim") == "f", F.col("__tile"))).alias("f_tile"),
            F.max(F.when(F.col("dim") == "m", F.col("__tile"))).alias("m_tile"),
        )
    )
    return (
        tiled.groupBy("r_tile", "f_tile", "m_tile")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_tile", "f_tile", "m_tile")
    )


def value_equidepth(events: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Exact EQUI-DEPTH histogram of ``events.value``: ``n_buckets``
    buckets with (near-)equal row counts and their value ranges — the
    complement of the fixed-width ``sampling.length_histogram`` (equi-
    width shows shape; equi-depth gives splits/quantile fences that
    adapt to skew, the thing you actually partition or winsorize by).

    Built on ``global_ntile``, so the total order costs ONE range
    exchange reused by counts and ranks — never a single-partition sort
    (the plan-asserted invariant in test_plans). Ties break on event_id,
    making bucket assignment — and thus the per-bucket min/max — fully
    deterministic and oracle-comparable (DuckDB's ntile has the same
    closed-form tile sizes)."""
    ev = events.filter(F.col("value").isNotNull()).select(
        "event_id", "value"
    )
    tiled = global_ntile(
        ev, n_buckets, [F.col("value"), F.col("event_id")], "bucket"
    )
    return (
        tiled.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


def daily_type_unpivot(events: DataFrame) -> DataFrame:
    """Unpivot (melt): the wide daily pivot back to long form via Spark's
    native ``unpivot`` — the inverse relational shape of
    ``daily_type_pivot``, and the densified long frame (every day x type
    cell present, zeros filled) that time-series models consume. Round
    trip covered by pytest; the oracle builds the dense grid with a
    date x type cross join."""
    wide = daily_type_pivot(events)
    return (
        wide.unpivot(
            ["event_date"], EVENT_TYPES, "event_type", "n_events"
        )
        .select(
            "event_date",
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("event_date", "event_type")
    )


def top_orders_per_segment(
    customer: DataFrame, orders: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k WITHIN each group (vs segment_top_orders' global top-k): the
    k largest orders per market segment via a rank window — the pattern
    that scales because the window partitions on the group key (each
    segment ranks independently; no global sort exists) and the rank
    filter prunes before any further join."""
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "c_mktsegment",
            F.col("rnk").cast("long").alias("rnk"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("c_mktsegment", "rnk")
    )


def orders_mom_growth(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup + lag over the
    bounded month frame — the growth-reporting shape (rolling_revenue is
    the daily moving average; this is the percentage-change ladder).
    Revenue rounds to cents BEFORE the ratio so both engines divide the
    identical constants; growth is emitted where a prior month exists."""
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            cent_sum_dollars(F.col("o_totalprice")).alias("revenue"),
        )
    )
    w = Window.partitionBy().orderBy("month")
    return (
        monthly.withColumn("prev_revenue", F.lag("revenue").over(w))
        .withColumn(
            "mom_growth",
            F.when(
                F.col("prev_revenue").isNotNull(),
                (F.col("revenue") - F.col("prev_revenue"))
                / F.col("prev_revenue"),
            ),
        )
        .select(
            F.to_date("month").alias("month"),
            F.col("n_orders").cast("long").alias("n_orders"),
            "revenue",
            "prev_revenue",
            "mom_growth",
        )
        .orderBy("month")
    )


def customer_spend_percentiles(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Within-nation spend standing: percent_rank and cume_dist of each
    customer's total spend inside their nation (the two rank-normalizing
    window functions the surface did not yet exercise) — top decile per
    nation returned. Spend rounds to cents before ranking so both engines
    order identical values.

    Scale shape: per-customer agg, then windows partitioned on the nation
    key (each nation ranks independently — no global sort), rank filter
    prunes to the decile."""
    spend = (
        orders.groupBy("o_custkey")
        .agg(cent_sum_dollars(F.col("o_totalprice")).alias("spend"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("spend", "c_custkey")
    ranked = spend.select(
        "c_nationkey",
        "c_custkey",
        "spend",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    return (
        ranked.filter(F.col("pct_rank") >= 0.9)
        .orderBy("c_nationkey", "c_custkey")
    )


def revenue_concentration(orders: DataFrame) -> DataFrame:
    """Revenue concentration (whale analysis): the share of total revenue
    held by the top 1% / 5% / 10% of customers by spend — the Lorenz
    points a pricing or risk review starts from. Per-customer spend is
    fixed to integer CENTS before any comparison (doubles would make the
    percentile fences engine-dependent); fences are exact interpolated
    percentiles floored to whole cents, and every share is a division of
    exact integer sums.

    Scale shape: per-customer agg, one percentile aggregate over the
    customer frame (approx_percentile is the drop-in at scale), broadcast
    fences, conditional 1-row rollup. No global sort."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    fences = spend.agg(
        F.floor(F.expr("percentile(cents, 0.99)")).cast("long").alias("f99"),
        F.floor(F.expr("percentile(cents, 0.95)")).cast("long").alias("f95"),
        F.floor(F.expr("percentile(cents, 0.90)")).cast("long").alias("f90"),
    )
    joined = spend.crossJoin(F.broadcast(fences))
    share = lambda fence: (  # noqa: E731
        F.sum(F.when(F.col("cents") >= F.col(fence), F.col("cents")).otherwise(0))
        .cast("double")
        / F.sum("cents")
    )
    return joined.agg(
        F.count("*").alias("n_customers"),
        (F.sum("cents").cast("double") / 100.0).alias("total_revenue"),
        share("f99").alias("top1_share"),
        share("f95").alias("top5_share"),
        share("f90").alias("top10_share"),
    )
