"""Data-profiling operator: the per-column quality panel (row/null/distinct
counts, min/max) every ingestion pipeline runs before trusting a new drop
of data — the engine-side analog of the reference's implicit trust in
Postgres column constraints (``migrations/init.sql`` declares NOT NULL /
UNIQUE; a lake has to MEASURE instead of declare).

Scale notes: one scan computes every per-column aggregate in a single
partial/final hash aggregate (no per-column passes); the unpivot to
row-per-column happens on the 1-row aggregate result, so nothing but the
scan touches data. Exact ``count(distinct)`` per column is the oracle-
comparable choice here; at 100 TB swap in ``approx_count_distinct`` (the
sketch is mergeable map-side, same plan shape) — exactness of the distinct
count is the only piece that changes.

Cross-engine value formatting: min/max are emitted as STRINGS via the
narrowest portable representation per type (longs/strings/timestamps cast
directly; doubles round to 2dp then pass through DECIMAL(38,2) so BOTH
engines render the identical plain-notation string at every magnitude —
formatting a double directly diverges once |v| crosses the engines'
scientific-notation thresholds: Spark's ``Double.toString`` gives
``9.99E15`` where DuckDB gives ``9990000000000000.0`` (round-10 sweep 7).
DECIMAL(38,2) leaves 36 integer digits of headroom; beyond ~1e36 — and on
NaN/Inf extremes — min/max degrade to NULL on BOTH engines: Spark via
``try_cast`` (the plain ANSI cast raised on overflow), the twin via an
``isfinite``-guarded TRY_CAST (DuckDB's TRY_CAST itself RAISES on
non-finite doubles — ADVICE r11 measured the NULL-vs-error splits this
convention closes). Either way it is corrupt-magnitude territory the
``input_bounds_audit`` intake gate exists to catch upstream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_repr(agg, dtype: T.DataType):
    """Portable string form of an aggregated min/max VALUE (aggregate on
    the typed value — a lexicographic min over string forms would order
    '10' < '9' — then format)."""
    if isinstance(dtype, T.DoubleType):
        # try_cast: NaN and >1e36 degrade to NULL instead of the ANSI
        # overflow error (the twin's isfinite-guarded TRY_CAST matches —
        # DuckDB's TRY_CAST itself RAISES on non-finite doubles).
        # Cast DIRECTLY, no round(v, 2) first (round-13 half-boundary
        # probe): both engines' double->DECIMAL casts quantize HALF_UP on
        # the shortest decimal repr and AGREE on half-boundary values
        # (8.165 -> 8.17 both), while their round() functions split
        # (Spark repr-based 8.17 vs DuckDB 8.16) — so a pre-round turns
        # an off-grid input into a silent cross-engine divergence the
        # direct cast avoids. Identity on cent-clean data either way.
        return agg.try_cast("decimal(38,2)").cast("string")
    return agg.cast("string")


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct (exact), min/max
    (portable string representation).

    TWO aggregation passes on purpose, split by buffer type (measured 2.4x
    at sf0.1): multi-column DISTINCT aggregates plan through Expand, and
    when the same aggregate also carries string-buffered min/max the whole
    thing falls off hash aggregation onto SortAggregate — a full sort of
    the |cols|+1-way expanded row stream. Separated, the distinct pass
    keeps long buffers (pure HashAggregate over Expand) and the
    min/max/null pass aggregates the unexpanded stream; the two 1-row
    results cross-join for free."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(fields)
    aggs = [F.count("*").alias("_n_rows")]
    for name in cols:
        c = F.col(name)
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"_nulls_{name}"),
            _as_repr(F.min(c), fields[name]).alias(f"_min_{name}"),
            _as_repr(F.max(c), fields[name]).alias(f"_max_{name}"),
        ]
    basic = df.agg(*aggs)
    distincts = df.agg(
        *[F.count_distinct(F.col(name)).alias(f"_nd_{name}") for name in cols]
    )
    one = basic.crossJoin(F.broadcast(distincts))
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{name}").cast("long").alias("n_nulls"),
                F.col(f"_nd_{name}").cast("long").alias("n_distinct"),
                F.col(f"_min_{name}").alias("min_repr"),
                F.col(f"_max_{name}").alias("max_repr"),
            )
            for name in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


def value_drift_psi(events: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Population-stability-index (PSI) drift panel over ``events.value``:
    split the stream at the midpoint of its time range, histogram both
    halves over IDENTICAL fixed-width buckets, and report each bucket's
    PSI term ((p - q) * ln(p / q)) — the standard production check that a
    metric's distribution hasn't shifted between two windows (rule of
    thumb: total PSI > 0.2 = investigate). Summing ``psi_term`` gives the
    headline PSI; per-bucket rows localize WHERE the shift happened.

    Scale shape: one 1-row aggregate for the global extremes (broadcast),
    one pass to bucket-count — two scans total, no shuffle wider than
    (half, bucket). Cross-engine float safety: bucket edges derive from
    exact min/max (no summation-order sensitivity), shares p/q are exact-
    int divisions, and ln() last-ulp differences are absorbed by the 6dp
    round on the term. Buckets empty in EITHER half contribute no row
    (ln undefined) — the standard PSI epsilon-free convention, and
    deterministic."""
    ev = events.filter(F.col("value").isNotNull())
    bounds = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min(F.unix_micros("ts")).alias("tmin"),
        F.max(F.unix_micros("ts")).alias("tmax"),
    )
    withb = ev.crossJoin(F.broadcast(bounds))
    t_mid = (F.col("tmin") + F.col("tmax")) / F.lit(2.0)
    width = (F.col("vmax") - F.col("vmin")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / width),
            F.lit(n_buckets - 1),
        )
    )
    half = F.when(F.unix_micros("ts") < t_mid, "early").otherwise("late")
    counts = (
        withb.select(bucket.cast("long").alias("bucket"), half.alias("half"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "early", 1).otherwise(0)).alias(
                "n_early"
            ),
            F.sum(F.when(F.col("half") == "late", 1).otherwise(0)).alias(
                "n_late"
            ),
        )
    )
    totals = counts.agg(
        F.sum("n_early").alias("tot_early"), F.sum("n_late").alias("tot_late")
    )
    p = F.col("n_early").cast("double") / F.col("tot_early")
    q = F.col("n_late").cast("double") / F.col("tot_late")
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter((F.col("n_early") > 0) & (F.col("n_late") > 0))
        .select(
            "bucket",
            F.col("n_early").cast("long").alias("n_early"),
            F.col("n_late").cast("long").alias("n_late"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


def key_skew_profile(df: DataFrame, key: str = "o_custkey", top: int = 20) -> DataFrame:
    """Join/aggregation-key SKEW diagnostic: the top-N heaviest keys with
    their share of all rows — the panel you read before deciding whether a
    key needs salting (``operators.skew``) or AQE skew-join handling.
    Returns (rank, key, n_rows, share) ordered by weight.

    Scale shape: one scan -> per-key partial/final hash aggregate; the
    global total folds the SAME aggregated frame a second time (tiny: one
    row per distinct key, and Spark reuses the exchange); top-N plans as
    TakeOrderedAndProject, and the rank window runs over the N-row result,
    never the full key frame."""
    kc = df.groupBy(F.col(key).alias("key")).agg(F.count("*").alias("n_rows"))
    total = kc.agg(F.sum("n_rows").alias("_total"))
    topk = (
        kc.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top)
        .crossJoin(F.broadcast(total))
    )

    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "key",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") / F.col("_total")).alias("share"),
    ).orderBy("rank")


def fk_integrity_audit(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Referential-integrity audit across the FK chain lineitem -> orders
    -> customer -> nation-less tail: per relationship, child rowcount and
    orphan count (child rows whose parent key is missing) — the
    data-quality gate an ingest pipeline runs before trusting joins.

    Scale shape: each relationship is ONE left join on the FK (the parent
    side projected to its key column only, so the join carries minimal
    payload; sort-merge for the large-large pair, broadcast when the
    parent is small) folded into a 1-row aggregate; the relationships
    union into a fixed 2-row panel."""
    def _rel(child, parent_key_df, cond, name):
        return (
            child.join(parent_key_df, cond, "left")
            .agg(
                F.lit(name).alias("relationship"),
                F.count("*").alias("n_child_rows"),
                F.sum(
                    parent_key_df[parent_key_df.columns[0]]
                    .isNull()
                    .cast("long")
                ).alias("n_orphans"),
            )
        )

    ok = orders.select("o_orderkey")
    ck = customer.select("c_custkey")
    r1 = _rel(
        lineitem.select("l_orderkey"),
        ok,
        F.col("l_orderkey") == F.col("o_orderkey"),
        "lineitem->orders",
    )
    r2 = _rel(
        orders.select("o_custkey"),
        ck,
        F.col("o_custkey") == F.col("c_custkey"),
        "orders->customer",
    )
    return r1.unionByName(r2).orderBy("relationship")


def volume_gaps(events: DataFrame) -> DataFrame:
    """Ingest-volume health scan: the full daily-count panel with each
    day's day-over-day ratio, calendar gap to the previous observed day,
    and an anomaly flag (volume halved or worse / doubled or more —
    INCLUSIVE bounds, so a day that exactly halved or exactly doubled is
    flagged, matching the stated rule; the round-9 symmetric-defect
    review found the strict bounds let the exact-boundary day pass — or
    days missing in between) — the first monitor an ingestion pipeline
    grows. The whole panel is returned (not just flagged days) so a
    healthy corpus still yields a verifiable report.

    Scale shape: one scan -> per-day hash agg (key domain bounded by the
    calendar), then lag over the tiny daily frame (single-partition
    window over ~365 rows/year of history, not over raw events)."""
    daily = (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy().orderBy("event_date")
    scanned = daily.select(
        "event_date",
        F.col("n_events").cast("long").alias("n_events"),
        F.lag("event_date").over(w).alias("prev_date"),
        F.lag("n_events").over(w).cast("long").alias("prev_events"),
    ).withColumn(
        "gap_days", F.datediff("event_date", "prev_date").cast("long")
    ).withColumn(
        "dod_ratio", F.col("n_events") / F.col("prev_events")
    )
    anomaly = (
        F.col("prev_date").isNotNull()
        & (
            (F.col("gap_days") > 1)
            | (F.col("dod_ratio") <= 0.5)
            | (F.col("dod_ratio") >= 2.0)
        )
    ).cast("long")
    return scanned.withColumn("is_anomaly", anomaly).orderBy("event_date")


def bounds_audit(
    df: DataFrame,
    table_name: str,
    numeric_cols: list[str],
    ts_cols: list[str],
    value_fence: float = 1.0e12,
    ts_lo: str = "1990-01-01",
    ts_hi: str = "2035-01-01",
    quantized_cols: list[str] | None = None,
) -> DataFrame:
    """Typed intake-bounds panel for ONE table: per audited column, how
    many rows are NULL, non-finite (NaN/±Inf — numeric only), out of the
    declared fence, or clean. This is the upstream validator the round-10
    magnitude/timestamp sweeps called for: ±1e15-scale values push 18
    registered queries across the engines' float boundary and outlier
    timestamps stretch the calendar-spine grids by millennia — data like
    that must be caught at INGEST, where the reference's typing
    discipline (``migrations/init.sql:54-56``: NUMERIC money,
    TIMESTAMPTZ event time) would have rejected or kept exact what
    doubles silently corrupt.

    Fences: a numeric value is out of bounds when ``abs(v) > value_fence``
    (1e12 default — two orders past any plausible money/metric value and
    three short of where double ulp reaches cents); a timestamp when
    ``ts < ts_lo`` or ``ts >= ts_hi``. NaN/Inf are counted separately
    (``n_nonfinite``) and never double-counted as out-of-bounds;
    ``n_ok = n_rows - n_null - n_nonfinite - n_oob`` by construction.

    ``quantized_cols`` (ADVICE r12): numeric columns contract-bound to
    the engine's x100 integer grid — money to cents
    (``exact.cent_units``), rates to integer percent (``pct_units``).
    Those helpers silently round ``v * 100``, so a dirty input (discount
    0.125, price 9.999) changes results without tripping any fence: both
    engines round identically and the gate stays green. ``n_offgrid``
    counts in-fence finite rows where ``abs(v*100 - round(v*100)) >
    1e-9 + abs(v) * 1e-13`` — the additive term catches dirt near zero,
    the relative term stays ~4x above the worst representation error of
    a TRUE cent value (|v*100| * 2^-52; at the 1e12 fence that is
    ~0.022, the threshold 0.1) while any real off-grid value deviates
    by up to 0.5. Both engines evaluate the identical double expression
    on identical inputs, so the verdict is cross-engine-stable even in
    the gray zone. NULL ``n_offgrid`` = column has no quantization
    contract; off-grid rows still count in ``n_ok`` (they are in-bounds
    and finite — the flag is a contract warning for the exact-arithmetic
    surface, not intake corruption).

    The surface is exact integers + constant strings only — hash-stable
    at any input magnitude by design (an audit that itself diverged on
    the corrupt data it exists to flag would be useless).

    Scale shape: ONE scan per table computes every per-column counter in
    a single partial/final hash aggregate (the ``table_profile``
    treatment); the unpivot to row-per-column happens on the 1-row
    result. At 100 TB this is the cheapest full-scan shape there is —
    and the audit is the scan you run BEFORE trusting a drop anyway."""
    inf = float("inf")
    # coalesce(sum, 0): an EMPTY table audits as all-zero counters, not
    # NULLs (sum over zero rows is NULL in both engines; an intake gate
    # must report "0 corrupt rows", not "unknown")
    csum = lambda c: F.coalesce(F.sum(c), F.lit(0))  # noqa: E731
    quantized = set(quantized_cols or [])
    aggs = [F.count("*").alias("_n_rows")]
    for c in numeric_cols:
        v = F.col(c)
        nonfinite = F.isnan(v) | (F.abs(v) == F.lit(inf))
        in_fence = (
            v.isNotNull()
            & ~nonfinite
            & (F.abs(v) <= F.lit(float(value_fence)))
        )
        offgrid = (
            csum(
                F.when(
                    in_fence
                    & (
                        F.abs(v * 100 - F.round(v * 100))
                        > F.lit(1.0e-9) + F.abs(v) * F.lit(1.0e-13)
                    ),
                    1,
                ).otherwise(0)
            )
            if c in quantized
            else F.lit(None).cast("long")
        )
        aggs += [
            csum(v.isNull().cast("long")).alias(f"_null_{c}"),
            csum(F.when(v.isNotNull() & nonfinite, 1).otherwise(0)).alias(
                f"_nonfin_{c}"
            ),
            csum(
                F.when(
                    v.isNotNull()
                    & ~nonfinite
                    & (F.abs(v) > F.lit(float(value_fence))),
                    1,
                ).otherwise(0)
            ).alias(f"_oob_{c}"),
            offgrid.alias(f"_offgrid_{c}"),
        ]
    lo = F.lit(ts_lo).cast("timestamp")
    hi = F.lit(ts_hi).cast("timestamp")
    for c in ts_cols:
        v = F.col(c)
        aggs += [
            csum(v.isNull().cast("long")).alias(f"_null_{c}"),
            F.lit(0).alias(f"_nonfin_{c}"),
            csum(
                F.when(v.isNotNull() & ((v < lo) | (v >= hi)), 1).otherwise(0)
            ).alias(f"_oob_{c}"),
            F.lit(None).cast("long").alias(f"_offgrid_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("col_name"),
                F.lit(kind).alias("kind"),
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.col(f"_null_{c}").cast("long").alias("n_null"),
                F.col(f"_nonfin_{c}").cast("long").alias("n_nonfinite"),
                F.col(f"_oob_{c}").cast("long").alias("n_oob"),
                F.col(f"_offgrid_{c}").cast("long").alias("n_offgrid"),
                (
                    F.col("_n_rows")
                    - F.col(f"_null_{c}")
                    - F.col(f"_nonfin_{c}")
                    - F.col(f"_oob_{c}")
                )
                .cast("long")
                .alias("n_ok"),
            )
            for c, kind in [(c, "numeric") for c in numeric_cols]
            + [(c, "timestamp") for c in ts_cols]
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def quarantine_out_of_bounds(
    df: DataFrame,
    numeric_cols: list[str],
    ts_cols: list[str],
    value_fence: float = 1.0e12,
    ts_lo: str = "1990-01-01",
    ts_hi: str = "2035-01-01",
) -> tuple[DataFrame, DataFrame]:
    """The enforcement companion to ``bounds_audit``: split ``df`` into
    (clean, quarantined) on the SAME fences the audit counts against — a
    row quarantines when ANY audited numeric column is NaN/±Inf or past
    the magnitude fence, or ANY audited timestamp column is outside
    [ts_lo, ts_hi). NULLs pass: a missing value is a modeling question
    for the downstream operator (most exclude or COALESCE per their
    documented contract), not ingest corruption — so
    ``audit.n_oob + audit.n_nonfinite`` equals the quarantine count per
    column while ``n_null`` does not quarantine.

    Returns both frames from one predicate, so clean ∪ quarantined ==
    input exactly and a pipeline can land the quarantine as its own
    table for triage. One scan each when materialized (the predicate is
    a plain JVM expression that pushes into the parquet scan where the
    format supports it)."""
    inf = float("inf")
    bad = F.lit(False)
    for c in numeric_cols:
        v = F.col(c)
        bad = bad | (
            v.isNotNull()
            & (
                F.isnan(v)
                | (F.abs(v) == F.lit(inf))
                | (F.abs(v) > F.lit(float(value_fence)))
            )
        )
    lo = F.lit(ts_lo).cast("timestamp")
    hi = F.lit(ts_hi).cast("timestamp")
    for c in ts_cols:
        v = F.col(c)
        bad = bad | (v.isNotNull() & ((v < lo) | (v >= hi)))
    return df.filter(~bad), df.filter(bad)


def input_bounds_audit(
    events: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """The engine's standard pre-analytics intake gate: ``bounds_audit``
    over the three ingested fact tables' money/metric and event-time
    columns, one panel. Run this BEFORE the analytics surface — the
    float-discipline contracts of the rounded-double queries (sums agree
    cross-engine "for this magnitude") and the calendar-spine grids
    (``traffic_anomalies``) assume exactly the bounds this audit
    enforces. Default fences: |value| <= 1e12, ts in [1990-01-01,
    2035-01-01).

    Round 13 (ADVICE r12): every column feeding the exact-arithmetic
    helpers carries the x100-grid quantization contract — events.value /
    o_totalprice / l_extendedprice (``cent_units`` / ``cent_sum_dollars``)
    and l_discount / l_tax (``pct_units``; the rate columns join the
    audit here) — so a dirty rate like 0.125 surfaces as ``n_offgrid``
    at intake instead of being silently rounded to a percent."""
    parts = [
        bounds_audit(
            events, "events", ["value"], ["ts"], quantized_cols=["value"]
        ),
        bounds_audit(
            orders,
            "orders",
            ["o_totalprice"],
            ["o_orderdate"],
            quantized_cols=["o_totalprice"],
        ),
        bounds_audit(
            lineitem,
            "lineitem",
            ["l_discount", "l_extendedprice", "l_tax"],
            ["l_shipdate"],
            quantized_cols=["l_discount", "l_extendedprice", "l_tax"],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "col_name")
