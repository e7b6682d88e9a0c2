"""Batch analogs of the reference's streaming-shaped capabilities
(SURVEY.md §2.7) over the ``events`` table, plus sessionization — the
operators the webhook/event pipeline needs at scale. The true streaming
versions (watermark + dropDuplicates + foreachBatch) live in
``xboard_spark.streaming``; these batch forms share semantics and are what
the DuckDB oracle can check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xboard_spark.functions.portable_hash import fingerprint64
from xboard_spark.functions import exact as X


def delivery_hash_col() -> F.Column:
    """The ST2 dedup key (``init.sql:25`` delivery_hash UNIQUE), derived
    deterministically from event identity. unix_micros keeps the timestamp
    exact and avoids engine-specific string formatting."""
    return fingerprint64(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.unix_micros(F.col("ts")).cast("string"),
            F.col("event_type"),
        )
    )


def events_dedup_summary(events: DataFrame) -> DataFrame:
    """ST2 exactly-once dedup, batch form: keep one row per delivery hash
    (first by event_id — deterministic, unlike arbitrary ``dropDuplicates``),
    then summarize per event type.

    The window partitions by the hash, so the shuffle key is the dedup key —
    exactly the partitioning a 100 TB dedup wants (no global sort, state
    bounded per key). The streaming twin with a watermark is
    ``streaming.webhook.deduped_stream``.
    """
    w = Window.partitionBy("delivery_hash").orderBy("event_id")
    deduped = (
        events.withColumn("delivery_hash", delivery_hash_col())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            _cent_value_sum().alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def _cent_value_sum() -> F.Column:
    """Exact cent-sum of the 2-decimal-clean ``value`` column, emitted
    as dollars — see ``functions.exact`` for the full rationale (the
    associativity argument, the DuckDB HUGEINT truncation boundary, and
    the magnitude fences). At normal magnitudes the emitted double is
    identical to the pre-round-11 rounded-double-sum surface (verified
    group-for-group at all three SFs), so the conversion was
    value-preserving on clean data."""
    from xboard_spark.functions.exact import cent_sum_dollars

    return cent_sum_dollars(F.col("value"))


def events_daily(events: DataFrame) -> DataFrame:
    """A2's streaming analog as a batch tumbling window: daily counts and
    value sums per event type (groupBy(window(...)) in the streaming twin,
    ``streaming.windows.daily_counts``). The value sum runs in exact
    integer cents (``_cent_value_sum``), magnitude-robust cross-engine."""
    return (
        events.groupBy(
            F.to_date("ts").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _cent_value_sum().alias("total_value"),
        )
        .orderBy(F.desc("event_date"), F.asc("event_type"))
    )


def _with_session_seq(events: DataFrame, gap_minutes: int) -> DataFrame:
    """Gaps-and-islands session tagging, shared by ``sessionize`` /
    ``session_paths`` / ``conversion_attribution`` (ONE definition so the
    session boundary rule cannot silently diverge between the consumers —
    the ``band_hashes`` treatment): lag over (user_id; ts, event_id), a
    new-session flag on inactivity > ``gap_minutes``, and the running-sum
    session id. One shuffle on user_id; every downstream window reuses
    that partitioning."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(by_user)
    return events.withColumn(
        "new_session",
        F.when(
            prev_ts.isNull()
            | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_seq", F.sum("new_session").over(by_user))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user sessions split on inactivity gaps — the
    classic gaps-and-islands, all window functions, no UDF, no state in the
    driver. Shuffles once on user_id; every window below reuses that
    partitioning (single Exchange in the plan).

    Streaming twin: ``session_window`` / ``applyInPandasWithState`` in
    ``xboard_spark.streaming.windows``.
    """
    return (
        _with_session_seq(events, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            X.cent_sum_dollars(F.col("value")).alias("session_value"),
        )
        .withColumn(
            "duration_us",
            F.unix_micros("session_end") - F.unix_micros("session_start"),
        )
        .withColumn("duration_sec", F.round(F.col("duration_us") / 1e6, 3))
        .orderBy("user_id", "session_seq")
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Aggregate view of sessionization (small, stable output for the
    correctness gate): per-user session count + event totals.

    The mean duration is computed from EXACT integer microseconds
    (sum(long)/count, then /1e6, fixed association on both sides) and
    emitted as a PLAIN DOUBLE with no round() and no decimal cast. The
    round-2 DECIMAL(18,3) cast hash-failed in the driver gate: pandas
    conversion is dtype-asymmetric (Spark toPandas → decimal.Decimal
    objects, DuckDB .df() → float64), so decimal outputs can never hash
    equal. Deterministic IEEE divisions of exact integers are bit-identical
    across engines; skipping round() also removes the rounding-boundary
    edge that flipped a round(.,3) digit between engines at sf0.1."""
    return (
        sessionize(events, gap_minutes)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            (
                (F.sum("duration_us").cast("double") / F.count("*"))
                / F.lit(1e6)
            ).alias("avg_session_sec"),
        )
        .orderBy("user_id")
    )


def events_json_props(events: DataFrame) -> DataFrame:
    """JSONB-analog extraction (the reference keeps full raw JSON per row,
    ``init.sql:26,41`` — F8/S6 surface): pull a typed field out of the
    ``props`` JSON column and aggregate on it. ``get_json_object`` is a
    JVM-side expression — no Python in the loop.

    ``try_cast``, not ``cast`` (ADVICE r11): a VALID JSON payload with a
    wrong-TYPE k ({"k":"abc"}) must degrade to NULL — matching both the
    variant twin's ``try_variant_get`` and the oracle's TRY_CAST — where
    the ANSI strict cast would fail the whole query on one dirty row."""
    return (
        events.withColumn(
            "k", F.get_json_object(F.col("props"), "$.k").try_cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_distinct("k").alias("distinct_k"),
        )
        .orderBy("event_type")
    )


def user_rollup(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Per-user activity rollup with exact AND approximate distinct — the
    approx_count_distinct (HyperLogLog++) path is the one that survives
    100 TB (fixed-size mergeable sketch state vs a shuffle carrying every
    distinct (user, type) pair); the exact path is the oracle-checkable
    twin. The approximate side is surfaced the invariant-oracle way
    (the ``approx_cardinality`` pattern): the hashed columns are the
    exact facts plus a deterministic ``types_within_bound`` boolean whose
    integer bound (``n_types DIV 5 + 2`` — generous at the tiny per-user
    type cardinalities, where HLL++'s sparse path is near-exact) the
    DuckDB twin re-derives as TRUE; the engine-specific estimate itself
    stays out of the hash, but a sketch drifting outside its contract
    fails the driver hash. (The round-9 symmetric-defect review found
    the docstring promised the approximate path while no such column
    existed.) The value sum runs in exact integer cents
    (``_cent_value_sum``), magnitude-robust cross-engine.

    Shape (round 13, guide §2.3 "shuffle fewer bytes"): a single groupBy
    mixing count_distinct with approx_count_distinct makes Spark's
    distinct-aggregate rewrite build the 410-word HLL++ sketch buffer at
    the (user_id, event_type) level — the first Exchange carried 416
    columns (~3.3 KB/row, measured in plans/r13/user_rollup_before.txt).
    The explicit two-level form below aggregates the narrow exact facts
    per (user_id, event_type) first (6 skinny columns through the wide
    exchange) and builds the sketch over the already-deduplicated frame.
    Bit-identical by construction: HLL++ register updates are idempotent
    (same value → same hash → same register), count_distinct over the
    keys equals count of the deduped rows, and the exact long cent-sums
    / counts / min / max are associative."""
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("_n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("_cents"),
        F.min("ts").alias("_first"),
        F.max("ts").alias("_last"),
    )
    bound = F.expr("n_types DIV 5 + 2")
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.count("event_type").alias("n_types"),
            F.approx_count_distinct("event_type", rsd).alias("approx_types"),
            (F.sum("_cents").cast("double") / F.lit(100.0)).alias(
                "total_value"
            ),
            F.min("_first").alias("first_seen"),
            F.max("_last").alias("last_seen"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            (F.abs(F.col("approx_types") - F.col("n_types")) <= bound).alias(
                "types_within_bound"
            ),
            "total_value",
            "first_seen",
            "last_seen",
        )
        .orderBy("user_id")
    )


def hourly_windows(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregation via the native ``window()`` expression —
    the batch form of the Structured Streaming tumbling aggregate (same
    expression works under readStream + watermark; see
    ``streaming.windows``). Emits window start AND end explicitly (the
    end is start + 1 hour, exclusive — the struct's own ``w.end``, so a
    consumer never re-derives the window width; the round-9
    symmetric-defect review found only the start was selected). The value
    sum runs in exact integer cents (``_cent_value_sum``),
    magnitude-robust cross-engine."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _cent_value_sum().alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user OLS slope of event value over time via ``applyInPandas`` —
    the grouped-map escape hatch for per-entity model fits that closed-form
    SQL can't express cleanly. Arrow-batched, one group per user, shuffle
    on user_id only; the Python work is O(rows_of_that_user) with NumPy
    vectorization (never row-at-a-time)."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        t = pdf["ts"].astype("int64") / 1e9
        v = pdf["value"].astype("float64")
        if len(pdf) < 2 or t.std() == 0:
            slope = 0.0
        else:
            slope = float(np.polyfit(t - t.mean(), v, 1)[0])
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "slope_per_hour": [round(slope * 3600, 6)],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            fit, schema="user_id long, n_events long, slope_per_hour double"
        )
        .orderBy("user_id")
    )


def approx_cardinality(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ calibration panel per event_type (Heule et al. 2013,
    ``approx_count_distinct``). THE sketch path for 100 TB is the approx
    side alone: fixed-size mergeable state, so the aggregate is
    partial+final with O(types * sketch_size) shuffle — versus exact
    count-distinct, whose shuffle carries every distinct (type, user)
    pair. This registered panel computes BOTH (it is the calibration
    audit that justifies the sketch, same posture as
    ``quantile_sketch_error``) and emits an invariant-oracle surface
    (VERDICT r8 #2): the hashed columns are the EXACT side plus a
    deterministic ``users_within_bound`` boolean whose integer-arithmetic
    bound (12% of exact + 4 ≈ 6 sigma at rsd=2%, slack for tiny groups)
    the DuckDB twin re-derives — the sketch estimate itself stays out of
    the hash (engine-specific), but a sketch drifting outside its
    contract now FAILS the driver hash instead of hiding in a rows-only
    row. Bound arithmetic is integer-only (``* 3 DIV 25``) on purpose:
    a float ``0.12 * n`` literal is DOUBLE on Spark but DECIMAL on
    DuckDB, and ceil() at a representation boundary would split.

    Shape (round 13, the ``user_rollup`` two-level form, guide §2.3):
    mixing count_distinct with approx_count_distinct in one groupBy made
    Spark's distinct-aggregate rewrite carry the 410-word HLL++ sketch
    buffer per (event_type, user_id) group through the first Exchange.
    Aggregating the narrow count per (event_type, user_id) first ships 3
    skinny columns instead, and the sketch builds over the deduplicated
    frame — bit-identical: HLL++ register updates are idempotent, both
    count_distinct (ignores NULLs; count("user_id") over the deduped
    frame skips the NULL-user group identically) and count(*) (= sum of
    per-group counts) are associative."""
    bound = F.expr("exact_users * 3 DIV 25 + 4")
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count("*").alias("_n")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.count("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        )
        .select(
            "event_type",
            "n_events",
            "exact_users",
            bound.alias("users_err_bound"),
            (
                F.abs(F.col("approx_users") - F.col("exact_users")) <= bound
            ).alias("users_within_bound"),
        )
        .orderBy("event_type")
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered funnel view -> click -> purchase: per user, each stage
    counts only if it happens STRICTLY after the user's previous stage
    (first-touch semantics: min event time per stage). Returns one row of
    stage populations + conversion rates.

    Scale shape: three per-user hash aggregates chained by broadcast-able
    joins (each stage's survivor set only shrinks), all keyed on user_id —
    co-partitioned, no global sort. The window-function alternative (one
    pass, lag over per-user ordered events) trades the joins for a full
    per-user sort; min-per-stage is the lighter plan when stages are few.

    ONE plan, one action: the three stage counts are one-row aggregates
    combined by broadcast crossJoin, so ``events`` is scanned once per
    stage with its event_type filter pushed down, and the shared t_view /
    t_click subplans are reused (ReusedExchange) instead of recomputed by
    three driver-side .count() actions (round-1 `weak` fix)."""
    t_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t_click = (
        events.filter(F.col("event_type") == "click")
        .join(t_view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(t_click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_view = t_view.agg(F.count("*").alias("n_view_users"))
    n_click = t_click.agg(F.count("*").alias("n_click_users"))
    n_purchase = t_purchase.agg(F.count("*").alias("n_purchase_users"))
    return (
        n_view.crossJoin(F.broadcast(n_click))
        .crossJoin(F.broadcast(n_purchase))
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            F.when(
                F.col("n_view_users") > 0,
                F.round(F.col("n_click_users") / F.col("n_view_users"), 6),
            ).alias("view_to_click"),
            F.when(
                F.col("n_click_users") > 0,
                F.round(F.col("n_purchase_users") / F.col("n_click_users"), 6),
            ).alias("click_to_purchase"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week
    (cohort), tracked by distinct-active week offsets FROM the cohort week
    — the standard product-analytics rollup the reference's daily revenue
    endpoint (routes/analytics.js:55-70) grows into. The week-0 row (the
    matrix diagonal) is EMITTED and is 1.0 by construction: it is the
    conventional anchor that carries each cohort's size and lets a
    consumer verify n_active(week 0) == cohort_size; retention analysis
    reads from weeks_since >= 1. (Round-9 review disposition: convention
    documented rather than dropping the row.)

    Shape: first-seen is one per-user hash agg; (user, week) activity is a
    dropDuplicates on co-located keys; the matrix is a second agg keyed by
    (cohort_week, weeks_since) — thousands of groups regardless of corpus
    size. The cohort-size join broadcasts (one row per week)."""
    user_week = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).dropDuplicates(["user_id", "week"])
    first_week = user_week.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    cohort_size = first_week.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    activity = user_week.join(first_week, "user_id").withColumn(
        "weeks_since",
        F.floor(
            (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
            / (7 * 24 * 3600)
        ).cast("long"),
    )
    return (
        activity.groupBy("cohort_week", "weeks_since")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(cohort_size), "cohort_week")
        .select(
            F.to_date("cohort_week").alias("cohort_week"),
            "weeks_since",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "weeks_since")
    )


def value_outliers(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-event-type z-score anomaly panel: moments of ``value`` plus how
    many events sit more than ``z`` standard deviations from the mean —
    the first-pass outlier/anomaly scan a pipeline runs over a metric
    column before trusting it (fat-finger values, unit mix-ups, bot
    spikes).

    Two passes, both cheap: one partial/final hash aggregate for the raw
    moments (count, sum, sum-of-squares — the classic one-scan variance
    decomposition), then a broadcast join of the per-type stats (rows =
    |event types|, trivially broadcastable at any corpus size) back onto
    the stream for the threshold count. No window, no sort; at 100 TB both
    scans are embarrassingly parallel and the only shuffle carries one row
    per event type.

    Cross-engine float discipline: mean/std are ROUNDED to 6dp before the
    threshold comparison, so both engines compare each raw value against
    IDENTICAL constants — engine-internal summation order can shift the
    raw moments only at ~1e-12 relative, which the 6dp round absorbs; the
    per-row comparison is then bit-deterministic (ties sit on a
    measure-zero boundary). Std uses the explicit (ss - s^2/n)/(n-1)
    formula rather than each engine's stddev_samp (DuckDB's is
    Welford-based — different association, different last ulps).

    Degenerate-denominator contract (round-13 n=1 sweep finding): a
    single-valued group has no sample variance — NULLIF(n-1, 0) makes
    ``std_value`` NULL there (and the z-comparison then flags nothing)
    on BOTH engines, where the bare division was an ANSI
    DIVIDE_BY_ZERO crash; an all-NULL group's mean gets the same
    NULLIF(n, 0) guard. Inert whenever a group has >= 2 values — the
    guards cannot move a non-degenerate result."""
    moments = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("value").alias("n_vals"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    n_vals_nz = F.nullif(F.col("n_vals"), F.lit(0))
    stats = moments.select(
        "event_type",
        "n_events",
        F.round(F.col("s") / n_vals_nz, 6).alias("mean_value"),
        F.round(
            F.sqrt(
                (F.col("ss") - F.col("s") * F.col("s") / n_vals_nz)
                / F.nullif(F.col("n_vals") - 1, F.lit(0))
            ),
            6,
        ).alias("std_value"),
    )
    flagged = events.select("event_type", "value").join(
        F.broadcast(stats), "event_type"
    )
    is_out = F.when(
        F.abs(F.col("value") - F.col("mean_value"))
        > F.lit(z) * F.col("std_value"),
        1,
    ).otherwise(0)
    return (
        flagged.groupBy("event_type", "n_events", "mean_value", "std_value")
        .agg(F.sum(is_out).cast("long").alias("n_outliers"))
        .select(
            "event_type",
            "n_events",
            "mean_value",
            "std_value",
            "n_outliers",
        )
        .orderBy("event_type")
    )


def decayed_engagement(events: DataFrame, half_life_days: float = 7.0) -> DataFrame:
    """Recency-weighted per-user engagement: sum of event values under
    exponential time decay with a ``half_life_days`` half-life, anchored
    at the corpus max event time — the standard feature-engineering shape
    for "recent activity matters more" ranking/retention features (an
    event ``half_life_days`` old counts half, twice that a quarter, ...).

    Scale shape: the anchor is a 1-row aggregate broadcast onto the
    stream (no window over everything), then ONE partial/final hash
    aggregate per user — same plan as ``user_rollup`` plus a scalar
    multiply. Float discipline: the decay factor is pow(0.5, age_days /
    half_life) computed identically in both engines and the decayed sum
    is 6dp-rounded (engine summation order differs at ~1e-12 relative;
    see value_outliers)."""
    anchor = events.agg(F.max("ts").alias("t_max"))
    age_days = (
        F.unix_micros(F.col("t_max")) - F.unix_micros(F.col("ts"))
    ).cast("double") / F.lit(86400.0 * 1_000_000.0)
    decayed = F.col("value") * F.pow(F.lit(0.5), age_days / F.lit(half_life_days))
    return (
        events.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(decayed), 6).alias("decayed_value"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )


def salted_event_rollup(events: DataFrame) -> DataFrame:
    """Per-event-type rollup computed through the two-phase SALTED
    aggregation combinator (``skew.salted_agg``) — event_type is the
    textbook hot-key axis (a handful of keys over the whole stream; at
    100 TB one key can exceed a single reducer). Registering this under
    the driver's oracle gate proves the salted plan is RESULT-IDENTICAL
    to the plain ``GROUP BY`` the oracle runs: the salt splits only the
    partial phase and never leaks into the result.

    Float discipline: the value sum runs in exact integer CENTS through
    the salt (``functions.exact``) — the salted re-combination is then
    plain long addition, exactly associative, so the salt provably
    cannot move the result by even an ulp at any magnitude (the
    pre-round-11 double sum needed a 6dp round to absorb the 16-partials
    re-association; cents make the identity exact instead of
    tolerance-based)."""
    from xboard_spark.operators.skew import salted_agg

    out = salted_agg(
        events.withColumn(
            "value_cents", F.round(F.col("value") * 100).cast("long")
        ),
        keys=["event_type"],
        aggs={
            "n_events": ("event_id", "count"),
            "sum_cents": ("value_cents", "sum"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("sum_cents").cast("double") / F.lit(100.0)).alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type")


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's event stream:
    how often event type A is immediately followed by type B (plus
    '_start' pseudo-state for each user's first event) — the
    next-event-prediction / funnel-discovery primitive (funnel_conversion
    checks ONE hypothesized path; this surfaces which paths exist, with
    empirical transition probabilities).

    Scale shape: one shuffle for the per-user ordered window (keyed on
    user_id, same exchange shape as sessionize), then a (from, to) hash
    aggregate whose cardinality is |event types|^2 — tiny forever. The
    probability is a windowed exact-int division: count(from->to) /
    count(from->*), 6dp-rounded on both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = events.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("_start")).alias(
            "from_type"
        ),
        F.col("event_type").alias("to_type"),
    )
    counts = trans.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(w_from),
                6,
            ),
        )
        .select("from_type", "to_type", "n_transitions", "p_transition")
        .orderBy("from_type", "to_type")
    )


def winsorized_stats(events: DataFrame) -> DataFrame:
    """Winsorized (clipped-at-p05/p95) per-type value stats — the robust
    mean a metrics pipeline reports when raw means are hostage to the
    tails ``value_outliers`` flags. Two passes: exact interpolated
    percentile fences (the ``value_percentiles`` machinery; at 100 TB the
    approx_percentile sketch drops in with the same plan shape), rounded
    to 4dp so both engines clip against IDENTICAL constants, broadcast
    back, clip, aggregate. Null values are filtered up front — both
    engines' least/greatest SKIP nulls, which would otherwise silently
    clip nulls to the upper fence."""
    ev = events.filter(F.col("value").isNotNull())
    pct = lambda p: F.round(F.expr(f"percentile(value, {p})"), 4)  # noqa: E731
    fences = ev.groupBy("event_type").agg(
        pct(0.05).alias("lo"), pct(0.95).alias("hi")
    )
    clipped = ev.join(F.broadcast(fences), "event_type").withColumn(
        "cv", F.greatest("lo", F.least("hi", F.col("value")))
    )
    return (
        clipped.groupBy("event_type", "lo", "hi")
        .agg(
            F.count("cv").alias("n_values"),
            F.round(F.sum("cv") / F.count("cv"), 4).alias("winsorized_mean"),
        )
        .select("event_type", "n_values", "lo", "hi", "winsorized_mean")
        .orderBy("event_type")
    )


def activity_heatmap(events: DataFrame) -> DataFrame:
    """Day-of-week x hour-of-day activity profile: event count, distinct
    users, and share of total traffic per cell — the seasonality panel an
    event pipeline uses for capacity planning and anomaly baselines.

    Scale shape: one scan -> partial/final hash aggregate on a 168-cell
    key space (no skew possible: the key domain is bounded); the share
    denominator is a global window over the POST-AGGREGATE 168-row frame
    (not a second scan of events — the single-partition window is bounded
    by the key domain, not the data). dow is Spark's ``dayofweek``
    (1=Sunday..7); the DuckDB twin shifts its 0-based ``dayofweek`` by +1
    to match."""
    cells = (
        events.select(
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
            "user_id",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    w = Window.partitionBy()
    return (
        cells.select(
            "dow",
            "hour",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_users").cast("long").alias("n_users"),
            (F.col("n_events") / F.sum("n_events").over(w)).alias("share"),
        )
        .orderBy("dow", "hour")
    )


def traffic_anomalies(events: DataFrame, z: float = 2.0) -> DataFrame:
    """Hourly traffic anomaly scan: each (date, hour) bucket's event count
    scored against the mean/std of the SAME hour-of-day across ALL days of
    the observed range — the seasonal baseline from ``activity_heatmap``
    turned into an alerting panel. The bucket frame is a DENSE
    date x hour grid (min..max observed date x 0..23), zero-filled: hours
    with no events contribute 0 to their hour-of-day baseline AND are
    themselves scoreable — a dead hour is the most anomalous bucket there
    is, and the sparse frame both excluded it from n_days/mean/std and
    could never flag it (the round-9 symmetric-defect finding). Returns
    anomalous buckets (|z| >= ``z``) with their hour-of-day baseline.
    Variance is computed from exact integer sums (n, sum, sum of squares)
    so both engines evaluate the identical double expression tree —
    population variance, guarded at 0 for constant hours.

    Scale shape: one scan -> (date, hour) hash agg (bounded by days x 24
    keys), the grid is calendar-bounded (days x 24 rows, built from a
    1-row min/max aggregate), a second tiny agg per hour-of-day (24
    keys), broadcast joins back. No window over raw events. Grid cost is
    proportional to the OBSERVED date span, so one corrupt outlier
    timestamp (epoch-zero default, year 9999) stretches it by millennia
    (~24 rows/day — functional but wasteful); feeds prone to timestamp
    misparses should be range-validated upstream, the standard
    calendar-spine caveat."""
    observed = (
        events.select(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .groupBy("event_date", "hour")
        .agg(F.count("*").alias("n_obs"))
    )
    grid = (
        events.agg(
            F.min(F.to_date("ts")).alias("d0"),
            F.max(F.to_date("ts")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("event_date"))
        .select(
            "event_date",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"),
        )
        .select("event_date", F.col("h").cast("long").alias("hour"))
    )
    buckets = grid.join(F.broadcast(observed), ["event_date", "hour"], "left").select(
        "event_date",
        "hour",
        F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_events"),
    )
    base = buckets.groupBy("hour").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    var = F.col("s2").cast("double") / F.col("n_days") - mean * mean
    scored = buckets.join(F.broadcast(base), "hour").select(
        "event_date",
        "hour",
        "n_events",
        mean.alias("hour_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("hour_std"),
    )
    zscore = (F.col("n_events") - F.col("hour_mean")) / F.col("hour_std")
    return (
        scored.filter(
            (F.col("hour_std") > 0) & (F.abs(zscore) >= z)
        )
        .withColumn("zscore", zscore)
        .orderBy("event_date", "hour")
    )


def temporal_split_audit(events: DataFrame, train_frac: float = 0.8) -> DataFrame:
    """Time-based train/test split audit: cut the event timeline at the
    exact interpolated ``train_frac`` quantile of event time and report the
    one-row hygiene panel a temporal-split training pipeline checks before
    trusting an evaluation: sizes of both sides plus the count of users
    active on BOTH sides (the population whose behavior leaks across the
    boundary — fine for forecasting, fatal for user-level generalization
    claims). Cutoff is floored to whole microseconds so both engines
    compare against the identical integer.

    Scale shape: the quantile is one aggregate (exact here; the
    approx_percentile sketch is the drop-in at 100 TB), broadcast as a
    1-row frame; the audit is then one scan -> per-user agg -> 1-row
    rollup."""
    micros = F.unix_micros(F.col("ts"))
    cut = events.agg(
        F.floor(F.expr(f"percentile(unix_micros(ts), {train_frac})"))
        .cast("long")
        .alias("cut_us")
    )
    per_user = (
        events.select("user_id", micros.alias("us"))
        .crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("us") < F.col("cut_us")).cast("long")).alias("n_tr"),
            F.sum((F.col("us") >= F.col("cut_us")).cast("long")).alias("n_te"),
        )
    )
    return per_user.agg(
        F.sum("n_tr").cast("long").alias("n_train_events"),
        F.sum("n_te").cast("long").alias("n_test_events"),
        F.sum((F.col("n_tr") > 0).cast("long")).alias("n_train_users"),
        F.sum((F.col("n_te") > 0).cast("long")).alias("n_test_users"),
        F.sum(((F.col("n_tr") > 0) & (F.col("n_te") > 0)).cast("long")).alias(
            "n_leaky_users"
        ),
    )


def session_paths(
    events: DataFrame, gap_minutes: int = 30, depth: int = 3, top: int = 20
) -> DataFrame:
    """Top session-opening paths: the first ``depth`` event types of each
    session (same gaps-and-islands session definition as ``sessionize``),
    concatenated into a path string, counted, top-N — the classic
    product-analytics "how do sessions start" panel.

    Scale shape: one shuffle on user_id that every window reuses (lag,
    running session sum, per-session row_number), then a hash agg keyed on
    (user_id, session_seq), a hash agg on path, and a distributed top-N
    (TakeOrderedAndProject). The per-session event-struct sort is bounded
    at ``depth`` rows per session after the rn filter."""
    flagged = _with_session_seq(events, gap_minutes)
    per_sess = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    firsts = flagged.withColumn("rn", F.row_number().over(per_sess)).filter(
        F.col("rn") <= depth
    )
    paths = (
        firsts.groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top)
    )


def quantile_sketch_error(
    events: DataFrame, accuracy: int = 10000, rank_slack: float = 0.005
) -> DataFrame:
    """Sketch-accuracy panel: exact interpolated percentiles of ``value``
    per event type, plus rank-space contract checks on the
    approx_percentile (KLL-style) estimates at the given ``accuracy`` —
    the calibration report that justifies replacing the exact per-group
    sort with the mergeable sketch at 100 TB (the sketch is THE scalable
    path; this panel is how you pick ``accuracy`` for an error budget).

    Invariant-oracle surface (VERDICT r8 #2): the hashed columns are the
    EXACT side (DuckDB ``quantile_cont``-computable, 4-decimal rounding —
    the precision ``value_percentiles`` has driver-proven cross-engine)
    plus deterministic ``p50/p95_within_bound`` booleans the twin emits
    as TRUE. The bound is checked in RANK space, not value space: the
    sketch returns an actual element whose rank the contract bounds
    (|rank - p*n| <= n/accuracy), while a VALUE-space window around the
    interpolated percentile breaks on tiny/spread groups (n=2 values
    [1,100]: the exact-rank element 1 sits far from the p50
    interpolation 50.5 yet honors the rank contract). So: re-scan the
    corpus once against the broadcast per-type estimates, count
    rank_lo = #{value < est} and rank_hi = #{value <= est}, and accept
    iff the estimate's occupied rank interval intersects
    [p*n - slack, p*n + slack] with slack = rank_slack*n + 1 (50x the
    accuracy=10000 contract, +1 for degenerate groups). A sketch outside
    THAT is an engine bug, and now fails the driver hash instead of
    hiding in a rows-only row."""
    ev = events.filter(F.col("value").isNotNull())
    exact = lambda p: F.expr(f"percentile(value, {p})")  # noqa: E731
    approx = lambda p: F.expr(  # noqa: E731
        f"approx_percentile(value, {p}, {accuracy})"
    )
    # sk is referenced TWICE below (the ranks broadcast and the outer
    # join's left side) — a deliberate, measured choice: the duplicate
    # aggregation stays inside ONE action, and an eager
    # collect-and-rebuild split (materialize sk as a literal frame, scan
    # the corpus exactly twice) measured 2.4x SLOWER solo at sf0.1
    # (1.809s vs 0.767s min-of-3; warm single-action runs are ~0.12s) —
    # the second sequential job's fixed latency dwarfs the saved agg at
    # this scale. At true 100 TB the trade inverts (the duplicate agg is
    # a duplicate full-corpus scan): materialize sk once as a persisted
    # table there, exactly like the shared index artifacts.
    sk = ev.groupBy("event_type").agg(
        F.count("*").alias("n_values"),
        F.round(exact(0.5), 4).alias("exact_p50"),
        F.round(exact(0.95), 4).alias("exact_p95"),
        approx(0.5).alias("a50"),
        approx(0.95).alias("a95"),
    )
    ranks = (
        ev.join(
            F.broadcast(sk.select("event_type", "a50", "a95")), "event_type"
        )
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lo50"),
            F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("hi50"),
            F.sum((F.col("value") < F.col("a95")).cast("long")).alias("lo95"),
            F.sum((F.col("value") <= F.col("a95")).cast("long")).alias("hi95"),
        )
    )

    def _within(p: float, lo: str, hi: str):
        target = F.lit(p) * F.col("n_values")
        slack = F.lit(rank_slack) * F.col("n_values") + F.lit(1.0)
        # the estimate occupies ranks (lo, hi]; accept iff that interval
        # intersects [target - slack, target + slack]
        return (F.col(lo) <= target + slack) & (F.col(hi) >= target - slack)

    return (
        sk.join(ranks, "event_type")
        .select(
            "event_type",
            "n_values",
            "exact_p50",
            "exact_p95",
            _within(0.5, "lo50", "hi50").alias("p50_within_bound"),
            _within(0.95, "lo95", "hi95").alias("p95_within_bound"),
        )
        .orderBy("event_type")
    )


def conversion_attribution(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the nearest PRECEDING non-purchase event type within the same session
    (same gaps-and-islands session definition as ``sessionize``);
    purchases opening a session are credited 'direct'. Returns per touch
    type: purchase count, attributed revenue, share of all purchases —
    the canonical marketing-attribution rollup (first-touch / position
    decay are window-frame variants of the same plan).

    Scale shape: ONE shuffle on user_id that the session windows and the
    attribution lookback all reuse; the rollup keys on the bounded
    event-type domain, and the share divides by a post-agg global sum
    over that tiny frame."""
    flagged = _with_session_seq(events, gap_minutes)
    look = (
        Window.partitionBy("user_id", "session_seq")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(look)
    purchases = (
        flagged.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce("touch", F.lit("direct")).alias("touch"), "value")
    )
    from xboard_spark.functions.exact import cent_sum_dollars

    rolled = purchases.groupBy("touch").agg(
        F.count("*").alias("n_purchases"),
        # exact integer-cent sum (functions.exact): value is
        # cent-quantized, so this is the engine-wide plain-money-sum
        # convention — the last rounded-double money sum left in the
        # events family (round-12 magnitude sweep)
        cent_sum_dollars(F.col("value")).alias("attributed_value"),
    )
    w_all = Window.partitionBy()
    return (
        rolled.select(
            "touch",
            F.col("n_purchases").cast("long").alias("n_purchases"),
            "attributed_value",
            (
                F.col("n_purchases") / F.sum("n_purchases").over(w_all)
            ).alias("purchase_share"),
        )
        .orderBy("touch")
    )


def events_json_variant(events: DataFrame) -> DataFrame:
    """The ``events_json_props`` aggregation computed through Spark 4's
    VariantType (``parse_json`` once -> typed ``variant_get`` probes) —
    the modern path for semi-structured columns: the JSON parses ONCE per
    row into a binary-encoded variant and every field probe is a cheap
    typed accessor, where the classic ``get_json_object`` re-parses the
    string per extraction. Same output contract as ``events_json``
    (shared oracle expression), so the two paths are mutually checked.

    At 100 TB the difference compounds: a props column probed for k
    fields costs one parse + k O(log n) probes instead of k full parses;
    columnar formats can also shred variants at write time.

    ``try_parse_json``, not ``parse_json``: a real feed carries
    malformed payloads (truncated objects, empty strings — round-11
    sweep 9), and the strict parse fails the whole query on the first
    bad row where the lenient path degrades it to a NULL variant —
    matching ``get_json_object``'s malformed→NULL behavior so the two
    paths stay mutually checkable on dirty data.

    The probe goes variant→STRING→try_cast(long), NOT
    ``try_variant_get(v, '$.k', 'long')`` (ADVICE r11 follow-through):
    the typed-long probe COERCES wrong-type values (true→1, 1.5→1)
    where the classic path's string-extract + try_cast yields NULL —
    measured three-way split on valid-JSON wrong-type k. The string
    probe stringifies exactly like ``get_json_object`` (unquoted
    scalars, JSON text for nested), so all three surfaces — classic,
    variant, oracle TRY_CAST — degrade identically."""
    v = F.try_parse_json(F.col("props"))
    return (
        events.withColumn(
            "k",
            F.try_variant_get(v, "$.k", "string").try_cast("long"),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_distinct("k").alias("distinct_k"),
        )
        .orderBy("event_type")
    )


def first_purchase_latency(events: DataFrame) -> DataFrame:
    """Activation funnel latency: per user, time from FIRST event to
    FIRST purchase, summarized as a histogram over whole-day buckets
    (plus the never-purchased population in bucket -1) — the activation
    metric a growth pipeline tracks. Latencies are exact integer
    microseconds; bucketing is integer division.

    Scale shape: one scan -> per-user min/conditional-min hash agg ->
    bounded-key histogram agg."""
    us = F.unix_micros(F.col("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(us).alias("first_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("first_purchase_us"),
    )
    day_us = 86_400_000_000
    bucket = F.when(F.col("first_purchase_us").isNull(), F.lit(-1)).otherwise(
        F.floor(
            (F.col("first_purchase_us") - F.col("first_us")) / F.lit(day_us)
        )
    )
    return (
        per_user.select(bucket.cast("long").alias("days_to_purchase"))
        .groupBy("days_to_purchase")
        .agg(F.count("*").alias("n_users"))
        .orderBy("days_to_purchase")
    )


def bounce_rate_by_dow(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Bounce panel: share of single-event sessions per day-of-week of the
    session start (same session definition as ``sessionize``) — the
    engagement-quality counterpart to ``activity_heatmap``. All integer
    counts; the rate is one exact division.

    Scale shape: the sessionize shuffle on user_id, then a bounded 7-key
    rollup."""
    sess = sessionize(events, gap_minutes)
    return (
        sess.select(
            F.dayofweek("session_start").cast("long").alias("dow"),
            (F.col("n_events") == 1).cast("long").alias("bounce"),
        )
        .groupBy("dow")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("bounce").cast("long").alias("n_bounces"),
        )
        .withColumn(
            "bounce_rate",
            F.col("n_bounces").cast("double") / F.col("n_sessions"),
        )
        .orderBy("dow")
    )


def seasonal_naive_error(events: DataFrame) -> DataFrame:
    """Forecast-baseline evaluation: the seasonal-naive predictor (this
    hour's count = same hour ONE WEEK earlier) scored over every hour
    that has a week-old twin — the baseline any traffic forecasting
    model must beat, and the standard first row of a forecast eval
    table. MAE/MAPE from exact integer counts.

    Scale shape: one scan -> (date, hour) agg (calendar-bounded), a
    self-join shifted by 7 days on the tiny hourly frame, one 1-row
    rollup."""
    hourly = (
        events.select(
            F.to_date("ts").alias("d"),
            F.hour("ts").cast("long").alias("h"),
        )
        .groupBy("d", "h")
        .agg(F.count("*").alias("n"))
    )
    actual = hourly.select("d", "h", F.col("n").alias("actual"))
    lagged = hourly.select(
        F.date_add("d", 7).alias("d"), "h", F.col("n").alias("predicted")
    )
    scored = actual.join(lagged, ["d", "h"])
    err = F.abs(F.col("actual") - F.col("predicted"))
    return scored.agg(
        F.count("*").alias("n_hours"),
        (F.sum(err).cast("double") / F.count("*")).alias("mae"),
        F.round(
            F.sum(err / F.greatest(F.col("actual"), F.lit(1)))
            / F.count("*"),
            6,
        ).alias("mape"),
    )


def watermark_delay_profile(events: DataFrame) -> DataFrame:
    """Out-of-orderness profile: treating event_id as arrival order, each
    event's LATENESS is how far its event time sits behind the running
    maximum event time already seen for that user — exactly the quantity
    a Structured Streaming watermark must cover. One row: event count,
    late-event count/fraction, and the max and p99 lateness in seconds —
    read it and you know what ``withWatermark`` delay loses how much data
    (the empirical version of the watermark-tuning guesswork).

    Scale shape: one shuffle on user_id for the running-max window, then
    a 1-row aggregate; lateness stays exact integer micros until the
    final division.

    Rows missing user_id or event_id are excluded: an event without an
    arrival id has no position in arrival order, and one without a user
    has no stream key — and NULL sort keys diverge across engines
    anyway (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST; the
    round-10 null-key sweep measured wildly different running-max
    trajectories from that alone)."""
    events = events.filter(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    )
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = events.select(
        us.alias("us"), F.max(us).over(w).alias("seen_max")
    ).select(
        F.greatest(
            F.col("seen_max") - F.col("us"), F.lit(0)
        ).alias("late_us")
    )
    return staged.agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_late"),
        (
            F.sum((F.col("late_us") > 0).cast("long")).cast("double")
            / F.count("*")
        ).alias("late_frac"),
        (F.max("late_us").cast("double") / 1e6).alias("max_lateness_sec"),
        (
            F.floor(F.expr("percentile(late_us, 0.99)")).cast("double")
            / 1e6
        ).alias("p99_lateness_sec"),
    )


def props_key_coverage(events: DataFrame, key: str = "k") -> DataFrame:
    """Semi-structured column hygiene: per event type, what fraction of
    ``props`` payloads carry the ``key`` field — the first check before
    trusting any JSON extraction in a pipeline (a silently-missing key
    reads as NULL and quietly skews every downstream aggregate)."""
    present = F.get_json_object(F.col("props"), f"$.{key}").isNotNull()
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(present.cast("long")).alias("n_with_key"),
            (
                F.sum(present.cast("long")).cast("double") / F.count("*")
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )
