"""Stream-stream interval join — the one stateful-join class the rest of
the streaming layer doesn't cover (dedup/windows/custom state live in the
sibling modules). Semantics follow the batch as-of/range operators in
``operators.temporal``: attribute each purchase to the same user's views in
the preceding ``horizon``.

Spark requirements encoded here (and exercised by tests/test_streaming.py):
both sides MUST carry watermarks and the join condition MUST bound event
time on both sides — that pair of constraints is what lets the state store
evict rows once they can no longer match (state is bounded by
watermark + horizon, so the join runs forever on unbounded input without
growing state; see the Structured Streaming programming guide,
stream-stream joins)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_views(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner interval join of two STREAMING frames (schema: user_id, ts,
    event_id): (purchase, view) pairs where the view is within
    [purchase_ts - horizon, purchase_ts], per user. Both interval ends
    are INCLUSIVE — note the batch sibling
    ``temporal.views_before_purchase`` deliberately EXCLUDES the
    purchase instant from its count frame; each operator states its own
    boundary where it is used.

    Returns (user_id, purchase_id, purchase_ts, view_id, view_ts)."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return p.join(v, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "view_id",
        "view_ts",
    )


def enriched_with_user_tier(
    stream: DataFrame, user_tiers: DataFrame
) -> DataFrame:
    """Stream-STATIC enrichment: join the live event stream against a
    static dimension (user -> tier) — the other join shape Structured
    Streaming supports besides stream-stream, and the standard way a
    pipeline decorates events with slowly-changing reference data. The
    static side is broadcast per micro-batch (no state store involved at
    all — unlike stream-stream joins there is nothing to watermark);
    refreshing the dim means restarting the query or reading it as its
    own stream (Delta CDF-style), both noted here as the production
    paths.

    Left join so unknown users survive — coalesced to tier 'unknown' —
    instead of being dropped (the stream must never lose events because
    the dim lags)."""
    tiers = F.broadcast(user_tiers.select("user_id", "tier"))
    return stream.join(tiers, "user_id", "left").withColumn(
        "tier", F.coalesce(F.col("tier"), F.lit("unknown"))
    )
