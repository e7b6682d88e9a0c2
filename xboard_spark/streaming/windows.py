"""Streaming windowed aggregations — the streaming twins of the batch
analytics (A2 daily rollup -> tumbling window; sessionization -> session
window). Watermarks bound state; late rows beyond the delay are dropped by
the engine (ST3 semantics the reference only sketches in its schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_daily_order_counts(
    orders_stream: DataFrame,
    watermark_delay: str = "1 day",
    time_col: str = "created_at",
    key_col: str = "tenant_id",
) -> DataFrame:
    """A2's streaming analog: per-tenant daily order counts + revenue over
    event time. Emits one row per (window, tenant) — with partial aggregates
    maintained in the state store, keyed by (window, tenant): the shuffle
    key matches the state key, so scale-out is linear in tenants."""
    return (
        orders_stream.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(time_col, "1 day").alias("w"), key_col)
        .agg(
            F.count("*").alias("order_count"),
            F.sum("total_price").alias("revenue"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "order_count",
            "revenue",
        )
    )


def sliding_event_rates(
    events_stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark_delay: str = "15 minutes",
) -> DataFrame:
    """Sliding-window event rates per type (overlapping windows — each row
    feeds window/slide buckets; state is per (window, type))."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_window_per_user(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Native session windows (gap-based) per user — the streaming twin of
    ``operators.events.sessionize``; Spark merges overlapping sessions in
    the state store and emits when the watermark passes session end."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
