"""Temporal join operators Spark lacks as primitives — as-of join and
bounded range join — expressed as compositions of existing DataFrame ops
(SURVEY.md north-star extension; the pattern DuckDB exposes as ASOF JOIN and
kdb as aj). Both are written window-first: one shuffle on the entity key,
ordered scan within — no pairwise join blow-up, which is what makes them
viable at 100 TB (a naive interval join is O(n*m) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def purchase_asof_view(events: DataFrame) -> DataFrame:
    """As-of join: for each 'purchase' event, the most recent prior-or-equal
    'view' event of the same user.

    Implementation: union-and-scan — tag both sides, sort per user by time,
    carry the last view forward with last(ignorenulls) over an unbounded
    preceding frame, keep purchase rows. ONE shuffle on user_id, linear per
    partition; equivalent to DuckDB's ASOF JOIN but expressed in portable
    window algebra so the oracle runs the identical plan.

    Tie rule (the "or-equal" part of prior-or-equal): the scan orders by
    (ts, view-before-purchase, event_id), so a view at the SAME instant
    as the purchase sorts BEFORE it and is matched — a plain
    (ts, event_id) order missed same-instant views whose event_id
    happened to exceed the purchase's (the round-9 symmetric-defect
    finding). Among several same-instant views the largest event_id wins
    (it is the frame's last row).
    """
    view_first = F.when(F.col("event_type") == "view", 0).otherwise(1)
    w = Window.partitionBy("user_id").orderBy(
        "ts", view_first, "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last_view = F.last(
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("ts").alias("vts"), F.col("event_id").alias("vid")),
        ),
        ignorenulls=True,
    ).over(w)
    enriched = events.filter(
        F.col("event_type").isin("view", "purchase")
    ).withColumn("lv", last_view)
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("lv.vid").alias("view_id"),
            F.round(
                (F.unix_micros("ts") - F.unix_micros(F.col("lv.vts"))) / 1e6, 3
            ).alias("gap_sec"),
        )
        .orderBy("purchase_id")
    )


def views_before_purchase(events: DataFrame, window_sec: int = 600) -> DataFrame:
    """Bounded range join: per purchase, how many views by the same user in
    the preceding ``window_sec`` seconds (exclusive of the purchase instant).

    Implementation: a RANGE-framed window over event-time micros — the
    engine keeps a sliding frame per user instead of materializing pairs.
    The generic two-table range join at scale uses the same idea after
    bucketing both sides to floor(ts/window) and joining neighbor buckets.
    """
    us = window_sec * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-us, -1)
    )
    counted = events.filter(
        F.col("event_type").isin("view", "purchase")
    ).withColumn(
        "n_views_before",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w),
    )
    return (
        counted.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.coalesce("n_views_before", F.lit(0)).cast("long").alias("n_views_before"),
        )
        .orderBy("purchase_id")
    )
