"""Data-governance operators: the right-to-be-forgotten / retention
surface a production lake needs alongside the analytics engine. The
reference delegates deletion to Postgres DELETEs; at lake scale erasure
is an anti-join rewrite, and the AUDIT (what would be erased, where)
is the operator worth checking exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_erasure_audit(
    events: DataFrame, orders: DataFrame, modulus: int = 97
) -> DataFrame:
    """Erasure-scope audit for a deterministic erase cohort (ids divisible
    by ``modulus`` — standing in for the id list an erasure request
    supplies): per table, total rows, rows in scope, and the share — the
    report reviewed before running the actual anti-join rewrite
    (``erase_users``).

    Scale shape: pure conditional aggregation — one scan per table, no
    join (the cohort predicate is a row-local expression; with an explicit
    id list it becomes a broadcast semi-join flag instead)."""
    def _panel(df, key, name):
        hit = (F.col(key) % modulus == 0).cast("long")
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.sum(hit).alias("n_in_scope"),
            (F.sum(hit).cast("double") / F.count("*")).alias("scope_share"),
        )

    return (
        _panel(events, "user_id", "events")
        .unionByName(_panel(orders, "o_custkey", "orders"))
        .orderBy("table_name")
    )


def erase_users(df: DataFrame, key: str, erase_ids: DataFrame) -> DataFrame:
    """The erasure rewrite itself: drop every row whose ``key`` appears in
    ``erase_ids`` (single column id frame). Left anti join, broadcast-
    HINTED: an erasure request's id list is request-sized by contract,
    so the hint is always correct here. A corpus-scale exclusion list is
    a different operator — drop the hint and let AQE pick the shuffle
    anti join (the hint as written would try to broadcast the big side).
    At lake scale this runs per partition-file as a rewrite job."""
    ids = erase_ids.toDF("_erase_id")
    return df.join(
        F.broadcast(ids), F.col(key) == F.col("_erase_id"), "left_anti"
    )
