"""Property-based checks of the incremental-maintenance family: on
arbitrary snapshots, (a) cdc_diff's classification must match a pure-
Python dict diff, and (b) merging delta partials at ANY cutoff must equal
the full recompute — the defining property of incremental maintenance."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from xboard_spark.operators import incremental

snapshot_strategy = st.dictionaries(
    st.integers(1, 8),
    st.one_of(st.none(), st.integers(0, 3).map(float)),
    max_size=8,
)


def _py_diff(old: dict, new: dict) -> dict:
    out = {}
    for k in set(old) | set(new):
        if k not in old:
            out[k] = "inserted"
        elif k not in new:
            out[k] = "deleted"
        elif old[k] == new[k] or (old[k] is None and new[k] is None):
            out[k] = "unchanged"
        else:
            out[k] = "updated"
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(snapshot_strategy, snapshot_strategy)
def test_cdc_diff_matches_dict_diff(spark, old, new):
    schema = "k long, v double"
    old_df = spark.createDataFrame(list(old.items()) or [(None, None)], schema).filter(
        F.col("k").isNotNull()
    )
    new_df = spark.createDataFrame(list(new.items()) or [(None, None)], schema).filter(
        F.col("k").isNotNull()
    )
    got = {
        r.k: r.change
        for r in incremental.cdc_diff(old_df, new_df, "k", ["v"]).collect()
    }
    assert got == _py_diff(old, new)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.integers(0, 27))
def test_incremental_rollup_cutoff_invariance(spark, day_offset):
    """Whatever day the base/delta split falls on — including before all
    data and after all data — the merged partials equal the recompute."""
    d0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, d0 + datetime.timedelta(days=i % 28), float(i))
        for i in range(40)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    cutoff = (d0 + datetime.timedelta(days=day_offset)).strftime("%Y-%m-%d")
    inc = incremental.incremental_daily_rollup(orders, cutoff=cutoff).collect()
    full = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").cast("long").alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("order_date")
        .collect()
    )
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]
