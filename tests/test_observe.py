"""Observation-API metrics: computed in the same job as the action, with
the values a separate aggregation would produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from xboard_spark.io import read_table
from xboard_spark.plans.observe import observed


def test_observed_metrics_match_direct_aggregates(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    df, obs = observed(
        orders,
        "orders_batch",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("null_price"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    n_from_action = df.count()  # the action the metrics ride on
    got = obs.get
    assert got["n_rows"] == n_from_action
    assert got["null_price"] == 0
    direct = orders.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert got["total_price"] == direct


def test_observed_metrics_survive_transformations(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    df, obs = observed(
        orders, "filtered_batch", F.count(F.lit(1)).alias("n_rows")
    )
    # metrics observe the frame WHERE ATTACHED: downstream filters don't
    # change them (attach after the filter to observe the filtered rows)
    kept = df.filter(F.col("o_orderstatus") == "F").count()
    assert obs.get["n_rows"] >= kept
