"""Salted-aggregation equivalence, salted-join equivalence, and the
applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from xboard_spark.io import read_table
from xboard_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_direct(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    direct = {
        r.o_orderstatus: (r.n, round(r.s, 2), r.mx)
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.o_orderstatus: (r.n, round(r.s, 2), r.mx)
        for r in salted_agg(
            orders,
            keys=["o_orderstatus"],
            aggs={
                "n": ("*", "count"),
                "s": ("o_totalprice", "sum"),
                "mx": ("o_totalprice", "max"),
            },
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(orders, ["o_orderstatus"], {"d": ("o_custkey", "count_distinct")})


def test_salted_join_matches_direct(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = read_table(spark, sf_dir, "customer")
    direct = orders.join(customer, "c_custkey").count()
    salted = salted_join(orders, customer, "c_custkey").count()
    assert salted == direct


def test_stateful_user_profiles(spark, tmp_path):
    from xboard_spark.streaming.stateful import user_profiles_stream

    rows = [
        {"event_id": 1, "ts": "2024-01-01T10:00:00Z", "user_id": 1, "value": 2.0},
        {"event_id": 2, "ts": "2024-01-01T10:00:10Z", "user_id": 1, "value": 3.0},
        {"event_id": 3, "ts": "2024-01-01T10:00:20Z", "user_id": 2, "value": 5.0},
    ]
    d = tmp_path / "state" / "in"
    os.makedirs(d)
    with open(d / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("event_id long, ts string, user_id long, value double")
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        user_profiles_stream(stream)
        .writeStream.format("memory")
        .queryName("profiles_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_out = spark.sql("SELECT * FROM profiles_sink").collect()
    by_user: dict = {}
    for r in rows_out:
        by_user.setdefault(r.user_id, []).append(r)
    # each user emits a running-update row AND (availableNow drains state in
    # a final batch) a timeout-closed summary row with identical totals
    for uid, n, total in [(1, 2, 5.0), (2, 1, 5.0)]:
        flags = {r.closed_by_timeout for r in by_user[uid]}
        assert flags == {False, True}
        assert all(r.n_events == n and r.total_value == total for r in by_user[uid])
