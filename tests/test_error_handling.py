"""Malformed-input handling (the reference's webhook_events.error design)
and the applyInPandas grouped-map operator."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from xboard_spark.streaming.webhook import read_webhooks_with_errors


def test_corrupt_records_quarantined_not_dropped(spark, tmp_path):
    d = tmp_path / "wh"
    os.makedirs(d)
    good = {
        "tenant_id": 1, "topic": "orders/create", "shop_domain": "a.example",
        "received_at": "2024-01-01T10:00:00Z", "delivery_hash": "h1",
        "raw_payload": "{}",
    }
    with open(d / "mixed.json", "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write('{"tenant_id": broken JSON here\n')
        f.write(json.dumps({**good, "delivery_hash": "h2"}) + "\n")
    out = read_webhooks_with_errors(spark, str(d)).collect()
    assert len(out) == 3  # nothing vanished
    valid = [r for r in out if r.is_valid]
    bad = [r for r in out if not r.is_valid]
    assert {r.delivery_hash for r in valid} == {"h1", "h2"}
    assert len(bad) == 1
    assert "broken JSON" in bad[0].error_raw  # raw line preserved for replay


def test_user_value_trend_slope(spark):
    from xboard_spark.operators.events import user_value_trend

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    # user 1: value rises 1.0 per hour; user 2: constant
    for h in range(4):
        rows.append((h, base + dt.timedelta(hours=h), 1, float(h)))
        rows.append((10 + h, base + dt.timedelta(hours=h), 2, 5.0))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {r.user_id: r for r in user_value_trend(events).collect()}
    assert abs(out[1].slope_per_hour - 1.0) < 1e-6
    assert abs(out[2].slope_per_hour) < 1e-9
    assert out[1].n_events == 4


def test_read_evolving_merges_added_columns(spark, tmp_path):
    """Old files (2 cols) + new files (3 cols) in one table: merged read
    exposes the union schema with NULLs where history predates the column,
    and per-file data is intact."""
    from pyspark.sql import functions as F
    from xboard_spark.io import read_evolving

    out = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, total double"
    ).write.mode("overwrite").parquet(out)
    spark.createDataFrame(
        [(3, 30.0, "USD")], "id long, total double, currency string"
    ).write.mode("append").parquet(out)

    df = read_evolving(spark, out)
    assert set(df.columns) == {"id", "total", "currency"}
    rows = {r.id: (r.total, r.currency) for r in df.collect()}
    assert rows == {1: (10.0, None), 2: (20.0, None), 3: (30.0, "USD")}
    # old-file rows are selectable by the new column's nullness
    assert df.filter(F.col("currency").isNull()).count() == 2
