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
