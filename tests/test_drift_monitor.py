"""Streaming PSI drift monitor: frozen reference histogram + per-batch
foreachBatch observer (stream twin of profiling.value_drift_psi)."""

from __future__ import annotations

import json
import os

from xboard_spark.streaming import monitor


def _write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_reference_histogram_shares(spark):
    ref_df = spark.createDataFrame(
        [(float(v),) for v in range(10)], "value double"
    )
    ref = monitor.reference_histogram(ref_df, n_buckets=5)
    assert ref["vmin"] == 0.0 and ref["vmax"] == 9.0
    # 10 uniform values over 5 equal buckets -> 0.2 each
    assert all(abs(s - 0.2) < 1e-12 for s in ref["shares"].values())


def test_batch_psi_zero_for_same_distribution(spark):
    ref_df = spark.createDataFrame(
        [(float(v % 10),) for v in range(100)], "value double"
    )
    ref = monitor.reference_histogram(ref_df, n_buckets=5)
    assert monitor.batch_psi(ref_df, ref) == 0.0


def test_batch_psi_flags_shift_and_clamps_out_of_range(spark):
    ref_df = spark.createDataFrame(
        [(float(v % 10),) for v in range(100)], "value double"
    )
    ref = monitor.reference_histogram(ref_df, n_buckets=5)
    # heavily shifted batch, values far outside the reference range ->
    # clamped into the top bucket, large positive PSI
    shifted = spark.createDataFrame(
        [(1000.0 + v,) for v in range(50)], "value double"
    )
    assert monitor.batch_psi(shifted, ref) > 0.2


def test_drift_monitor_stream_logs_per_batch(spark, tmp_path):
    ref_df = spark.createDataFrame(
        [(float(v % 10),) for v in range(100)], "value double"
    )
    ref = monitor.reference_histogram(ref_df, n_buckets=5)

    src = str(tmp_path / "in")
    _write_jsonl(
        os.path.join(src, "b0.json"),
        [{"value": float(v % 10)} for v in range(50)],
    )
    stream = spark.readStream.schema("value double").json(src)
    log: list = []
    q = monitor.start_drift_monitor(
        stream, ref, str(tmp_path / "ckpt"), log
    )
    q.awaitTermination(60)
    assert len(log) == 1
    assert log[0]["n_values"] == 50
    assert log[0]["psi"] == 0.0

    # second file arrives: shifted distribution -> new batch, nonzero psi
    _write_jsonl(
        os.path.join(src, "b1.json"),
        [{"value": 500.0 + v} for v in range(50)],
    )
    q2 = monitor.start_drift_monitor(
        stream, ref, str(tmp_path / "ckpt"), log
    )
    q2.awaitTermination(60)
    assert len(log) == 2
    assert log[1]["psi"] > 0.2


def test_reference_survives_json_round_trip(spark):
    """The docstring promises the frozen reference is persisted as JSON
    next to the checkpoint — json.dumps stringifies int dict keys, so a
    reloaded reference must still drive non-zero PSI (int-keyed shares
    silently zeroed every PSI before the keys went string)."""
    ref_df = spark.createDataFrame(
        [(float(v % 10),) for v in range(100)], "value double"
    )
    ref = json.loads(json.dumps(monitor.reference_histogram(ref_df, n_buckets=5)))
    assert monitor.batch_psi(ref_df, ref) == 0.0  # same distribution
    shifted = spark.createDataFrame(
        [(1000.0 + v,) for v in range(50)], "value double"
    )
    assert monitor.batch_psi(shifted, ref) > 0.2  # drift still fires


def test_reference_histogram_rejects_degenerate_windows(spark):
    import pytest

    empty = spark.createDataFrame([], "value double")
    with pytest.raises(ValueError, match="no non-null"):
        monitor.reference_histogram(empty)
    constant = spark.createDataFrame([(5.0,)] * 20, "value double")
    with pytest.raises(ValueError, match="constant"):
        monitor.reference_histogram(constant)
