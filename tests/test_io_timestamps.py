"""Timestamp-layout robustness for ``io.read_table`` (round-3 postmortem:
the driver's events.parquet silently changed from timestamp[ns] to
timestamp[us] NTZ and every ``unix_micros("ts")`` site started throwing at
plan time — 4 driver queries, the bench, and the plan-lint test all went
red from one upstream layout change).

This pins the contract: whatever physical layout a writer used —
nanos (read as long under the legacy conf), micros without timezone
(TIMESTAMP_NTZ), or micros with UTC timezone — ``read_table`` yields the
SAME session-zoned TimestampType column with the SAME values, and
``unix_micros`` over it resolves. A future driver-side layout change can
break this test, not the whole round."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from xboard_spark.io import read_table

_ROWS = [
    (1, datetime.datetime(2025, 3, 1, 12, 0, 0, 123456), 10, "view", 1.5, "{}"),
    (2, datetime.datetime(2025, 3, 1, 12, 30, 0, 654321), 10, "purchase", 9.0, "{}"),
    (3, datetime.datetime(2025, 3, 2, 8, 15, 30, 42), 11, "view", 0.0, "{}"),
]


def _write_events(tmpdir: str, layout: str) -> str:
    """Write the same 3 events under one of three physical ts layouts.
    Layout dir mimics the testdata convention {sf_dir}/events.parquet."""
    sf_dir = os.path.join(tmpdir, layout)
    os.makedirs(sf_dir, exist_ok=True)
    ts_type = {
        "ns": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "us_utc": pa.timestamp("us", tz="UTC"),
    }[layout]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS]).cast(ts_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("layout", ["ns", "us_ntz", "us_utc"])
def test_read_table_normalizes_ts_layout(spark, tmp_path, layout):
    df = read_table(spark, _write_events(str(tmp_path), layout), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = {
        r.event_id: r.us
        for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    # exact integer micros (avoid float .timestamp() rounding at 1e15)
    epoch = datetime.datetime(1970, 1, 1)
    expected = {
        r[0]: (r[1] - epoch) // datetime.timedelta(microseconds=1) for r in _ROWS
    }
    assert got == expected


def test_all_layouts_agree(spark, tmp_path):
    vals = []
    for layout in ("ns", "us_ntz", "us_utc"):
        df = read_table(spark, _write_events(str(tmp_path), layout), "events")
        vals.append(
            sorted(
                (r.event_id, r.us)
                for r in df.select(
                    "event_id", F.unix_micros("ts").alias("us")
                ).collect()
            )
        )
    assert vals[0] == vals[1] == vals[2]


def test_nanos_rebuild_is_footer_driven_not_name_driven(spark, tmp_path):
    """The nanos rebuild must fire for ANY table/column physically stored
    as timestamp[ns] (it was hard-coded to events.ts, leaving other
    writers' ns columns as raw longs) — and must NOT touch genuine BIGINT
    columns, which share the same Spark-side LongType under the legacy
    conf."""
    sf_dir = str(tmp_path / "lake")
    os.makedirs(sf_dir)
    table = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),  # genuine long
            "created_at": pa.array(
                [
                    datetime.datetime(2025, 5, 1, 9, 0, 0, 111111),
                    datetime.datetime(2025, 5, 2, 10, 30, 0, 222222),
                ]
            ).cast(pa.timestamp("ns")),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "mydocs.parquet"))
    df = read_table(spark, sf_dir, "mydocs")
    assert isinstance(df.schema["created_at"].dataType, T.TimestampType)
    assert isinstance(df.schema["doc_id"].dataType, T.LongType)
    got = {r.doc_id: r.created_at for r in df.collect()}
    assert got[1] == datetime.datetime(2025, 5, 1, 9, 0, 0, 111111)
    # unix_micros resolves (the plan-time failure class this guards)
    df.select(F.unix_micros("created_at")).collect()


def test_compact_silver_refuses_unlistable_path(spark, tmp_path):
    """compact_silver sizes output files from MEASURED local bytes; an
    empty listing must raise, not rewrite the whole table through one
    blind task (n_out=1)."""
    from xboard_spark.io import compact_silver

    with pytest.raises(FileNotFoundError, match="no parquet files"):
        compact_silver(spark, str(tmp_path / "nope"), partition_cols=())


def test_nanos_cols_union_all_footers_and_reject_mixed_physical_types(tmp_path):
    """_nanos_timestamp_cols must union the ns-column sets across EVERY
    file of a directory table (a first-file sample silently skips the
    rebuild for other writers' ns columns) and must fail loudly when
    files disagree on a column's physical type (INT64 in one,
    TIMESTAMP(NANOS) in another — the merged Long column mixes units)."""
    from xboard_spark.io import _nanos_timestamp_cols

    d = str(tmp_path / "mixed_writers")
    os.makedirs(d)
    ts = pa.array([datetime.datetime(2025, 5, 1)]).cast(pa.timestamp("ns"))
    pq.write_table(
        pa.table({"x": pa.array([1], pa.int64()), "t1": ts}),
        os.path.join(d, "a.parquet"),
    )
    pq.write_table(
        pa.table({"x": pa.array([2], pa.int64()), "t2": ts}),
        os.path.join(d, "b.parquet"),
    )
    assert _nanos_timestamp_cols(d) == {"t1", "t2"}

    conflict = str(tmp_path / "conflict")
    os.makedirs(conflict)
    pq.write_table(
        pa.table({"y": pa.array([1], pa.int64())}),
        os.path.join(conflict, "a.parquet"),
    )
    pq.write_table(pa.table({"y": ts}), os.path.join(conflict, "b.parquet"))
    with pytest.raises(ValueError, match="disagree on the physical type"):
        _nanos_timestamp_cols(conflict)
