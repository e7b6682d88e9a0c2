"""Oracle drift guard (round-3 postmortem): ``doc_stats`` hash-failed for
three consecutive rounds because a Spark-side change (plain-double ratios)
was not mirrored in the hand-written DuckDB twin (which kept
``round()::DECIMAL``) — a dtype asymmetry that no unit test covered and
only the driver's value hash caught, one round late.

This pins BOTH properties for the ratio-emitting queries at sf0.001:

* dtype agreement — Spark and DuckDB must return the same Python type per
  column (a ``decimal.Decimal`` on one side and ``float`` on the other can
  never hash-compare equal in the driver, whatever the values);
* value agreement — identical expression trees (one IEEE division of
  exact integers) must produce bit-identical doubles.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from xboard_spark.io import TESTDATA_TABLES

RATIO_QUERIES = [
    "doc_stats",
    "session_stats",
    "repetition_stats",
    # round-4 continuation additions that emit raw-double ratios
    "activity_heatmap",
    "ngram_novelty",
    "key_skew_profile",
    "user_erasure_audit",
    "volume_gaps",
    "chunk_dedup_stats",
    "reading_level",
    "traffic_anomalies",
    "shipping_lag_stats",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", RATIO_QUERIES)
def test_ratio_query_dtype_and_value_agreement(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows)

    # column-name alignment, then row-by-row (both sides ORDER BY a key)
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    for srow, drow in zip(srows, drows):
        for si, di, col in zip(sidx, didx, sorted(scols)):
            sv, dv = srow[si], drow[di]
            assert not isinstance(sv, decimal.Decimal), f"{name}.{col}: Spark Decimal"
            assert not isinstance(dv, decimal.Decimal), (
                f"{name}.{col}: oracle emits DECIMAL — the round-3 drift mode"
            )
            assert type(sv) is type(dv) or (
                isinstance(sv, (int, float)) and isinstance(dv, (int, float))
            ), f"{name}.{col}: {type(sv)} vs {type(dv)}"
            if isinstance(sv, float) and isinstance(dv, float):
                if math.isnan(sv) and math.isnan(dv):
                    continue
                assert sv == dv, f"{name}.{col}: {sv!r} != {dv!r} (bit drift)"
            else:
                assert sv == dv, f"{name}.{col}: {sv!r} != {dv!r}"
