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

Round-4 postmortem (the hole this file itself had): the ``fetchall()``
path above converts DuckDB HUGEINT to Python ``int``, so it PASSED on
``doc_stats``/``session_stats`` while the driver — which hashes the
**pandas** representations — failed them for four consecutive rounds:
DuckDB ``sum(INTEGER)`` returns HUGEINT, ``.df()`` converts HUGEINT to
``float64``, Spark's ``toPandas()`` side is ``int64``, and ``9444482.0``
never string-compares equal to ``9444482``. The fix was ``::BIGINT`` casts
in the oracle; the guard below (``test_pandas_dtype_kind_agreement``)
sweeps EVERY oracle-checked query on the pandas path so no oracle can
ship a HUGEINT/DECIMAL-shaped column again. Removing the ``::BIGINT``
cast from the ``doc_stats`` oracle makes that test fail (verified).
"""

from __future__ import annotations

import decimal
import math
import sys

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


sys.path.insert(0, "/root/repo/tools")
from check_oracle import _dtype_mismatches  # noqa: E402  (shared guard logic)

_ALL_ORACLE_QUERIES = sorted(
    set(entrymod.oracle_sql()) & set(entrymod.queries())
)


@pytest.mark.parametrize("name", _ALL_ORACLE_QUERIES)
def test_pandas_dtype_kind_agreement(spark, sf_dir, duck, name):
    """The driver hashes pandas representations (Spark ``toPandas()`` vs
    DuckDB ``.df()``). Sweep EVERY oracle-checked query and assert the
    pandas dtype *family* agrees per column (shared with
    ``tools/check_oracle.py`` so the local gate and this guard cannot
    diverge). Allowed pairings, both driver-proven benign: int vs float
    when NULL-promotion actually occurred, and object-of-dates vs
    datetime64 (Spark DATE surfaces as object of ``datetime.date``)."""
    pdf_s = entrymod.queries()[name](spark, sf_dir).toPandas()
    pdf_d = duck.execute(entrymod.oracle_sql()[name]).df()

    assert sorted(pdf_s.columns) == sorted(pdf_d.columns)
    mismatches = _dtype_mismatches(pdf_s, pdf_d)
    assert not mismatches, (
        f"{name}: pandas-path dtype drift (driver hash would fail): "
        + "; ".join(mismatches)
    )


def test_check_oracle_norm_cell_decimal_and_negative_zero():
    """The local gate's value normalizer must not false-FAIL numerically
    equal cells: Decimal('123.456700') vs float 123.4567, and -0.0 vs
    0.0, normalize identically."""
    import decimal
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        pathlib.Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    norm = mod._norm_cell
    assert norm(decimal.Decimal("123.456700")) == norm(123.4567)
    assert norm(decimal.Decimal("1.10")) == norm(1.1)
    assert norm(-0.0) == norm(0.0)
