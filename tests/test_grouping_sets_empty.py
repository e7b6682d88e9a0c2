"""ROLLUP/CUBE on an EMPTY relation (round-13; VERDICT r12 #4): the SQL
standard (and DuckDB) emit the ``()`` grand-total grouping set's row —
COUNT 0, NULL sums — where Spark's Expand-based plan emits zero rows.
``window_ops._grand_total_if_empty`` closes the boundary; pin both the
empty-input row and the non-empty no-op (the guard row must never
duplicate the Expand's real grand total)."""

from __future__ import annotations

from pyspark.sql import types as T

from xboard_spark.operators import window_ops

_LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
    ]
)

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


def test_rollup_empty_relation_emits_grand_total_row(spark):
    empty = spark.createDataFrame([], _LINEITEM_SCHEMA)
    rows = window_ops.revenue_rollup(empty).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r.l_returnflag, r.l_linestatus) == (None, None)
    assert r.revenue is None and r.n_items == 0 and r.gid == 3


def test_cube_empty_relation_emits_grand_total_row(spark):
    empty = spark.createDataFrame([], _ORDERS_SCHEMA)
    rows = window_ops.orders_cube(empty).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r.o_orderstatus, r.o_orderpriority) == (None, None)
    assert r.total_price is None and r.n_orders == 0 and r.gid == 3


def test_guard_row_never_duplicates_real_grand_total(spark):
    df = spark.createDataFrame(
        [("A", "F", 100.0, 0.0), ("R", "O", 50.0, 0.1)], _LINEITEM_SCHEMA
    )
    rows = window_ops.revenue_rollup(df).collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1, grand
    assert grand[0].n_items == 2 and grand[0].revenue == 145.0
    # full rollup: () + 2 flag subtotals + 2 leaf groups
    assert len(rows) == 5


def test_cube_guard_never_duplicates_real_grand_total(spark):
    df = spark.createDataFrame(
        [("O", "1-URGENT", 10.0), ("F", "5-LOW", 20.0)], _ORDERS_SCHEMA
    )
    rows = window_ops.orders_cube(df).collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].n_orders == 2
    assert grand[0].total_price == 30.0
