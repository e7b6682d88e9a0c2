"""Z-order write layout: Morton-key correctness and the capability it
exists for — row-group/file skipping on BOTH dimensions, measured from
real parquet footer statistics against a 1-D sorted baseline."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from xboard_spark.io import read_table
from xboard_spark.operators import layout


def test_morton_code_interleaves(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    rows = (
        df.select("x", "y", layout.morton_code(F.col("x"), F.col("y")).alias("z"))
        .orderBy("x", "y")
        .collect()
    )
    got = {(r.x, r.y): r.z for r in rows}
    # x -> even bits, y -> odd bits
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    # 3=0b11 -> bits 0,2 ; 5=0b101 -> bits 1,5 -> 1+4+2+32 = 39
    assert got[(3, 5)] == 0b100111


def _files_overlapping(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(overlapping, total) file count for a [lo, hi] predicate, judged
    from parquet column statistics — what a stats-pruning reader does."""
    total, overlapping = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is not None and not (fmax < lo or fmin > hi):
            overlapping += 1
    return overlapping, total


def test_zorder_skips_on_both_dimensions(spark, sf_dir_mid, tmp_path):
    orders = read_table(spark, sf_dir_mid, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    layout.write_zordered(orders, zpath, "o_custkey", "o_totalprice", n_files=16)
    # baseline: 1-D layout sorted on custkey only (same file count)
    (
        orders.repartitionByRange(16, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # data survives the rewrite
    assert spark.read.parquet(zpath).count() == orders.count()

    lo_c, hi_c = 100, 200            # ~7% of custkeys
    lo_p, hi_p = 1000.0, 20000.0     # slice of totalprice
    z_c, z_tot = _files_overlapping(zpath, "o_custkey", lo_c, hi_c)
    s_c, s_tot = _files_overlapping(spath, "o_custkey", lo_c, hi_c)
    z_p, _ = _files_overlapping(zpath, "o_totalprice", lo_p, hi_p)
    s_p, _ = _files_overlapping(spath, "o_totalprice", lo_p, hi_p)
    assert z_tot == s_tot == 16
    # the 1-D layout is perfect on its own sort column and useless on the
    # other; z-order must skip on BOTH: strictly better than the baseline
    # on the second dimension, and still pruning (not reading all files)
    # on the first
    assert s_p == 16              # baseline: price predicate prunes nothing
    assert z_p < 16               # z-order: price predicate prunes files
    assert z_c < 16               # ...while custkey predicates still prune
    assert s_c <= z_c             # 1-D baseline stays best on its own column


def test_zorder_roundtrip_values_and_schema(spark, sf_dir, tmp_path):
    """The z-ordered rewrite is layout-only: every row survives with
    identical values, the helper key never leaks into the files, and the
    layout composes with schema evolution (read_evolving over a z-ordered
    base plus an evolved append)."""
    from xboard_spark.io import read_evolving

    orders = read_table(spark, sf_dir, "orders")
    zpath = str(tmp_path / "z2")
    layout.write_zordered(orders, zpath, "o_custkey", "o_totalprice", n_files=4)
    back = spark.read.parquet(zpath)
    assert "_zkey" not in back.columns
    assert sorted(back.columns) == sorted(orders.columns)
    a = {tuple(r) for r in orders.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
    # evolved append: a new column appears in later files
    evolved = orders.limit(10).withColumn("o_channel", F.lit("web"))
    evolved.write.mode("append").parquet(zpath)
    merged = read_evolving(spark, zpath)
    assert "o_channel" in merged.columns
    assert merged.count() == orders.count() + 10
    # old files surface NULL for the new column
    assert merged.filter(F.col("o_channel").isNull()).count() == orders.count()


def test_zorder_nulls_land_in_cell_zero(spark):
    """NULL z-order values must map to cell 0 (grouped at the curve
    origin like the constant-column collapse) — Spark's least() skips
    NULLs, which used to promote every NULL to the TOP cell and pollute
    the max tiles' row-group stats."""
    from xboard_spark.operators.layout import with_zorder_key

    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, None, 5.0), (3, 1000.0, 5.0)],
        "id long, x double, y double",
    )
    keys = {r.id: r._zkey for r in with_zorder_key(df, "x", "y").collect()}
    assert keys[2] == min(keys.values())  # NULL x -> origin-side key
    assert keys[3] == max(keys.values())
