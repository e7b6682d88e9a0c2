"""Multi-dimensional write layout: Z-ORDER (Morton-curve) clustering —
the lakehouse OPTIMIZE ZORDER BY capability, built from plain expressions
and the existing silver-write path.

Why it exists: ``io.write_silver`` gives one-dimensional locality
(partition column + secondary sort), so parquet row-group min/max stats
skip well on THAT column and poorly on any other. Z-ordering interleaves
the bits of two (or more) rank-normalized columns into one sort key, so
row groups become tiles of the 2-D key space: a selective predicate on
EITHER column — or both — overlaps only ~sqrt-fraction of the row groups
instead of all of them (Morton 1966; the same trick behind Delta/Iceberg
OPTIMIZE ZORDER). Everything is JVM bit arithmetic; the write itself is
the same range-repartition + sortWithinPartitions shape as write_silver
(one exchange, no global sort).

Honest limits, documented: rank normalization here is min/max linear
scaling (one 1-row broadcast aggregate) — skewed columns get uneven
tiles; production systems use sampled quantile ranks (the
``global_ntile`` building block here would supply exactly that — same
plan shape, one more pass). Interleaving beyond ~3 columns dilutes all
of them; that is inherent to space-filling curves, not this
implementation."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution: 2^16 cells per axis


def _scale(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-normalize a numeric column into [0, 2^bits): exact long
    arithmetic after one double scaling; degenerate (constant) columns
    collapse to cell 0, and NULL values land in cell 0 too — without the
    coalesce, ``least(NULL, top)`` (Spark's least skips NULLs) silently
    promoted every NULL to the TOP cell, interleaving them among the
    genuinely-max rows and polluting exactly the row-group min/max stats
    the z-order exists to sharpen."""
    span = (hi.cast("double") - lo.cast("double"))
    frac = F.when(span == 0.0, F.lit(0.0)).otherwise(
        (col.cast("double") - lo.cast("double")) / span
    )
    top = (1 << bits) - 1
    scaled = F.floor(frac * F.lit(top)).cast("long")
    # the NULL guard must wrap least(), not follow it: Spark's least()
    # SKIPS null arguments, so least(NULL, top) is already top
    return F.when(scaled.isNull(), F.lit(0).cast("long")).otherwise(
        F.least(scaled, F.lit(top))
    )


def morton_code(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative longs:
    x occupies even bit positions, y odd — the Morton / Z-curve index.
    Pure shift/mask expressions, whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(
                    F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
                )
            )
        )
    return z


def with_zorder_key(
    df: DataFrame, col_x: str, col_y: str, bits: int = ZBITS
) -> DataFrame:
    """Add ``_zkey``: the Morton index of the two min/max-normalized
    columns. Timestamp columns are interleaved via their epoch micros."""
    def _num(c: str) -> Column:
        col = F.col(c)
        return (
            F.unix_micros(col)
            if dict(df.dtypes)[c].startswith("timestamp")
            else col
        )
    x, y = _num(col_x), _num(col_y)
    bounds = df.agg(
        F.min(x).alias("_xlo"),
        F.max(x).alias("_xhi"),
        F.min(y).alias("_ylo"),
        F.max(y).alias("_yhi"),
    )
    return df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        morton_code(
            _scale(x, F.col("_xlo"), F.col("_xhi"), bits),
            _scale(y, F.col("_ylo"), F.col("_yhi"), bits),
            bits,
        ),
    ).drop("_xlo", "_xhi", "_ylo", "_yhi")


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = ZBITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of (col_x, col_y):
    range-repartition on the Morton key (contiguous curve segments per
    file = square-ish tiles of the 2-D space) and sort within partitions
    so row-group stats are tight. Readers need nothing special — parquet
    min/max skipping on either column just works better."""
    keyed = with_zorder_key(df, col_x, col_y, bits)
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
