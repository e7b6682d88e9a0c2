"""Round-12 exact derived-product arithmetic (``functions.exact``): the
Spark DECIMAL(38,0) path and the DuckDB HUGEINT twins must be
bit-identical by construction — planted fixtures cover both signs, the
half-cent tie, and the ±1e15 hostile-magnitude regime the round-11
sweep classified as the product-sum divergence boundary."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from xboard_spark.functions import exact as X

ROWS = [
    # (price, discount, tax)
    (100.01, 0.05, 0.04),
    (0.03, 0.10, 0.00),
    (9.99e15, 0.02, 0.08),     # hostile magnitude, positive
    (-9.99e15, 0.07, 0.03),    # hostile magnitude, negative
    (54321.99, 0.00, 0.07),
    (0.005, 0.01, 0.01),       # half-cent price: both engines round to 1
]


def _spark_panel(spark, rows):
    df = spark.createDataFrame(rows, "p double, d double, t double")
    return df.agg(
        X.units_sum_dollars(
            X.disc_price_units(F.col("p"), F.col("d")), 100
        ).alias("disc"),
        X.units_sum_dollars(
            X.charge_units(F.col("p"), F.col("d"), F.col("t")), 10000
        ).alias("charge"),
        X.round_div_units(
            F.sum(X.cent_units(F.col("p"))),
            F.count("*").cast("decimal(38,0)"),
            1e6,
        ).alias("avg6"),
    ).collect()[0]


def _duck_panel(rows):
    con = duckdb.connect()
    con.execute(
        "create table tt as select * from (values "
        + ",".join(f"({p},{d},{t})" for p, d, t in rows)
        + ") v(p,d,t)"
    )
    q = f"""select
      {X.duck_units_sum_dollars(X.duck_disc_price_units('p', 'd'), 100)}
        as disc,
      {X.duck_units_sum_dollars(X.duck_charge_units('p', 'd', 't'), 10000)}
        as charge,
      {X.duck_round_div_units(
          'sum(' + X.duck_cent_units('p') + ')',
          'count(*)::HUGEINT', '1000000.0')} as avg6
    from tt"""
    return con.execute(q).fetchone()


def test_product_sums_bit_identical_cross_engine(spark):
    s = _spark_panel(spark, ROWS)
    d = _duck_panel(ROWS)
    assert (s["disc"], s["charge"], s["avg6"]) == d


def test_product_sum_matches_closed_form(spark):
    # one clean row: 100.01 * (1 - 0.05) = 95.0095 -> rounds half-away
    # to 95.01; charge = 95.0095 * 1.04 = 98.80988 -> 98.81
    rows = [(100.01, 0.05, 0.04)]
    s = _spark_panel(spark, rows)
    assert s["disc"] == 95.01
    assert s["charge"] == 98.81


def test_round_div_units_sign_symmetry(spark):
    # round(7/2)=4, round(-7/2)=-4 (half away from zero, both engines'
    # round() convention) — NOT banker's, NOT floor
    df = spark.range(1).select(
        X.round_div_units(
            F.lit(7).cast("decimal(38,0)"),
            F.lit(2).cast("decimal(38,0)"),
            1.0,
        ).alias("pos"),
        X.round_div_units(
            F.lit(-7).cast("decimal(38,0)"),
            F.lit(2).cast("decimal(38,0)"),
            1.0,
        ).alias("neg"),
    ).collect()[0]
    assert (df["pos"], df["neg"]) == (4.0, -4.0)
    d = duckdb.connect().execute(
        f"""select {X.duck_round_div_units('7::HUGEINT', '2::HUGEINT', '1.0')},
               {X.duck_round_div_units('(-7)::HUGEINT', '2::HUGEINT', '1.0')}"""
    ).fetchone()
    assert d == (4.0, -4.0)


def _py_round_half_away(n: int, d: int) -> int:
    q = (2 * abs(n) + abs(d)) // (2 * abs(d))
    return -q if (n < 0) != (d < 0) else q


def test_round_div_units_matches_exact_integer_rounding(spark):
    # 200 seeded random (N, D) pairs spanning signs and 1..1e24 — one
    # Spark job against pure-python integer arithmetic, then the DuckDB
    # twin on the same pairs. Catches any rounding-mode or precision
    # drift in the decimal path that a hand-picked fixture could miss.
    import random

    rng = random.Random(12)
    pairs = []
    for _ in range(200):
        # |n| <= 1e17 keeps every quotient inside the BIGINT fence (the
        # loud-overflow path has its own dedicated test below)
        n = rng.randint(0, 10 ** rng.randint(1, 17)) * rng.choice([1, -1])
        d = rng.randint(1, 10 ** rng.randint(1, 12)) * rng.choice([1, -1])
        pairs.append((str(n), str(d)))
    df = spark.createDataFrame(pairs, "n string, d string")
    got = (
        df.select(
            "n",
            "d",
            X.round_div_units(
                F.col("n").cast("decimal(38,0)"),
                F.col("d").cast("decimal(38,0)"),
                1.0,
            ).alias("q"),
        )
        .collect()
    )
    for r in got:
        # float() rounds to nearest exactly like the JVM long->double
        # narrow, so equality is exact even past 2^53
        want = _py_round_half_away(int(r.n), int(r.d))
        assert r.q == float(want), (r.n, r.d, r.q, want)
    con = duckdb.connect()
    for n, d in pairs[:50]:
        (dq,) = con.execute(
            f"select {X.duck_round_div_units(f'({n})::HUGEINT', f'({d})::HUGEINT', '1.0')}"
        ).fetchone()
        assert dq == float(_py_round_half_away(int(n), int(d))), (n, d, dq)


def test_cent_narrow_is_the_loud_fence(spark):
    # result cents past 2^63 must ERROR (ANSI cast), never wrap or
    # silently degrade — the same fence as the plain cent-sum convention
    rows = [(9.0e18, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "p double, d double, t double")
    with pytest.raises(Exception, match="OVERFLOW|overflow"):
        df.agg(
            X.units_sum_dollars(
                X.disc_price_units(F.col("p"), F.col("d")), 100
            ).alias("disc")
        ).collect()
