"""Exact cent-arithmetic aggregation for 2-decimal-clean money/metric
columns — the engine-wide convention behind every PLAIN money sum.

Why: summing doubles re-associates across partitions, so Spark's
parallel partial sums and DuckDB's sequential sum differ in the last ulp
once a large value dominates the accumulator, and ``round()`` on huge
doubles splits engines at the cent (round-10 sweep 7). Per-row cents
(``round(v * 100)`` → long) are exact for any cent-quantized input at
any magnitude — at normal scales the product sits within a hair of an
integer, past 2^46 the double product is itself integral — and the long
sum is associative, so the aggregate is bit-identical regardless of
partitioning.

Conversion back to dollars is EXPLICIT ``::BIGINT::DOUBLE / 100.0`` on
both engines. The inner BIGINT narrowing is load-bearing in the DuckDB
twin: its BIGINT sum is HUGEINT, and the HUGEINT→DOUBLE (and
decimal-division) conversions truncate toward zero where the JVM
long→double and DuckDB's own BIGINT→DOUBLE round to nearest — measured
on the sweep-7 fixture as a last-ulp split on a sum past 2^53 landing on
an exact half-ulp tie (NOTES_r11.md sweep 7).

Boundaries (documented, fenced upstream by
``profiling.input_bounds_audit``): inputs must be 2-decimal-quantized
(a DERIVED product like ``l_extendedprice * (1 - l_discount)`` is NOT —
per-row cent rounding would change clean-data semantics, so product
sums keep the rounded-double surface and its documented magnitude
contract), and sum(|cents|) must stay under 2^63 (~9.2e16 dollars; the
ANSI long-overflow error past it is loud, not silent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cent_sum_dollars(col: Column) -> Column:
    """Spark: exact cent-sum of a 2-decimal-clean column, emitted as
    dollars (double). Bit-identical to ``duck_cent_sum_dollars`` at any
    magnitude inside the long fence."""
    return F.sum(F.round(col * 100).cast("long")).cast("double") / F.lit(
        100.0
    )


def duck_cent_sum_dollars(sql_expr: str) -> str:
    """DuckDB SQL for the identical exact cent-sum-as-dollars."""
    return (
        f"sum(CAST(round(({sql_expr}) * 100) AS BIGINT))::BIGINT::DOUBLE"
        " / 100.0"
    )


# ---------------------------------------------------------------------------
# Exact DERIVED-PRODUCT money sums (round 12, VERDICT r11 task 1).
#
# ``l_extendedprice * (1 - l_discount)`` is not 2-decimal-quantized, so the
# plain cent-sum convention above cannot apply per row without changing
# clean-data semantics. But the FACTORS are quantized — price to cents,
# discount/tax to integer percents (TPC-H semantics; the reference stores
# NUMERIC, ``migrations/init.sql:54,91``, where products are exact) — so the
# product is exact in integer "units":
#
#   cents  = round(price * 100)            (1 cent      = 1e-2 dollar)
#   d, t   = round(rate * 100)             (integer percent)
#   disc   = cents * (100 - d)             (1 unit      = 1e-4 dollar)
#   charge = cents * (100 - d) * (100 + t) (1 unit      = 1e-6 dollar)
#
# Per-row units are cast to DECIMAL(38,0) before multiplying/summing (the
# DuckDB twin uses HUGEINT): the sum is exact integer arithmetic at any
# partitioning and any magnitude up to ~1e38, so Spark's parallel partial
# sums and DuckDB's sequential sum are bit-identical by construction. The
# final round-to-cents happens in INTEGER space (half-away-from-zero, the
# two engines' shared round() convention) — never on a double — and the
# narrow to BIGINT before ::DOUBLE is the same loud fence as the plain
# cent-sum path (result cents must fit 2^63; the intake contract
# ``input_bounds_audit`` enforces |v| <= 1e12 far below it).
#
# Ratio/average surfaces round in the same integer space via
# round(N/D) = (2|N| + |D|) // (2|D|) with the sign re-applied — exact for
# any integer N, D without assuming D divides a power of 10.
# ---------------------------------------------------------------------------


def _dec(col: Column) -> Column:
    return col.cast("decimal(38,0)")


def cent_units(col: Column) -> Column:
    """Exact integer cents of a 2-decimal-clean column as DECIMAL(38,0).

    The intermediate ``cast("long")`` is the loud magnitude fence (ANSI
    error past ~9.2e16 dollars, mirrored by the twin's BIGINT cast)."""
    return _dec(F.round(col * 100).cast("long"))


def pct_units(col: Column) -> Column:
    """Exact integer percent of a 2-decimal-clean rate as DECIMAL(38,0)."""
    return _dec(F.round(col * 100).cast("long"))


def disc_price_units(price: Column, discount: Column) -> Column:
    """Per-row ``price * (1 - discount)`` in exact 1e-4-dollar units."""
    return cent_units(price) * (F.lit(100) - pct_units(discount))


def charge_units(price: Column, discount: Column, tax: Column) -> Column:
    """Per-row ``price * (1 - discount) * (1 + tax)`` in exact
    1e-6-dollar units."""
    return disc_price_units(price, discount) * (F.lit(100) + pct_units(tax))


def _trunc_div(n: Column, d: Column) -> Column:
    """Exact truncating division of non-negative DECIMAL(38,0) columns.

    NOT the ``div`` operator: Spark's IntegralDivide narrows a decimal
    quotient to LONG with a silent wrap past 2^63 (measured) — this form
    stays decimal (ANSI-loud everywhere) by dividing the exact multiple
    ``n - n % d``, which decimal division renders exactly at any scale."""
    return (n - n % d) / d


def round_div_units(num: Column, den: Column, out_scale: float) -> Column:
    """round(num/den) in exact integer space, half-away-from-zero (both
    engines' round() convention), emitted as DOUBLE num/den/out_scale.

    num/den: exact DECIMAL(38,0) columns (den != 0 — a zero denominator
    errors loudly on both engines, never diverges silently). The quotient
    narrows through BIGINT before the double conversion: the correctly-
    rounded conversion on both engines, and the loud fence for corrupt
    magnitudes."""
    q = _trunc_div(
        F.lit(2) * F.abs(num) + F.abs(den), F.lit(2) * F.abs(den)
    )
    signed = F.when((num < 0) != (den < 0), -q).otherwise(q)
    return signed.cast("long").cast("double") / F.lit(float(out_scale))


def units_sum_dollars(units: Column, units_per_cent: int) -> Column:
    """Exact sum of per-row integer units, rounded to cents in integer
    space and emitted as dollars (double) — the derived-product analog of
    ``cent_sum_dollars``, bit-identical to the DuckDB twin by
    construction."""
    s = F.sum(units)
    return round_div_units(s, F.lit(units_per_cent).cast("decimal(38,0)"), 100.0)


# --- DuckDB twins (HUGEINT arithmetic mirrors DECIMAL(38,0) exactly) ------


def duck_cent_units(sql_expr: str) -> str:
    return f"CAST(round(({sql_expr}) * 100) AS BIGINT)::HUGEINT"


duck_pct_units = duck_cent_units  # integer percent == cents of a rate


def duck_disc_price_units(price: str, discount: str) -> str:
    return f"({duck_cent_units(price)} * (100 - {duck_pct_units(discount)}))"


def duck_charge_units(price: str, discount: str, tax: str) -> str:
    return (
        f"({duck_disc_price_units(price, discount)}"
        f" * (100 + {duck_pct_units(tax)}))"
    )


def duck_round_div_units(num: str, den: str, out_scale: str) -> str:
    q = f"((2 * abs({num}) + abs({den})) // (2 * abs({den})))"
    return (
        f"(CASE WHEN ({num} < 0) != ({den} < 0) THEN -{q} ELSE {q} END)"
        f"::BIGINT::DOUBLE / {out_scale}"
    )


def duck_units_sum_dollars(units_sql: str, units_per_cent: int) -> str:
    return duck_round_div_units(
        f"sum({units_sql})", f"{units_per_cent}::HUGEINT", "100.0"
    )
